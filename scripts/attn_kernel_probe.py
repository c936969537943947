"""A/B the fused-attention backward kernels (serial per-head dots vs
head-batched dot_generals) at the bench geometry, device-side repeated
(lax.scan inside one jit) so host/tunnel noise cannot leak in.

Usage: python scripts/attn_kernel_probe.py [--reps 6] [--k 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from vqacl_tpu.ops import fused_attention as FA

B, S, H, dk, L = 80, 64, 12, 64, 20     # padded encoder geometry


def build(dropout, k_reps):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H * dk)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H * dk)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H * dk)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, 24, 24)), jnp.float32)
    mask = jnp.ones((B, 1, S), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    def one(qq):
        def loss(qq, kk, vv, bb):
            o = FA.fused_attention(qq, kk, vv, False, dropout, H, L,
                                   bb, mask, seed)
            return jnp.sum(o.astype(jnp.float32))
        g = jax.grad(loss, argnums=(0, 1, 2, 3))(qq, k, v, bias)
        return g

    def prog(i):
        def step(carry, j):
            g = one(carry)
            return carry + g[0] * jnp.bfloat16(1e-30), jnp.sum(g[3])
        y, outs = jax.lax.scan(step, q + i.astype(jnp.bfloat16) * 0,
                               jnp.arange(k_reps, dtype=jnp.int32))
        return outs[-1]

    return jax.jit(prog)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--dropout", type=float, default=0.1)
    a = ap.parse_args()

    for fwd_impl in ("serial", "batched"):
        for bwd_impl in ("serial", "batched"):
            FA.FWD_IMPL, FA.BWD_IMPL = fwd_impl, bwd_impl
            fn = build(a.dropout, a.k)
            float(fn(jnp.asarray(0, jnp.int32)))       # compile
            t0 = time.perf_counter()
            for r in range(a.reps):
                out = fn(jnp.asarray(r, jnp.int32))
            float(out)
            us = (time.perf_counter() - t0) / (a.reps * a.k) * 1e6
            print(f"fwd={fwd_impl:8s} bwd={bwd_impl:8s} {us:8.1f} "
                  f"us/layer-call (x12 = {us * 12 / 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
