"""A/B the fused-attention kernels (serial per-head dots vs head-batched
dot_generals) at the bench geometry, with enough statistics to make a
default-flipping decision: all variants are compiled up front, then the
timed samples INTERLEAVE round-robin across variants so slow drift on
the tunneled chip (thermal, host, network) hits every variant equally.
Each sample times R back-to-back calls ending in ONE device->host scalar
pull (the pull costs a ~24 ms tunnel RTT; amortizing it over R calls
keeps the artifact small and constant across variants).

Compute happens device-side inside a lax.scan (k layer-calls per
program call) so host dispatch cannot leak into per-layer numbers.

Usage: python scripts/attn_kernel_probe.py [--trials 24] [--k 64]
Prints mean +/- std per variant and a verdict line per comparison:
LANDS iff the win clears 2 sigma of the paired-difference noise.
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
    ap.add_argument("--trials", type=int, default=24,
                    help="timed samples per variant, interleaved")
    ap.add_argument("--calls", type=int, default=4,
                    help="back-to-back program calls per sample "
                         "(one scalar pull at the end)")
    ap.add_argument("--k", type=int, default=64,
                    help="layer-calls per program call (lax.scan length)")
    ap.add_argument("--dropout", type=float, default=0.1)
    a = ap.parse_args()

    variants = [("serial", "serial"), ("serial", "batched"),
                ("batched", "serial"), ("batched", "batched")]
    fns = {}
    for fwd_impl, bwd_impl in variants:
        FA.FWD_IMPL, FA.BWD_IMPL = fwd_impl, bwd_impl
        fn = build(a.dropout, a.k)
        float(fn(jnp.asarray(0, jnp.int32)))       # compile + warm
        fns[(fwd_impl, bwd_impl)] = fn

    samples = {vkey: [] for vkey in variants}      # us per layer-call
    for t in range(a.trials):
        for vkey in variants:
            fn = fns[vkey]
            t0 = time.perf_counter()
            for c in range(a.calls):
                out = fn(jnp.asarray(t * a.calls + c + 1, jnp.int32))
            float(out)                             # one pull per sample
            us = (time.perf_counter() - t0) / (a.calls * a.k) * 1e6
            samples[vkey].append(us)

    stats = {}
    for vkey in variants:
        arr = np.asarray(samples[vkey])
        stats[vkey] = (arr.mean(), arr.std(ddof=1))
        print(f"fwd={vkey[0]:8s} bwd={vkey[1]:8s} "
              f"{arr.mean():8.1f} +/- {arr.std(ddof=1):5.1f} us/layer-call "
              f"(x12 = {arr.mean() * 12 / 1e3:.3f} +/- "
              f"{arr.std(ddof=1) * 12 / 1e3:.3f} ms/step)  "
              f"[n={a.trials}, min {arr.min():.1f}]")

    # paired verdicts: per-trial differences share drift, so use the
    # std of the DIFFERENCE, not the pooled stds
    base = np.asarray(samples[("serial", "serial")])
    for vkey in variants[1:]:
        d = base - np.asarray(samples[vkey])       # >0 = variant faster
        mean_ms = d.mean() * 12 / 1e3
        sem_ms = d.std(ddof=1) / np.sqrt(len(d)) * 12 / 1e3
        verdict = "LANDS" if mean_ms > 2 * sem_ms else (
            "REGRESSES" if mean_ms < -2 * sem_ms else "NOISE")
        print(f"verdict fwd={vkey[0]}/bwd={vkey[1]} vs serial/serial: "
              f"{mean_ms:+.3f} ms/step +/- {sem_ms:.3f} (SEM, paired, "
              f"n={len(d)}) -> {verdict}")


if __name__ == "__main__":
    main()
