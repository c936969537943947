"""Raw-matmul ceilings for the train step's hot shapes on this chip.

Per-call dispatch over the tunneled chip is ~ms, so each case repeats
K times INSIDE one jit program (scan over perturbed inputs, scalar-sum
carry fused as matmul epilogue) and the program is timed with a
device->host sync. Answers: is the ~35% MXU efficiency in the step
trace a hardware reality at these geometries, or recoverable headroom?
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, S, D, F, H, dk = 80, 56, 768, 3072, 12, 64
K = int(os.environ.get("MM_K", "32"))   # in-program repetitions
PEAK = 197e12    # v5e (TPU v5 lite) bf16 peak — 394 is the INT8 TOPS
                 # figure; earlier rounds normalized MXU% against it,
                 # understating utilization 2x (BENCH_NOTES "r4 peak
                 # correction")


def bench(make_step, flops_per_rep, reps=6):
    """make_step() -> (jitted fn(i32) -> f32 scalar) running K reps."""
    fn = make_step()
    float(fn(jnp.asarray(0, jnp.int32)))          # compile + warm
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(jnp.asarray(r, jnp.int32))
    float(out)
    dt = (time.perf_counter() - t0) / (reps * K)
    return dt, flops_per_rep / dt


def scan_case(body, flops):
    """body(i) must return a scalar f32 depending on iteration index."""
    def make():
        def prog(seed):
            def step(acc, i):
                return acc + body(i + seed), None
            acc, _ = lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
            return acc
        return jax.jit(prog)
    return bench(make, flops)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    dh = jnp.asarray(rng.normal(size=(B, S, F)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, F)), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(size=(D, D)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)), jnp.bfloat16)
    q0 = jnp.asarray(rng.normal(size=(B, S, H, dk)), jnp.bfloat16)
    wat = jnp.asarray(rng.normal(size=(B, H, S, S)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(1, H, S, S)), jnp.float32)

    def perturb(a, i):
        return a + (i.astype(jnp.bfloat16) * 1e-6)

    cases = {}

    cases["mlp_wi fwd [4480,768]x[768,3072]"] = scan_case(
        lambda i: jnp.sum(perturb(x, i) @ w1).astype(jnp.float32),
        2 * B * S * D * F)

    cases["mlp_wi dW btd,btf->df"] = scan_case(
        lambda i: jnp.sum(jnp.einsum("btd,btf->df", perturb(x, i), dh,
                                     preferred_element_type=jnp.float32)),
        2 * B * S * D * F)

    # ---- dW variants (the step trace's ~39% MXU item: 24 of these
    # per step at 133 us each; which formulation is fastest?) ----
    x2 = x.reshape(B * S, D)
    dh2 = dh.reshape(B * S, F)

    cases["mlp_wi dW 2d dot_general k=dim0"] = scan_case(
        lambda i: jnp.sum(lax.dot_general(
            perturb(x2, i), dh2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)),
        2 * B * S * D * F)

    def dw_splitk(i, parts=4):
        xx = perturb(x2, i)
        kc = (B * S) // parts
        acc = jnp.zeros((D, F), jnp.float32)
        for p in range(parts):
            acc = acc + lax.dot_general(
                xx[p * kc:(p + 1) * kc], dh2[p * kc:(p + 1) * kc],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(acc)
    cases["mlp_wi dW split-K x4 (XLA)"] = scan_case(
        lambda i: dw_splitk(i), 2 * B * S * D * F)

    cases["mlp_wi dW pre-transposed [768,4480]@"] = scan_case(
        lambda i: jnp.sum(
            perturb(x2, i).T @ dh2).astype(jnp.float32),
        2 * B * S * D * F)

    cases["mlp_wi dW + gnorm epilogue"] = scan_case(
        lambda i: jnp.sum(jnp.square(jnp.einsum(
            "btd,btf->df", perturb(x, i), dh,
            preferred_element_type=jnp.float32))),
        2 * B * S * D * F)

    # Pallas dW: K-sliced accumulation, out tile resident in VMEM
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dw_kernel(x_ref, g_ref, o_ref):
        k = pl.program_id(1)
        acc = lax.dot_general(x_ref[:], g_ref[:], (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

        @pl.when(k == 0)
        def _():
            o_ref[:] = acc

        @pl.when(k != 0)
        def _():
            o_ref[:] = o_ref[:] + acc

    def pallas_dw(xx, gg, nt=3, kt=4):
        KK = xx.shape[0]
        kc, nc = KK // kt, F // nt
        return pl.pallas_call(
            dw_kernel,
            grid=(nt, kt),
            in_specs=[
                pl.BlockSpec((kc, D), lambda n, k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kc, nc), lambda n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((D, nc), lambda n, k: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D, F), jnp.float32),
        )(xx, gg)

    if jax.devices()[0].platform != "cpu":
        cases["mlp_wi dW pallas splitK 3x4"] = scan_case(
            lambda i: jnp.sum(pallas_dw(perturb(x2, i), dh2)),
            2 * B * S * D * F)
        cases["mlp_wi dW pallas splitK 6x8"] = scan_case(
            lambda i: jnp.sum(pallas_dw(perturb(x2, i), dh2, nt=6, kt=8)),
            2 * B * S * D * F)

    cases["attn proj [4480,768]x[768,768]"] = scan_case(
        lambda i: jnp.sum(perturb(x, i) @ wq).astype(jnp.float32),
        2 * B * S * D * D)

    cases["qkv merged [4480,768]x[768,2304]"] = scan_case(
        lambda i: jnp.sum(perturb(x, i) @ wqkv).astype(jnp.float32),
        2 * B * S * D * 3 * D)

    cases["scores bqhd,bkhd->bhqk"] = scan_case(
        lambda i: jnp.sum(jnp.einsum(
            "bqhd,bkhd->bhqk", perturb(q0, i), q0,
            preferred_element_type=jnp.float32)),
        2 * B * H * S * S * dk)

    cases["attnout bhqk,bkhd->bqhd"] = scan_case(
        lambda i: jnp.sum(jnp.einsum(
            "bhqk,bkhd->bqhd", perturb(wat, i), q0,
            preferred_element_type=jnp.float32)),
        2 * B * H * S * S * dk)

    def attn_core(i):
        xx = perturb(x, i)
        qq = (xx @ wq).reshape(B, S, H, dk)
        kk = (xx @ wq).reshape(B, S, H, dk)
        vv = (xx @ wq).reshape(B, S, H, dk)
        sc = jnp.einsum("bqhd,bkhd->bhqk", qq, kk,
                        preferred_element_type=jnp.float32)
        w = jax.nn.softmax(sc + bias, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, vv,
                       preferred_element_type=jnp.float32)
        return jnp.sum(o.astype(jnp.bfloat16).reshape(B, S, D) @ wq
                       ).astype(jnp.float32)
    cases["attn block fwd (4 proj + core)"] = scan_case(
        attn_core, 2 * B * S * D * D * 4 + 2 * 2 * B * H * S * S * dk)

    print(f"{'case':42s} {'us':>8} {'TFLOP/s':>8} {'MXU%':>5}")
    for name, (t, rate) in cases.items():
        print(f"{name:42s} {t*1e6:8.1f} {rate/1e12:8.1f} "
              f"{100*rate/PEAK:5.1f}")


if __name__ == "__main__":
    main()
