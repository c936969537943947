"""A/B the Adam moment storage dtype (f32 reference-parity vs bf16) at
the FULL bench train step (t5-base VL-T5, bs 80), with paired
statistics: the two variants' timed chunks INTERLEAVE so tunnel/host
drift hits both equally, and the verdict uses the std of the per-trial
DIFFERENCE. Each sample times a chunk of steps ending in one scalar
pull (amortizes the ~24 ms tunnel RTT — BENCH_NOTES dispatch-chunk
probe).

The xprof profile attributes ~0.6 ms/step to the f32 moment traffic of
the shared-embedding update at the HBM roofline (BENCH_NOTES late-r3
re-profile); this probe decides whether that win clears run-to-run
noise end-to-end, i.e. whether `adam_dtype=bfloat16` should become the
bench/production default (the f32 flag stays for bit-exact reference
parity either way).

Usage: python scripts/adam_dtype_probe.py [--trials 12] [--chunk 10]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=10,
                    help="train steps per timed sample")
    a = ap.parse_args()

    from vqacl_tpu.data.collate import collate
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_train_step
    from vqacl_tpu.utils.config import Config, resolve_fused_attention

    cfg = Config()
    m = cfg.model
    resolve_fused_attention(m, n_devices=len(jax.devices()))
    B = cfg.train.batch_size

    pool = SyntheticVQA(B, seed=0, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                        text_len=m.max_text_length, vocab_size=m.vocab_size,
                        answer_vocab=64)
    batch = collate(pool.examples, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                    max_text_length=m.max_text_length,
                    target_max_length=m.target_max_length)["tensors"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variants = ["float32", "bfloat16"]
    states, steps = {}, {}
    for adam_dtype in variants:
        cfg.train.adam_dtype = adam_dtype
        tx = make_transform(cfg.train)
        params = init_vlt5_params(jax.random.PRNGKey(0), m)
        proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)
        st = TrainState.create(params, tx, proto,
                               jax.random.key(1, impl="rbg"),
                               warmup_iters=100.0, t_total=1000.0)
        step = make_train_step(cfg, tx, dtype=jnp.bfloat16)
        st, mtr = step(st, batch)                   # compile + warm
        float(mtr["loss"])
        states[adam_dtype], steps[adam_dtype] = st, step

    samples = {v: [] for v in variants}             # ms/step
    for t in range(a.trials):
        for v in variants:
            st, step = states[v], steps[v]
            t0 = time.perf_counter()
            for _ in range(a.chunk):
                st, mtr = step(st, batch)
            float(mtr["loss"])                      # sync barrier
            samples[v].append((time.perf_counter() - t0) / a.chunk * 1e3)
            states[v] = st

    for v in variants:
        arr = np.asarray(samples[v])
        print(f"adam_dtype={v:8s} {arr.mean():7.2f} +/- "
              f"{arr.std(ddof=1):4.2f} ms/step  "
              f"[n={a.trials}, min {arr.min():.2f}]")

    d = np.asarray(samples["float32"]) - np.asarray(samples["bfloat16"])
    sem = d.std(ddof=1) / np.sqrt(len(d))
    verdict = "LANDS" if d.mean() > 2 * sem else (
        "REGRESSES" if d.mean() < -2 * sem else "NOISE")
    print(f"verdict bfloat16 vs float32: {d.mean():+.3f} ms/step +/- "
          f"{sem:.3f} (SEM, paired, n={len(d)}) -> {verdict}")


if __name__ == "__main__":
    main()
