"""End-to-end VQACL soak at full model scale on the attached TPU.

Runs the ENTIRE dual-level benchmark loop — 10 tasks × 5 groups with
replay, per-epoch validation, per-task checkpoints, and the full
55-cell greedy-decode test matrix — on synthetic data at t5-base scale
with the HBM feature cache, and reports wall-clock. This is the number
behind BENCH_NOTES.md's "full-benchmark soak" row.

  python scripts/soak.py                  # small: 1000 QA/task, M=1000
  python scripts/soak.py --full           # published protocol scale:
                                          # 29k QA/task, M=5000, 3 epochs
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="published-protocol scale (≈45 min)")
    ap.add_argument("--out", default="/tmp/soak_snap")
    args = ap.parse_args()

    import jax.numpy as jnp

    from vqacl_tpu.cl.trainer import VQACLTrainer
    from vqacl_tpu.data.synthetic_module import SyntheticDataModule
    from vqacl_tpu.data.tokenizer import VLT5Tokenizer
    from vqacl_tpu.utils.config import Config

    cfg = Config()
    cfg.output = args.out
    cfg.train.epochs = 3 if args.full else 1
    cfg.train.m_size = 5000 if args.full else 1000
    cfg.data.device_cache = True
    n_train = 29000 if args.full else 1000

    tok = VLT5Tokenizer()
    t0 = time.perf_counter()
    data = SyntheticDataModule(
        tok, n_train_per_task=n_train, n_val_per_task=200,
        n_test_per_task=200, feat_dim=cfg.model.feat_dim,
        n_boxes=cfg.model.n_boxes, answer_vocab=32, seed=0,
        # bounded image pool (real VQA v2 ≈ 7 questions/image): keeps
        # the full-scale HBM feature cache at ~1.8 GB bf16
        n_images=12_400 if args.full else None)
    print(f"data built in {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    trainer = VQACLTrainer(cfg, data, tok, verbose=True,
                           dtype=jnp.bfloat16)
    metrics = trainer.train()
    dt = time.perf_counter() - t0
    print(f"\nSOAK {'full' if args.full else 'small'}: {dt:.1f}s "
          f"wall-clock; Avg_acc={metrics['Avg_acc']:.2f} "
          f"Avg_forget={metrics['Avg_forget']:.2f}", flush=True)


if __name__ == "__main__":
    main()
