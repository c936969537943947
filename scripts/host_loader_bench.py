"""Host (h5-fed) data-pipeline benchmark: serial vs multi-worker loader.

The reference feeds its GPU with ``DataLoader(num_workers=4)``
(vqa_data_memory.py:880). The rebuild's default fast path keeps the
feature table in HBM (``--device_cache``), but the plain h5-fed path —
the first thing a new user runs — has a host-side batch-build cost:
h5 read + box normalize + tokenize + static-shape collate. This script
measures that cost at the published geometry (bs 80, 20-token text,
36 boxes × 2048f) for num_workers ∈ {1, 2, 4}, plus the end-to-end
host-fed TPU step when a device is available.

Usage: python scripts/host_loader_bench.py [--n_images 2000]
           [--n_questions 4000] [--batch_size 80] [--steps 40] [--device]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def build_h5(path: str, n_images: int) -> list:
    from vqacl_tpu.data.features import write_h5
    rng = np.random.default_rng(0)
    ids = [f"COCO_val2014_{i:012d}" for i in range(n_images)]

    def records():
        for img_id in ids:
            yield img_id, {
                "features": rng.normal(size=(36, 2048)).astype(np.float32),
                "boxes": rng.uniform(1, 400, (36, 4)).astype(np.float32),
                "img_h": 480, "img_w": 640,
            }
    write_h5(path, records())
    return ids


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=2000)
    ap.add_argument("--n_questions", type=int, default=4000)
    ap.add_argument("--batch_size", type=int, default=80)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--device", action="store_true",
                    help="also time the host-fed TPU train step")
    a = ap.parse_args()

    from vqacl_tpu.data.features import H5FeatureStore
    from vqacl_tpu.data.partition import BatchLoader, VQAPartitionDataset
    from vqacl_tpu.data.tokenizer import VLT5Tokenizer

    tmp = tempfile.mkdtemp(prefix="loaderbench_")
    h5_path = os.path.join(tmp, "val2014_obj36.h5")
    print(f"building synthetic h5 ({a.n_images} images)...", flush=True)
    ids = build_h5(h5_path, a.n_images)

    rng = np.random.default_rng(1)
    items = []
    for q in range(a.n_questions):
        items.append({
            "img_id": ids[int(rng.integers(0, len(ids)))],
            "question_id": q,
            "sent": f"what color is the object number {q} in this image",
            "label": {"red": 0.6, "blue": 0.3, "green": 0.1},
        })
    tok = VLT5Tokenizer()
    n_steps = min(a.steps, a.n_questions // a.batch_size)
    results = {}
    for nw in [int(x) for x in a.workers.split(",")]:
        store = H5FeatureStore({"val2014": h5_path}, cache_items=1)
        ds = VQAPartitionDataset(items, tok, store, {}, {}, mode="train",
                                 seed=66666)
        loader = BatchLoader(ds, np.arange(len(items)), a.batch_size,
                             shuffle=True, seed=3, num_workers=nw)
        it = iter(loader)
        next(it)                       # warm: open files, prime tokenizer
        t0 = time.perf_counter()
        n = 0
        for _ in range(n_steps - 1):
            next(it)
            n += 1
        dt = (time.perf_counter() - t0) / n
        results[nw] = dt
        print(f"workers={nw}: {dt * 1e3:.1f} ms/batch "
              f"({a.batch_size / dt:.0f} examples/s host-side)", flush=True)

    out = {"metric": "host batch-build ms (bs %d)" % a.batch_size,
           **{f"workers_{k}": round(v * 1e3, 1) for k, v in results.items()}}

    if a.device:
        import jax
        import jax.numpy as jnp

        from vqacl_tpu.models.prototype import ProtoState
        from vqacl_tpu.models.vlt5 import init_vlt5_params
        from vqacl_tpu.train.optim import make_transform
        from vqacl_tpu.train.state import TrainState
        from vqacl_tpu.train.step import make_train_step
        from vqacl_tpu.utils.config import Config, resolve_fused_attention

        cfg = Config()   # t5-base geometry
        cfg.train.batch_size = a.batch_size
        m = cfg.model
        resolve_fused_attention(m, n_devices=len(jax.devices()))
        params = init_vlt5_params(jax.random.PRNGKey(0), m)
        tx = make_transform(cfg.train)
        proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)
        state = TrainState.create(params, tx, proto,
                                  jax.random.key(1, impl="rbg"),
                                  warmup_iters=100.0, t_total=1000.0)
        step = make_train_step(cfg, tx, dtype=jnp.bfloat16)
        store = H5FeatureStore({"val2014": h5_path}, cache_items=1)
        ds = VQAPartitionDataset(items, tok, store, {}, {}, mode="train",
                                 seed=66666)
        loader = BatchLoader(ds, np.arange(len(items)), a.batch_size,
                             shuffle=True, seed=3, num_workers=4,
                             drop_last=True)
        it = iter(loader)
        b = next(it)["tensors"]
        state, m = step(state, {k: jnp.asarray(v) for k, v in b.items()})
        float(m["loss"])               # compile + sync
        t0 = time.perf_counter()
        n = 0
        for _ in range(n_steps - 1):
            b = next(it)["tensors"]
            state, m = step(state, {k: jnp.asarray(v) for k, v in b.items()})
            n += 1
        float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        out["host_fed_step_ms"] = round(dt * 1e3, 1)
        print(f"host-fed TPU step: {dt * 1e3:.1f} ms/step", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
