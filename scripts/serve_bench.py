"""Online-serving throughput bench: VQAServer at t5-base on the TPU.

Drives the continuous-batching server (serve.py::VQAServer) with C
closed-loop client threads for D seconds against the HBM-resident
feature table (requests carry int32 slots; the gather runs inside the
compiled decode program — same tiering the trainer's --device_cache
uses). Reports sustained answers/s, batch fill, and request latency,
next to the offline decode capacity of the same compiled program.

  python scripts/serve_bench.py [--clients 64] [--seconds 20]
      [--batch_size 100] [--beams 1] [--host_features]

--host_features switches to the host-fed path (features shipped per
batch) to expose the input-transfer cost — on this setup's tunneled
chip that is dominated by the ~MB/batch host->device copies.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=64)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--beams", type=int, default=1)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--pipeline_depth", type=int, default=0)
    p.add_argument("--n_images", type=int, default=2000)
    p.add_argument("--warmup_train_steps", type=int, default=40,
                   help="brief training so greedy decode early-exits "
                        "like a real VQA model (answers are 1-3 words)")
    p.add_argument("--host_features", action="store_true")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vqacl_tpu.data.collate import collate
    from vqacl_tpu.data.device_cache import DeviceFeatureCache
    from vqacl_tpu.data.features import MemoryFeatureStore
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.data.tokenizer import VLT5Tokenizer
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.serve import VQAPredictor, VQAServer
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_train_step
    from vqacl_tpu.utils.config import Config, resolve_fused_attention

    cfg = Config()
    m = cfg.model
    resolve_fused_attention(m, n_devices=len(jax.devices()))

    params = init_vlt5_params(jax.random.PRNGKey(0), m)
    proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)

    if a.warmup_train_steps:
        tx = make_transform(cfg.train)
        state = TrainState.create(params, tx, proto,
                                  jax.random.key(1, impl="rbg"),
                                  warmup_iters=100.0, t_total=1000.0)
        step = make_train_step(cfg, tx, dtype=jnp.bfloat16)
        pool = SyntheticVQA(cfg.train.batch_size, seed=0, feat_dim=m.feat_dim,
                            n_boxes=m.n_boxes, text_len=m.max_text_length,
                            vocab_size=m.vocab_size, answer_vocab=64)
        b = collate(pool.examples, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                    max_text_length=m.max_text_length,
                    target_max_length=m.target_max_length)["tensors"]
        b = {k: jnp.asarray(v) for k, v in b.items()}
        for _ in range(a.warmup_train_steps):
            state, mtr = step(state, b)
        float(mtr["loss"])
        params, proto = state.params, state.proto
        print(f"warmup: {a.warmup_train_steps} train steps, "
              f"loss {float(mtr['loss']):.4f}")

    # synthetic feature corpus -> HBM table (bf16)
    rng = np.random.default_rng(0)
    store = MemoryFeatureStore()
    ids = [f"img{i}" for i in range(a.n_images)]
    for img in ids:
        store.put(img,
                  rng.normal(size=(m.n_boxes, m.feat_dim)).astype(np.float32),
                  rng.uniform(0, 1, (m.n_boxes, 4)).astype(np.float32))
    tok = VLT5Tokenizer()
    if a.host_features:
        pred = VQAPredictor(cfg, params, proto, tok, store,
                            batch_size=a.batch_size, num_beams=a.beams)
        mode = "host-fed"
    else:
        cache, slot_of = DeviceFeatureCache.from_store(store, ids)
        pred = VQAPredictor(cfg, params, proto, tok, None,
                            batch_size=a.batch_size, num_beams=a.beams,
                            device_cache=cache, slot_of=slot_of)
        mode = "hbm-cache"

    # offline capacity of the same compiled program (full batches,
    # 30-call chunks to amortize the tunnel-RTT sync — BENCH_NOTES)
    qs = [f"what is in region {i}?" for i in range(a.batch_size)]
    im = [ids[i % len(ids)] for i in range(a.batch_size)]
    exs = pred._examples(qs, im)
    pred.decode_chunk(exs)                       # compile
    t0 = time.perf_counter()
    for _ in range(30):
        out = pred.decode_chunk(exs)
    dt = (time.perf_counter() - t0) / 30
    offline = a.batch_size / dt
    print(f"offline capacity [{mode}]: {offline:.0f} answers/s "
          f"({dt * 1e3:.2f} ms/batch of {a.batch_size}); "
          f"sample answer: {out[0]!r}")

    # closed-loop concurrent clients against the server
    srv = VQAServer(pred, max_wait_ms=a.max_wait_ms,
                    pipeline_depth=a.pipeline_depth)
    srv.submit(qs[0], im[0]).result()            # warm path
    stop = threading.Event()
    counts = [0] * a.clients

    def client(ci: int) -> None:
        k = ci
        while not stop.is_set():
            q = f"what is in region {k}?"
            img = ids[k % len(ids)]
            try:
                srv.submit(q, img).result(timeout=60)
            except Exception:
                if stop.is_set():
                    break
                raise
            counts[ci] += 1
            k += a.clients

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(a.clients)]
    base = srv.stats()
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(a.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    wall = time.perf_counter() - t0
    served = sum(counts)
    st = srv.stats()
    srv.close()
    print(f"served [{mode}]: {served / wall:.0f} answers/s sustained "
          f"({served} answers, {a.clients} closed-loop clients, "
          f"{wall:.1f} s)")
    print(f"batches: {st['batches'] - base['batches']}, mean fill "
          f"{(st['requests'] - base['requests']) / max(st['batches'] - base['batches'], 1):.1f}"
          f"/{a.batch_size}; latency p50 {st['latency_p50_ms']:.1f} ms, "
          f"p99 {st['latency_p99_ms']:.1f} ms")


if __name__ == "__main__":
    main()
