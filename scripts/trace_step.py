"""Capture an xprof trace of the train step and print top HLO ops.

Usage: python scripts/trace_step.py [--steps 6] [--out /tmp/xtrace]
Prints the top-N HLO ops by self time (device), with occurrence counts,
to localize memory-bound fusion hotspots.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--out", default="/tmp/xtrace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--mode", default="train",
                    choices=["train", "fwd", "decode"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqacl_tpu.data.collate import collate
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_eval_step, make_train_step
    from vqacl_tpu.utils.config import Config

    cfg = Config()
    m = cfg.model
    from vqacl_tpu.utils.config import resolve_fused_attention
    resolve_fused_attention(m, n_devices=len(jax.devices()))
    B = cfg.train.batch_size
    pool = SyntheticVQA(B, seed=0, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                        text_len=m.max_text_length, vocab_size=m.vocab_size,
                        answer_vocab=64)
    batch = collate(pool.examples, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                    max_text_length=m.max_text_length,
                    target_max_length=m.target_max_length)["tensors"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_vlt5_params(jax.random.PRNGKey(0), m)
    tx = make_transform(cfg.train)
    proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)
    state = TrainState.create(params, tx, proto,
                              jax.random.key(1, impl="rbg"))

    if args.mode == "train":
        step = make_train_step(cfg, tx, dtype=jnp.bfloat16)
        state, mtr = step(state, batch)     # compile
        float(mtr["loss"])

        def run():
            nonlocal state
            state, mm = step(state, batch)
            return mm["loss"]
    elif args.mode == "decode":
        estep = make_eval_step(cfg, dtype=jnp.bfloat16)
        toks = estep(state.params, state.proto, batch)
        import numpy as np
        int(np.asarray(toks)[0, 0])

        def run():
            return estep(state.params, state.proto, batch)[0, 0]

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        x = run()
    float(jnp.asarray(x, jnp.float32))
    jax.profiler.stop_trace()

    analyze(args.out, args.top, args.steps)


def analyze(out_dir, top, n_steps):
    import json

    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.xplane.pb")))
    assert paths, f"no xplane under {out_dir}"
    path = paths[-1]
    from xprof.convert import raw_to_tool_data as rtd
    raw, _ = rtd.xspace_to_tool_data([path], "hlo_stats", {})
    if isinstance(raw, bytes):
        raw = raw.decode()
    data = json.loads(raw)
    cols = [c["id"] for c in data["cols"]]
    i_cat = cols.index("category")
    i_name = cols.index("hlo_op_name")
    i_self = cols.index("total_self_time")
    i_occ = cols.index("occurrences")
    i_bound = cols.index("bound_by") if "bound_by" in cols else None
    i_bw = (cols.index("measured_memory_bw")
            if "measured_memory_bw" in cols else None)
    i_expr = (cols.index("hlo_op_expression")
              if "hlo_op_expression" in cols else None)

    def val(row, i):
        v = row["c"][i]
        return v.get("v") if isinstance(v, dict) else v

    agg = {}
    for row in data["rows"]:
        name = val(row, i_name)
        t = float(val(row, i_self) or 0.0)
        cat = val(row, i_cat)
        occ = int(val(row, i_occ) or 0)
        bound = val(row, i_bound) if i_bound is not None else "?"
        bw = float(val(row, i_bw) or 0) if i_bw is not None else 0.0
        expr = (val(row, i_expr) or "")[:110] if i_expr is not None else ""
        cur = agg.get(name)
        if cur:
            cur[0] += t
            cur[2] += occ
        else:
            agg[name] = [t, cat, occ, bound, bw, expr]
    items = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in items)
    print(f"\ntotal device self time: {total/1e3:.2f} ms "
          f"({total/1e3/max(n_steps,1):.2f} ms/step over {n_steps} steps)")
    print(f"{'us/step':>8} {'cum%':>5} {'occ':>4} {'bound':>7} "
          f"{'GiB/s':>6}  {'category':16s} name")
    cum = 0.0
    for name, (t, cat, occ, bound, bw, expr) in items[:top]:
        cum += t
        print(f"{t/max(n_steps,1):8.1f} {100*cum/total:5.1f} {occ:4d} "
              f"{str(bound)[:7]:>7} {bw:6.0f}  {str(cat)[:16]:16s} "
              f"{name[:60]}")
        if expr:
            print(f"{'':42s}{expr}")


if __name__ == "__main__":
    main()
