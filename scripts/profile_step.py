"""Component ablation of the train step on the real chip.

Times (honest sync: device->host scalar per chunk, amortized) each
nested subset of the full train iteration at the bench geometry
(t5-base, bs 80), to localize where the measured-vs-roofline gap lives:

  fwd_det        deterministic forward (no dropout)
  fwd            forward with dropout (rbg key)
  fwd_bwd        value_and_grad
  fwd_bwd_opt    + clip/adam/wd update direction
  full           the production train_step (incl. param update, donate)

Usage: python scripts/profile_step.py [--chunk 10] [--chunks 3]
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

from vqacl_tpu.data.collate import collate
from vqacl_tpu.data.synthetic import SyntheticVQA
from vqacl_tpu.models.prototype import ProtoState
from vqacl_tpu.models.vlt5 import forward_train, init_vlt5_params
from vqacl_tpu.train.optim import make_transform
from vqacl_tpu.train.state import TrainState
from vqacl_tpu.train.step import make_train_step
from vqacl_tpu.utils.config import Config


def timeit(fn, sync, chunks, chunk, label=""):
    fn()  # compile
    sync()
    t0 = time.perf_counter()
    for _ in range(chunks):
        for _ in range(chunk):
            fn()
        sync()
    ms = (time.perf_counter() - t0) / (chunks * chunk) * 1e3
    if label:
        print(f"{label:16s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--chunks", type=int, default=3)
    args = ap.parse_args()

    cfg = Config()
    m, tcfg = cfg.model, cfg.train
    from vqacl_tpu.utils.config import resolve_fused_attention
    resolve_fused_attention(m, n_devices=len(jax.devices()))
    B = tcfg.batch_size

    pool = SyntheticVQA(B, seed=0, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                        text_len=m.max_text_length, vocab_size=m.vocab_size,
                        answer_vocab=64)
    batch = collate(pool.examples, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                    max_text_length=m.max_text_length,
                    target_max_length=m.target_max_length)["tensors"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    params = init_vlt5_params(jax.random.PRNGKey(0), m)
    tx = make_transform(tcfg)
    proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)
    state = TrainState.create(params, tx, proto,
                              jax.random.key(1, impl="rbg"))

    def loss_fn(params, proto, batch, rng, det, remat=False):
        out = forward_train(params, m, batch, proto,
                            proto_alpha=tcfg.proto_alpha,
                            proto_beta=tcfg.proto_beta,
                            use_prototype=True,
                            deterministic=det, rng=rng, dtype=jnp.bfloat16,
                            remat=remat)
        return out.loss, (out.proto_state, out.aux)

    rng = jax.random.key(1, impl="rbg")
    res = {}

    fwd_det = jax.jit(lambda p, pr, b: loss_fn(p, pr, b, None, True)[0])
    out = [None]
    res["fwd_det"] = timeit(
        lambda: out.__setitem__(0, fwd_det(params, proto, batch)),
        lambda: float(out[0]), args.chunks, args.chunk,
        label="fwd_det")

    fwd = jax.jit(lambda p, pr, b, r: loss_fn(p, pr, b, r, False)[0])
    res["fwd"] = timeit(
        lambda: out.__setitem__(0, fwd(params, proto, batch, rng)),
        lambda: float(out[0]), args.chunks, args.chunk,
        label="fwd")

    gfn_det = jax.jit(lambda p, pr, b: jax.value_and_grad(
        lambda q: loss_fn(q, pr, b, None, True)[0])(p))
    res["fwd_bwd_det"] = timeit(
        lambda: out.__setitem__(0, gfn_det(params, proto, batch)[0]),
        lambda: float(out[0]), args.chunks, args.chunk,
        label="fwd_bwd_det")

    gfn = jax.jit(lambda p, pr, b, r: jax.value_and_grad(
        lambda q: loss_fn(q, pr, b, r, False)[0])(p))
    res["fwd_bwd"] = timeit(
        lambda: out.__setitem__(0, gfn(params, proto, batch, rng)[0]),
        lambda: float(out[0]), args.chunks, args.chunk,
        label="fwd_bwd")

    gfn_dots = jax.jit(lambda p, pr, b, r: jax.value_and_grad(
        lambda q: loss_fn(q, pr, b, r, False, remat="dots")[0])(p))
    res["fwd_bwd_dots"] = timeit(
        lambda: out.__setitem__(0, gfn_dots(params, proto, batch, rng)[0]),
        lambda: float(out[0]), args.chunks, args.chunk,
        label="fwd_bwd_dots")

    opt_state = tx.init(params)

    def fbo(p, os_, pr, b, r):
        l, g = jax.value_and_grad(lambda q: loss_fn(q, pr, b, r, False)[0])(p)
        upd, os2 = tx.update(g, os_, p)
        return l, upd, os2
    fbo_j = jax.jit(fbo)
    res["fwd_bwd_opt"] = timeit(
        lambda: out.__setitem__(0, fbo_j(params, opt_state, proto, batch, rng)[0]),
        lambda: float(out[0]), args.chunks, args.chunk,
        label="fwd_bwd_opt")

    train_step = make_train_step(cfg, tx, dtype=jnp.bfloat16)
    st = [state]
    mtr = [None]

    def run_full():
        st[0], mtr[0] = train_step(st[0], batch)
    res["full"] = timeit(run_full, lambda: float(mtr[0]["loss"]),
                         args.chunks, args.chunk, label="full")

    cfg.train.adam_dtype = "bfloat16"
    tx16 = make_transform(cfg.train)
    # `full` donated the original param buffers — fresh copies here
    params16 = jax.tree.map(jnp.copy, st[0].params)
    proto16 = jax.tree.map(jnp.copy, st[0].proto)
    state16 = TrainState.create(params16, tx16, proto16,
                                jax.random.key(2, impl="rbg"))
    step16 = make_train_step(cfg, tx16, dtype=jnp.bfloat16)
    st16 = [state16]

    def run_16():
        st16[0], mtr[0] = step16(st16[0], batch)
    res["full_adam_bf16"] = timeit(run_16, lambda: float(mtr[0]["loss"]),
                                   args.chunks, args.chunk,
                                   label="full_adam_bf16")

    for k, v in res.items():
        print(f"{k:14s} {v:8.2f} ms")
    print(f"bwd cost       {res['fwd_bwd'] - res['fwd']:8.2f} ms")
    print(f"opt cost       {res['fwd_bwd_opt'] - res['fwd_bwd']:8.2f} ms")
    print(f"update cost    {res['full'] - res['fwd_bwd_opt']:8.2f} ms")


if __name__ == "__main__":
    main()
