"""Compare XLA vs Pallas-fused encoder attention at bench geometry.

Times the det fwd loss (encoder+decoder+loss) with cfg.fused_attention
on/off. Decides whether a fwd+bwd Pallas attention kernel is worth
building: if fused fwd is already ~XLA fwd, the bwd kernel's saved
layout copies flip the balance.
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

from vqacl_tpu.data.collate import collate
from vqacl_tpu.data.synthetic import SyntheticVQA
from vqacl_tpu.models.prototype import ProtoState
from vqacl_tpu.models.vlt5 import forward_train, init_vlt5_params
from vqacl_tpu.utils.config import Config


def timeit(fn, sync, chunks=3, chunk=10):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(chunks):
        for _ in range(chunk):
            fn()
        sync()
    return (time.perf_counter() - t0) / (chunks * chunk) * 1e3


def main():
    cfg = Config()
    m, tcfg = cfg.model, cfg.train
    B = tcfg.batch_size
    pool = SyntheticVQA(B, seed=0, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                        text_len=m.max_text_length, vocab_size=m.vocab_size,
                        answer_vocab=64)
    batch = collate(pool.examples, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                    max_text_length=m.max_text_length,
                    target_max_length=m.target_max_length)["tensors"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_vlt5_params(jax.random.PRNGKey(0), m)
    proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)

    out = [None]
    rng = jax.random.key(1, impl="rbg")
    for fused in (False, True):
        m.fused_attention = fused

        @jax.jit
        def fwd(p, pr, b):
            return forward_train(p, m, b, pr, proto_alpha=tcfg.proto_alpha,
                                 proto_beta=tcfg.proto_beta,
                                 use_prototype=True, deterministic=True,
                                 rng=None, dtype=jnp.bfloat16).loss

        ms = timeit(lambda: out.__setitem__(0, fwd(params, proto, batch)),
                    lambda: float(out[0]))
        print(f"fwd_det  fused={fused}: {ms:8.2f} ms", flush=True)

        @jax.jit
        def fbw(p, pr, b, r):
            l, g = jax.value_and_grad(
                lambda q: forward_train(q, m, b, pr,
                                        proto_alpha=tcfg.proto_alpha,
                                        proto_beta=tcfg.proto_beta,
                                        use_prototype=True,
                                        deterministic=False, rng=r,
                                        dtype=jnp.bfloat16).loss)(p)
            # keep the whole backward alive (global norm reads every leaf)
            import optax
            return l + 0.0 * optax.global_norm(g)

        ms = timeit(lambda: out.__setitem__(0, fbw(params, proto, batch, rng)),
                    lambda: float(out[0]))
        print(f"fwd_bwd  fused={fused}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
