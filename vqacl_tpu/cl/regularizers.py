"""Parameter-importance CL regularizers: EWC and MAS.

The paper's Table 1 (BASELINE.md) compares VQACL against EWC
(Kirkpatrick et al., 2017) and MAS (Aljundi et al., 2018), but the
reference repo implements neither — it only ships the replay+prototype
method. This module supplies both as first-class framework options so
a user can reproduce the comparison rows:

- **EWC**: importance = diagonal empirical Fisher, the squared gradient
  of the task NLL at the task's end, accumulated online across tasks
  with the latest parameters as anchor ("online EWC"); penalty
  ``λ/2 Σ_i F_i (θ_i − θ*_i)²``.
- **MAS**: importance = ``E |∂/∂θ ‖f(x;θ)‖₂²|`` — the gradient magnitude
  of the squared L2 norm of the model's output logits (label-free),
  same online accumulation and penalty form.

TPU-native design: the importance pass is ONE jitted program per task
(grad + accumulate, donated accumulator, runs over the device mesh with
the same batch sharding as training), and the penalty is differentiated
inside the compiled train step — no host round-trips on the hot path.
``RegState`` pytrees inherit the parameter sharding (replicated / tp /
FSDP), so omega/anchor shard exactly like the params they anchor.

Reference context: the SI "memory loss" the reference declares but never
trains (modeling_t5_nextqa.py:544, SURVEY §2.5) lives in
models/prototype.py::memory_loss; these are the OTHER regularizer
family from the paper's comparison table.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from vqacl_tpu.models import vlt5

KINDS = ("ewc", "mas")


class RegState(NamedTuple):
    """Importance weights + anchor params (both params-shaped pytrees).

    ``omega`` starts at zeros, so the penalty is exactly 0 until the
    first consolidation — task 0 trains unregularized, as in both
    papers.
    """

    omega: Any
    anchor: Any


def _anchor_copy(params):
    """fp32 COPY of the params (sharding-preserving). ``astype`` alone
    is a no-op alias for fp32 params, and an anchor aliasing
    ``state.params`` collides with the train step's donated buffers
    (`f(donate(a), a)`)."""
    return jax.tree.map(lambda p: jnp.copy(p.astype(jnp.float32)), params)


def init_reg_state(params) -> RegState:
    """Zero importance, current params as (inert) anchor. Built with
    ``zeros_like``/copies of the placed params so omega/anchor inherit
    their NamedSharding."""
    f32 = _anchor_copy(params)
    return RegState(omega=jax.tree.map(jnp.zeros_like, f32), anchor=f32)


def penalty(params, reg: RegState) -> jnp.ndarray:
    """``Σ_i ω_i (θ_i − θ*_i)²`` (the λ/2 scaling lives in the caller).
    Differentiated inside the train step."""
    terms = jax.tree.map(
        lambda p, w, a: jnp.sum(w * (p.astype(jnp.float32) - a) ** 2),
        params, reg.omega, reg.anchor)
    return jax.tree.reduce(jnp.add, terms, jnp.float32(0.0))


def make_importance_step(cfg, kind: str, dtype=jnp.float32):
    """Returns jitted ``(acc, params, proto, batch) -> acc`` adding one
    batch's importance estimate into the (donated) accumulator.

    The forward is the retrieval-only eval graph (prototype bank is NOT
    updated — importance estimation must not mutate training state).
    EWC differentiates the task's weighted NLL (empirical Fisher); MAS
    differentiates the squared L2 norm of the valid-token logits.
    """
    if kind not in KINDS:
        raise ValueError(f"unknown regularizer {kind!r}; pick from {KINDS}")
    mcfg = cfg.model
    use_prototype = mcfg.use_prototype

    def out_fn(params, proto, batch):
        hidden, enc_mask = vlt5.encode(
            params, mcfg, batch["input_ids"], batch["vis_feats"],
            batch["boxes"], deterministic=True, dtype=dtype)
        if use_prototype:
            hidden, enc_mask, _, _ = vlt5.augment(
                params, mcfg, hidden, enc_mask, proto,
                proto_update_flag=False)
        logits = vlt5.decode_train(params, mcfg, hidden, enc_mask,
                                   batch["target_ids"], deterministic=True,
                                   dtype=dtype)
        if kind == "ewc":
            return vlt5.weighted_lm_loss(logits, batch["target_ids"],
                                         batch["scores"])
        mask = (batch["target_ids"] != -100).astype(jnp.float32)
        sq = jnp.sum(logits.astype(jnp.float32) ** 2, axis=-1)   # [B,T]
        return jnp.sum(sq * mask) / jnp.maximum(mask.sum(), 1.0)

    tfm = (lambda g: g * g) if kind == "ewc" else jnp.abs

    def step(acc, params, proto, batch):
        g = jax.grad(out_fn)(params, proto, batch)
        return jax.tree.map(
            lambda a, gi: a + tfm(gi.astype(jnp.float32)), acc, g)

    return jax.jit(step, donate_argnums=(0,))


def consolidate(reg: RegState, params, acc, n_batches: int) -> RegState:
    """End-of-task update: ``ω += mean_batch(importance)``, anchor = the
    just-trained params (online EWC/MAS accumulation — one ω/θ* pair
    covers all past tasks, constant memory in the task count)."""
    inv = jnp.float32(1.0 / max(int(n_batches), 1))
    omega = jax.tree.map(lambda w, a: w + a * inv, reg.omega, acc)
    return RegState(omega=omega, anchor=_anchor_copy(params))
