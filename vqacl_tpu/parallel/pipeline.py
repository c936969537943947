"""GPipe-style pipeline parallelism for the T5 stacks.

The reference has no pipeline parallelism at all (single-process DDP,
``VL-T5/src/vqacl.py:127``); this module adds the TPU-native version:
transformer layers are stacked on a leading axis and sharded over a
``pp`` mesh axis (each device holds ``num_layers/pp`` consecutive
blocks), microbatches flow stage-to-stage over ICI via
``jax.lax.ppermute`` inside a ``lax.scan`` schedule, and the whole
pipeline lives inside ``shard_map`` — so it jits into ONE XLA program,
composes with the ``dp`` batch axis, and differentiates end-to-end
(``ppermute``/``scan`` both have transposes, so ``jax.grad`` of a
pipelined loss just works; gradients for stage parameters land on the
stage that owns them and flow back through the activation hand-offs).

Schedule: plain GPipe fill-drain — ``M + pp - 1`` ticks for ``M``
microbatches. Every device runs the same program every tick (SPMD);
ticks where a stage holds no real microbatch compute on zeros and the
result is discarded (outputs are collected only from the last stage on
valid ticks), which keeps control flow compiler-friendly at the cost of
the standard pipeline bubble ``(pp-1)/(M+pp-1)``.

This is a scale-out layout for models that don't fit a chip; t5-base
fits easily, so the default layouts (dp / tp / fsdp) stay preferred —
``pp`` exists so the same train step scales when the stacks don't fit,
and is validated for parity in ``tests/test_pipeline.py`` and the
multichip dryrun.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Params = Dict[str, Any]


def stack_blocks(stack_params: Params, n_layers: int) -> Params:
    """[p["block_0"], ..., p["block_{n-1}"]] → one pytree with a leading
    layer axis (shardable over ``pp``). All blocks share a structure.

    Called inside the jitted step, so the stack is re-materialized per
    step; under GSPMD each pp stage only writes its own layer slice, but
    a production pp deployment that is HBM-traffic-sensitive should keep
    params in this stacked layout end-to-end (optimizer + checkpoints)
    rather than per-block dicts — kept per-block here so every other
    layout (dp/tp/fsdp, the repo defaults) shares one parameter tree."""
    blocks = [stack_params[f"block_{i}"] for i in range(n_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def _batch_spec(mesh: Mesh, dp_axis: str) -> P:
    """Activation spec [M, B, ...]: microbatch axis replicated, batch
    axis dp-sharded when the mesh has one."""
    if dp_axis in mesh.axis_names:
        return P(None, dp_axis)
    return P()


def stacked_block_specs(stacked: Params, pp_axis: str,
                        tp_axis: Optional[str] = None) -> Any:
    """PartitionSpecs for a ``stack_blocks`` pytree: every leaf shards
    its leading layer axis over ``pp``; with ``tp_axis``, attention and
    MLP weights additionally get the Megatron layout (q/k/v and wi
    output-dim-sharded, the two wo input-dim-sharded) so each pipeline
    stage runs ``tp``-way tensor parallel (t5.encoder_block_tp)."""
    def spec(path, leaf) -> P:
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if tp_axis is None or leaf.ndim < 3:
            return P(pp_axis)
        parent, name = names[-2] if len(names) > 1 else "", names[-1]
        if parent in ("attn", "cross_attn") and name in ("wq", "wk", "wv"):
            return P(pp_axis, None, tp_axis)
        if parent in ("attn", "cross_attn") and name == "wo":
            return P(pp_axis, tp_axis, None)
        if parent == "mlp" and name == "wi":
            return P(pp_axis, None, tp_axis)
        if parent == "mlp" and name == "wo":
            return P(pp_axis, tp_axis, None)
        return P(pp_axis)
    return jax.tree_util.tree_map_with_path(spec, stacked)


def gpipe(mesh: Mesh,
          stage_fn: Callable,
          stacked_params: Params,
          acts_mb: Any,
          aux: Tuple = (),
          pp_axis: str = "pp",
          dp_axis: str = "dp",
          param_specs: Any = None) -> Any:
    """Run ``acts_mb`` (pytree, leaves [M, mb, ...]) through ``pp``
    pipeline stages of ``stage_fn(stage_params, act, mb_idx, stage_idx,
    *aux) -> act``.

    ``stacked_params`` leaves have a leading layer axis divisible by
    ``pp`` (each stage receives its contiguous ``n_layers/pp`` slice);
    ``aux`` entries are replicated (position bias, rng key). Returns the
    same pytree structure as ``acts_mb`` — whatever the activation
    carries (e.g. encoder states for cross-attention) rides along
    through every ppermute hand-off.
    """
    pp = mesh.shape[pp_axis]
    M = jax.tree.leaves(acts_mb)[0].shape[0]
    bspec = _batch_spec(mesh, dp_axis)

    def local_fn(sp, acts_mb, *aux):
        s = jax.lax.axis_index(pp_axis)
        zero_act = jax.tree.map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), acts_mb)
        outbuf0 = jax.tree.map(jnp.zeros_like, acts_mb)

        def tick(carry, t):
            act, outbuf = carry
            # stage 0 ingests microbatch t (clamped during drain ticks —
            # those outputs never reach the collection window)
            in_idx = jnp.minimum(t, M - 1)
            fresh = jax.tree.map(lambda a: a[in_idx], acts_mb)
            act = jax.tree.map(
                lambda f, a: jnp.where(s == 0, f, a), fresh, act)
            # the microbatch currently at stage s entered at tick t-s
            mb_idx = jnp.clip(t - s, 0, M - 1)
            y = stage_fn(sp, act, mb_idx, s, *aux)
            # collect finished microbatch t-(pp-1) from the last stage
            out_idx = jnp.clip(t - (pp - 1), 0, M - 1)
            write = jnp.logical_and(s == pp - 1, t >= pp - 1)
            outbuf = jax.tree.map(
                lambda buf, yy: jnp.where(
                    write,
                    jax.lax.dynamic_update_index_in_dim(
                        buf, yy.astype(buf.dtype), out_idx, 0),
                    buf),
                outbuf, y)
            if pp > 1:
                perm = [(i, i + 1) for i in range(pp - 1)]
                act = jax.tree.map(
                    lambda yy: jax.lax.ppermute(yy, pp_axis, perm), y)
            else:
                act = y
            return (act, outbuf), None

        (_, outbuf), _ = jax.lax.scan(
            tick, (zero_act, outbuf0), jnp.arange(M + pp - 1))
        # broadcast the last stage's buffer to every stage (the caller's
        # downstream code is replicated over pp)
        return jax.tree.map(
            lambda b: jax.lax.psum(
                jnp.where(s == pp - 1, b, jnp.zeros_like(b)), pp_axis),
            outbuf)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(param_specs if param_specs is not None else P(pp_axis),
                  bspec) + (P(),) * len(aux),
        out_specs=bspec, check_vma=False,
    )(stacked_params, acts_mb, *aux)


def encoder_stack_pp(p: Params, cfg, inputs_embeds: jnp.ndarray,
                     position_bias: jnp.ndarray,
                     mask_add: jnp.ndarray,
                     mesh: Mesh, n_micro: int,
                     deterministic: bool = True, rng=None,
                     pp_axis: str = "pp", dp_axis: str = "dp",
                     tp_axis: str = "tp") -> jnp.ndarray:
    """``t5.encoder_stack`` (unfused path) pipelined over ``pp``.

    Semantics match the sequential stack exactly in deterministic mode;
    with dropout the per-layer streams are folded as (layer, microbatch)
    so they differ from (but are as independent as) the dp path's.
    When the mesh carries a ``tp`` axis of size > 1, each stage runs
    Megatron tensor parallel over it (``t5.encoder_block_tp``: q/k/v/wi
    output-sharded, wo input-sharded, psum before each residual) — full
    dp×tp×pp composition in one shard_map program.
    """
    from vqacl_tpu.models import t5 as t5m

    n = cfg.num_layers
    pp = mesh.shape[pp_axis]
    tp = dict(mesh.shape).get(tp_axis, 1)
    assert n % pp == 0, (n, pp)
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    k = n // pp
    nh_loc = cfg.num_heads // tp
    B, S, D = inputs_embeds.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    r_in = r_layers = r_out = None
    if rng is not None:
        r_in, r_layers, r_out = jax.random.split(rng, 3)
    x = t5m.dropout(r_in, inputs_embeds, cfg.dropout_rate, deterministic)

    stacked = stack_blocks(p, n)
    acts = {
        "x": x.reshape(n_micro, mb, S, D),
        "mask": mask_add.reshape(n_micro, mb, *mask_add.shape[1:]),
    }
    aux = (position_bias,) if r_layers is None else (position_bias, r_layers)

    def stage(sp, act, mb_idx, s, pos_bias, *maybe_rng):
        if tp > 1:   # local head panel of the [1,H,S,S] bias
            t_idx = jax.lax.axis_index(tp_axis)
            pos_bias = jax.lax.dynamic_slice_in_dim(
                pos_bias, t_idx * nh_loc, nh_loc, axis=1)

        def body(x, xs):
            lp, li = xs
            r = None
            if maybe_rng:
                r = jax.random.fold_in(
                    jax.random.fold_in(maybe_rng[0], li), mb_idx)
            if tp > 1:
                return t5m.encoder_block_tp(lp, cfg, x, pos_bias, tp_axis,
                                            deterministic, r,
                                            act["mask"]), None
            return t5m.encoder_block(lp, cfg, x, pos_bias, deterministic,
                                     r, act["mask"]), None
        x2, _ = jax.lax.scan(body, act["x"], (sp, s * k + jnp.arange(k)))
        return {"x": x2, "mask": act["mask"]}

    specs = stacked_block_specs(stacked, pp_axis,
                                tp_axis if tp > 1 else None)
    out = gpipe(mesh, stage, stacked, acts, aux, pp_axis, dp_axis,
                param_specs=specs)
    x = out["x"].reshape(B, S, D)
    x = t5m.layer_norm(p["final_ln"], x, cfg.layer_norm_epsilon)
    return t5m.dropout(r_out, x, cfg.dropout_rate, deterministic)


def decoder_stack_pp(p: Params, cfg, inputs_embeds: jnp.ndarray,
                     enc_states: jnp.ndarray, enc_mask: jnp.ndarray,
                     mesh: Mesh, n_micro: int,
                     deterministic: bool = True, rng=None,
                     pp_axis: str = "pp", dp_axis: str = "dp",
                     tp_axis: str = "tp") -> jnp.ndarray:
    """``t5.decoder_stack`` pipelined over ``pp`` (train path semantics:
    no decoder padding mask). The encoder states and cross-attention
    bias ride along with each microbatch through the stage hand-offs.
    A ``tp`` mesh axis > 1 runs each stage Megatron tensor parallel
    (``t5.decoder_block_tp``), like the encoder."""
    from vqacl_tpu.models import t5 as t5m

    n = cfg.num_decoder_layers
    pp = mesh.shape[pp_axis]
    tp = dict(mesh.shape).get(tp_axis, 1)
    assert n % pp == 0, (n, pp)
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    nh_loc = cfg.num_heads // tp
    k = n // pp
    B, T, D = inputs_embeds.shape
    S = enc_states.shape[1]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    pb = t5m.compute_position_bias(
        p["rel_bias"], T, T, bidirectional=False,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance)
    self_bias = t5m.attention_scores_bias(t5m.causal_mask(T), pb)  # [1,H,T,T]
    cross_bias = t5m.attention_scores_bias(
        enc_mask[:, None, None, :], None)                          # [B,1,1,S]

    r_in = r_layers = r_out = None
    if rng is not None:
        r_in, r_layers, r_out = jax.random.split(rng, 3)
    x = t5m.dropout(r_in, inputs_embeds, cfg.dropout_rate, deterministic)

    stacked = stack_blocks(p, n)
    acts = {
        "x": x.reshape(n_micro, mb, T, D),
        "enc": enc_states.reshape(n_micro, mb, S, D),
        "cb": cross_bias.reshape(n_micro, mb, 1, 1, S),
    }
    aux = (self_bias,) if r_layers is None else (self_bias, r_layers)

    def stage(sp, act, mb_idx, s, self_bias, *maybe_rng):
        if tp > 1:
            t_idx = jax.lax.axis_index(tp_axis)
            self_bias = jax.lax.dynamic_slice_in_dim(
                self_bias, t_idx * nh_loc, nh_loc, axis=1)

        def body(x, xs):
            lp, li = xs
            r = None
            if maybe_rng:
                r = jax.random.fold_in(
                    jax.random.fold_in(maybe_rng[0], li), mb_idx)
            if tp > 1:
                return t5m.decoder_block_tp(lp, cfg, x, self_bias,
                                            act["enc"], act["cb"], tp_axis,
                                            deterministic, r), None
            return t5m.decoder_block(lp, cfg, x, self_bias, act["enc"],
                                     act["cb"], deterministic, r), None
        x2, _ = jax.lax.scan(body, act["x"], (sp, s * k + jnp.arange(k)))
        return {"x": x2, "enc": act["enc"], "cb": act["cb"]}

    specs = stacked_block_specs(stacked, pp_axis,
                                tp_axis if tp > 1 else None)
    out = gpipe(mesh, stage, stacked, acts, aux, pp_axis, dp_axis,
                param_specs=specs)
    x = out["x"].reshape(B, T, D)
    x = t5m.layer_norm(p["final_ln"], x, cfg.layer_norm_epsilon)
    return t5m.dropout(r_out, x, cfg.dropout_rate, deterministic)
