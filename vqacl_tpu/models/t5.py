"""Pure-functional T5 encoder-decoder for TPU.

A from-scratch JAX implementation of the T5 architecture used by VL-T5
(HF ``transformers`` T5Stack/T5Block consumed at
``/root/reference/VL-T5/src/modeling_t5_our.py:145-341``), designed for
XLA/TPU rather than translated from torch:

- parameters are a plain nested dict (pytree) → trivially sharded with
  NamedSharding and checkpointed with orbax;
- all shapes static; attention is two einsums onto the MXU with
  ``preferred_element_type=float32`` accumulation; softmax in f32;
- dropout is explicit (rng in, deterministic flag), no module state;
- the encoder takes *precomputed input embeddings and position bias* so
  the VL joint encoder (text‖visual concat, text-only relative bias,
  ``modeling_t5_our.py:214,258-273``) is a thin wrapper, not a fork.

T5 specifics honored: RMS layer norm without mean subtraction or bias,
un-scaled dot-product attention (scale folded into init), relative
position bias added in every layer but computed from the first layer's
table, ReLU feed-forward (t5-base v1.0), tied embeddings with the
``d_model**-0.5`` output rescale (``modeling_t5_our.py:663-666``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

NEG_INF = -1e9  # additive mask value; applied in f32 before softmax


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _normal(rng, shape, std):
    return std * jax.random.normal(rng, shape, dtype=jnp.float32)


def init_attention(rng, d_model: int, num_heads: int, d_kv: int) -> Params:
    """T5 attention init (factor 1.0): q ~ N(0,(d_model*d_kv)^-0.5),
    k,v ~ N(0,d_model^-0.5), o ~ N(0,(heads*d_kv)^-0.5)."""
    inner = num_heads * d_kv
    kq, kk, kv, ko = jax.random.split(rng, 4)
    return {
        "wq": _normal(kq, (d_model, inner), (d_model * d_kv) ** -0.5),
        "wk": _normal(kk, (d_model, inner), d_model ** -0.5),
        "wv": _normal(kv, (d_model, inner), d_model ** -0.5),
        "wo": _normal(ko, (inner, d_model), inner ** -0.5),
    }


def init_mlp(rng, d_model: int, d_ff: int) -> Params:
    ki, ko = jax.random.split(rng)
    return {
        "wi": _normal(ki, (d_model, d_ff), d_model ** -0.5),
        "wo": _normal(ko, (d_ff, d_model), d_ff ** -0.5),
    }


def init_block(rng, cfg, is_decoder: bool) -> Params:
    keys = jax.random.split(rng, 3)
    p: Params = {
        "attn": init_attention(keys[0], cfg.d_model, cfg.num_heads, cfg.d_kv),
        "ln1": jnp.ones((cfg.d_model,), jnp.float32),
        "mlp": init_mlp(keys[1], cfg.d_model, cfg.d_ff),
        "ln2": jnp.ones((cfg.d_model,), jnp.float32),
    }
    if is_decoder:
        p["cross_attn"] = init_attention(keys[2], cfg.d_model, cfg.num_heads, cfg.d_kv)
        p["ln3"] = jnp.ones((cfg.d_model,), jnp.float32)
    return p


def init_stack(rng, cfg, is_decoder: bool) -> Params:
    n = cfg.num_decoder_layers if is_decoder else cfg.num_layers
    keys = jax.random.split(rng, n + 1)
    p: Params = {f"block_{i}": init_block(keys[i], cfg, is_decoder) for i in range(n)}
    p["final_ln"] = jnp.ones((cfg.d_model,), jnp.float32)
    p["rel_bias"] = _normal(keys[n],
                            (cfg.relative_attention_num_buckets, cfg.num_heads),
                            cfg.d_model ** -0.5)
    return p


def init_t5_params(rng, cfg) -> Params:
    ke, kd, ks = jax.random.split(rng, 3)
    return {
        "shared": _normal(ks, (cfg.vocab_size, cfg.d_model), 1.0),
        "encoder": init_stack(ke, cfg, is_decoder=False),
        "decoder": init_stack(kd, cfg, is_decoder=True),
    }


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def layer_norm(w: jnp.ndarray, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5 RMS norm: no mean subtraction, no bias; variance in f32."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32)).astype(dt)


def dropout(rng, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    # (a raw-bits uint32-threshold variant was measured +1.2 ms/step
    # vs bernoulli on the rbg PRNG — XLA fuses bernoulli's bit→float
    # compare better than the integer where; keep bernoulli)
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def relative_position_bucket(relative_position: jnp.ndarray,
                             bidirectional: bool,
                             num_buckets: int,
                             max_distance: int) -> jnp.ndarray:
    """Bucketed relative positions, matching HF T5 semantics."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(rel_bias_table: jnp.ndarray,
                          q_len: int, k_len: int,
                          bidirectional: bool,
                          num_buckets: int, max_distance: int,
                          q_offset: int = 0) -> jnp.ndarray:
    """[1, heads, q_len, k_len] relative attention bias.

    ``q_offset`` supports incremental decoding (query at absolute
    position ``q_offset..q_offset+q_len``).
    """
    ctx = jnp.arange(q_len)[:, None] + q_offset
    mem = jnp.arange(k_len)[None, :]
    rp = mem - ctx  # [q, k]
    buckets = relative_position_bucket(rp, bidirectional, num_buckets, max_distance)
    values = jnp.asarray(rel_bias_table)[buckets]  # [q, k, heads]
    return jnp.transpose(values, (2, 0, 1))[None]  # [1, h, q, k]


def attention_scores_bias(mask: Optional[jnp.ndarray],
                          position_bias: Optional[jnp.ndarray],
                          dtype=jnp.float32) -> Optional[jnp.ndarray]:
    """Combine padding/causal mask (1=attend) with position bias into a
    single additive f32 term (HF adds extended mask into bias,
    ``modeling_t5_our.py:273``)."""
    bias = None
    if position_bias is not None:
        bias = position_bias.astype(dtype)
    if mask is not None:
        add = (1.0 - mask.astype(dtype)) * NEG_INF
        bias = add if bias is None else bias + add
    return bias


def qkv_proj_merged(p: Params, h: jnp.ndarray, num_heads: int, d_kv: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Self-attention q/k/v as ONE [D, 3·H·dk] GEMM.

    Three separate [M,768]×[768,768] projections run geometry-bound at
    35-45 % MXU on v5e (BENCH_NOTES); concatenating the weights (an
    in-program copy XLA CSEs across fwd+bwd) triples N and merges the
    three dW GEMMs in the backward. Output slices are lane-aligned
    (H·dk = 768 = 6×128), so the splits are free. Param layout is
    untouched — checkpoints, hf_import, and sharding rules see the same
    wq/wk/wv leaves."""
    B, L, D = h.shape
    dt = h.dtype
    inner = num_heads * d_kv
    w = jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=1).astype(dt)
    qkv = h @ w
    return (qkv[..., :inner].reshape(B, L, num_heads, d_kv),
            qkv[..., inner:2 * inner].reshape(B, L, num_heads, d_kv),
            qkv[..., 2 * inner:].reshape(B, L, num_heads, d_kv))


def kv_proj_merged(p: Params, x: jnp.ndarray, num_heads: int, d_kv: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention k/v as one [D, 2·H·dk] GEMM (same rationale)."""
    B, L, D = x.shape
    dt = x.dtype
    inner = num_heads * d_kv
    w = jnp.concatenate([p["wk"], p["wv"]], axis=1).astype(dt)
    kv = x @ w
    return (kv[..., :inner].reshape(B, L, num_heads, d_kv),
            kv[..., inner:].reshape(B, L, num_heads, d_kv))


def cross_kv_fold_all(p: Params, n_layers: int, x: jnp.ndarray,
                      num_heads: int, d_kv: int
                      ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """ALL decoder layers' cross-attention K/V projections as ONE GEMM.

    Every layer's cross attention projects the SAME encoder states
    (modeling_t5_our.py:641-655 — ``encoder_hidden_states`` is layer-
    invariant), so the 2·n_layers [D,H·dk] projections concatenate into
    a single [D, n·2·H·dk] weight: one GEMM with 24× the N dimension
    instead of 24 geometry-bound N=768 GEMMs (and ONE dW / ONE dX GEMM
    in the backward instead of 24/12). Param layout untouched — the
    concat is an in-program copy XLA CSEs across fwd+bwd.

    Measured at the reference geometry (t5-base, bs 80, S=58): a TRAIN
    regression — 56.3 vs 46.2 ms/step (BENCH_NOTES round 3). The folded
    [B, S, n·2·H·dk] activation (and its cotangent in the backward)
    adds more HBM traffic than the small-GEMM overhead it removes.
    Kept as an opt-in (``folded_cross_kv``) for geometries where the
    decoder is deep relative to batch·S; default off.

    ``p`` is the decoder stack params (holds ``block_i``). Returns the
    per-layer (k, v) views, each [B, S, H, dk]."""
    B, S, D = x.shape
    dt = x.dtype
    inner = num_heads * d_kv
    w = jnp.concatenate(
        [jnp.concatenate([p[f"block_{i}"]["cross_attn"]["wk"],
                          p[f"block_{i}"]["cross_attn"]["wv"]], axis=1)
         for i in range(n_layers)], axis=1).astype(dt)
    kv = x @ w                                     # [B, S, n*2*inner]
    out = []
    for i in range(n_layers):
        o = i * 2 * inner
        out.append((kv[..., o:o + inner].reshape(B, S, num_heads, d_kv),
                    kv[..., o + inner:o + 2 * inner].reshape(
                        B, S, num_heads, d_kv)))
    return out


def multihead_attention(p: Params,
                        q_in: jnp.ndarray,
                        k_in: jnp.ndarray,
                        v_in: jnp.ndarray,
                        bias: Optional[jnp.ndarray],
                        num_heads: int,
                        d_kv: int,
                        dropout_rate: float = 0.0,
                        deterministic: bool = True,
                        rng=None,
                        kv_proj: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                        mask_add: Optional[jnp.ndarray] = None,
                        merged: bool = False,
                        ) -> jnp.ndarray:
    """Unscaled T5 attention. q_in [B,Lq,D]; k_in/v_in [B,Lk,D].

    ``kv_proj`` lets the caller pass already-projected K/V (cross-attention
    cache during generation).
    ``mask_add`` is an optional second additive
    term (the padding mask, [B,1,1,Lk]) kept SEPARATE from ``bias`` so the
    combined [B,H,Lq,Lk] f32 tensor is never materialized in HBM — both
    broadcasts fuse into the softmax (at bs80/S=58 the combined tensor is
    129 MB read per layer, ~3 GB/step fwd+bwd).
    ``merged=True`` runs the q/k/v (self) or k/v (cross) projections as
    one merged GEMM (``qkv_proj_merged``).
    """
    B, Lq, D = q_in.shape
    dt = q_in.dtype
    if merged and kv_proj is None and q_in is k_in:
        q, k, v = qkv_proj_merged(p, q_in, num_heads, d_kv)
        Lk = k.shape[1]
    else:
        q = (q_in @ p["wq"].astype(dt)).reshape(B, Lq, num_heads, d_kv)
        if kv_proj is None:
            Lk = k_in.shape[1]
            if merged and k_in is v_in:
                k, v = kv_proj_merged(p, k_in, num_heads, d_kv)
            else:
                k = (k_in @ p["wk"].astype(dt)).reshape(B, Lk, num_heads, d_kv)
                v = (v_in @ p["wv"].astype(dt)).reshape(B, Lk, num_heads, d_kv)
        else:
            k, v = kv_proj
            Lk = k.shape[1]
    # scores in f32 on the MXU
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    if mask_add is not None:
        scores = scores + mask_add
    w = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        w = dropout(rng, w, dropout_rate, deterministic=False)
    w = w.astype(dt)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                     preferred_element_type=jnp.float32).astype(dt)
    return out.reshape(B, Lq, num_heads * d_kv) @ p["wo"].astype(dt)


def mlp_apply(p: Params, x: jnp.ndarray, activation: str,
              dropout_rate: float = 0.0, deterministic: bool = True,
              rng=None) -> jnp.ndarray:
    dt = x.dtype
    h = x @ p["wi"].astype(dt)
    if activation == "relu":
        h = jax.nn.relu(h)
    elif activation in ("gelu", "gated-gelu"):
        h = jax.nn.gelu(h, approximate=False)
    else:
        raise ValueError(activation)
    if not deterministic and dropout_rate > 0.0:
        h = dropout(rng, h, dropout_rate, deterministic=False)
    return h @ p["wo"].astype(dt)


# ---------------------------------------------------------------------------
# blocks & stacks
# ---------------------------------------------------------------------------

def _split_rngs(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def _maybe_checkpoint(fn, static_argnums, remat):
    """remat: False = store everything; True/"full" = recompute the block
    in bwd; "dots" = save matmul outputs only, recompute the elementwise
    chains (LN/softmax/dropout/residual) — trades cheap VPU recompute for
    HBM activation traffic."""
    if not remat:
        return fn
    policy = None
    if remat == "dots":
        policy = jax.checkpoint_policies.dots_saveable
    return jax.checkpoint(fn, static_argnums=static_argnums, policy=policy)


def encoder_block(p: Params, cfg, x: jnp.ndarray, bias: Optional[jnp.ndarray],
                  deterministic: bool = True, rng=None,
                  mask_add: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    r = _split_rngs(rng, 4)
    h = layer_norm(p["ln1"], x, cfg.layer_norm_epsilon)
    a = multihead_attention(p["attn"], h, h, h, bias, cfg.num_heads, cfg.d_kv,
                            cfg.dropout_rate, deterministic, r[0],
                            mask_add=mask_add,
                            merged=getattr(cfg, "merged_qkv", False) is True)
    x = x + dropout(r[1], a, cfg.dropout_rate, deterministic)
    h = layer_norm(p["ln2"], x, cfg.layer_norm_epsilon)
    m = mlp_apply(p["mlp"], h, cfg.feed_forward_proj, cfg.dropout_rate,
                  deterministic, r[2])
    return x + dropout(r[3], m, cfg.dropout_rate, deterministic)


def encoder_block_fused(p: Params, cfg, x: jnp.ndarray,
                        pos_bias: jnp.ndarray, mask: jnp.ndarray,
                        seed: jnp.ndarray, interpret: bool = False,
                        deterministic: bool = True, rng=None) -> jnp.ndarray:
    """encoder_block with the Pallas fused-attention core (scores +
    softmax + dropout + weighted sum in VMEM). pos_bias [H,S,S] f32,
    mask [B,S]."""
    from vqacl_tpu.ops.fused_attention import fused_encoder_attention

    r = _split_rngs(rng, 3)
    h = layer_norm(p["ln1"], x, cfg.layer_norm_epsilon)
    dt = h.dtype
    B, S, D = h.shape
    if getattr(cfg, "merged_qkv", False) is True:
        q, k, v = qkv_proj_merged(p["attn"], h, cfg.num_heads, cfg.d_kv)
    else:
        q = (h @ p["attn"]["wq"].astype(dt)).reshape(B, S, cfg.num_heads,
                                                     cfg.d_kv)
        k = (h @ p["attn"]["wk"].astype(dt)).reshape(B, S, cfg.num_heads,
                                                     cfg.d_kv)
        v = (h @ p["attn"]["wv"].astype(dt)).reshape(B, S, cfg.num_heads,
                                                     cfg.d_kv)
    rate = 0.0 if deterministic else cfg.dropout_rate
    a = fused_encoder_attention(q, k, v, pos_bias, mask,
                                interpret=interpret, dropout_rate=rate,
                                seed=seed,
                                mesh=getattr(cfg, "fused_mesh", None))
    a = a @ p["attn"]["wo"].astype(dt)
    x = x + dropout(r[0], a, cfg.dropout_rate, deterministic)
    h = layer_norm(p["ln2"], x, cfg.layer_norm_epsilon)
    m = mlp_apply(p["mlp"], h, cfg.feed_forward_proj, cfg.dropout_rate,
                  deterministic, r[1])
    return x + dropout(r[2], m, cfg.dropout_rate, deterministic)


def encoder_block_tp(p: Params, cfg, x: jnp.ndarray,
                     bias_local: Optional[jnp.ndarray], tp_axis: str,
                     deterministic: bool = True, rng=None,
                     mask_add: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``encoder_block`` with Megatron tensor parallelism for use INSIDE
    ``shard_map`` (parallel/pipeline.py tp×pp composition): ``p`` leaves
    are this shard's slices (wq/wk/wv/wi output-dim-sharded, wo
    input-dim-sharded over ``tp_axis``), ``bias_local`` carries only the
    local heads, and the attention/MLP outputs are psum'd before each
    residual add — so ``x`` stays replicated across the tp group.
    Dropout keys are shared across the group: the post-psum (residual)
    masks MUST agree; the pre-psum masks (attention weights, MLP hidden)
    then repeat the same pattern per shard — statistically equivalent to
    per-tensor dropout up to that correlation (deterministic mode is
    bit-meaningful, and is what the parity tests pin)."""
    r = _split_rngs(rng, 4)
    nh_loc = p["attn"]["wq"].shape[1] // cfg.d_kv
    h = layer_norm(p["ln1"], x, cfg.layer_norm_epsilon)
    a = multihead_attention(p["attn"], h, h, h, bias_local, nh_loc,
                            cfg.d_kv, cfg.dropout_rate, deterministic,
                            r[0], mask_add=mask_add)
    a = jax.lax.psum(a, tp_axis)
    x = x + dropout(r[1], a, cfg.dropout_rate, deterministic)
    h = layer_norm(p["ln2"], x, cfg.layer_norm_epsilon)
    m = mlp_apply(p["mlp"], h, cfg.feed_forward_proj, cfg.dropout_rate,
                  deterministic, r[2])
    m = jax.lax.psum(m, tp_axis)
    return x + dropout(r[3], m, cfg.dropout_rate, deterministic)


def decoder_block_tp(p: Params, cfg, x: jnp.ndarray,
                     self_bias_local: Optional[jnp.ndarray],
                     enc_states: jnp.ndarray,
                     cross_bias: Optional[jnp.ndarray], tp_axis: str,
                     deterministic: bool = True, rng=None) -> jnp.ndarray:
    """``decoder_block`` under Megatron tp (see ``encoder_block_tp``);
    ``cross_bias`` broadcasts over heads ([B,1,1,S]) so only the self
    bias needs the local-head slice."""
    r = _split_rngs(rng, 6)
    nh_loc = p["attn"]["wq"].shape[1] // cfg.d_kv
    h = layer_norm(p["ln1"], x, cfg.layer_norm_epsilon)
    a = multihead_attention(p["attn"], h, h, h, self_bias_local, nh_loc,
                            cfg.d_kv, cfg.dropout_rate, deterministic, r[0])
    x = x + dropout(r[1], jax.lax.psum(a, tp_axis),
                    cfg.dropout_rate, deterministic)
    h = layer_norm(p["ln2"], x, cfg.layer_norm_epsilon)
    c = multihead_attention(p["cross_attn"], h, enc_states, enc_states,
                            cross_bias, nh_loc, cfg.d_kv,
                            cfg.dropout_rate, deterministic, r[2])
    x = x + dropout(r[3], jax.lax.psum(c, tp_axis),
                    cfg.dropout_rate, deterministic)
    h = layer_norm(p["ln3"], x, cfg.layer_norm_epsilon)
    m = mlp_apply(p["mlp"], h, cfg.feed_forward_proj, cfg.dropout_rate,
                  deterministic, r[4])
    return x + dropout(r[5], jax.lax.psum(m, tp_axis),
                       cfg.dropout_rate, deterministic)


def encoder_stack(p: Params, cfg, inputs_embeds: jnp.ndarray,
                  position_bias: jnp.ndarray,
                  deterministic: bool = True, rng=None,
                  remat: bool = False,
                  fused: Optional[Dict[str, Any]] = None,
                  mask_add: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Encoder over precomputed embeddings.

    Unfused: ``position_bias`` is the additive bias [1, heads, L, L];
    the padding mask may either be folded into it (parity tests) or
    passed separately as ``mask_add`` [B,1,1,L] so no [B,H,L,L] tensor
    is ever materialized (production path). Fused (``fused`` dict with
    ``pos_bias`` [H,S,S] and ``mask`` [B,S], optional ``interpret``):
    attention runs in the Pallas kernel.
    """
    r = _split_rngs(rng, cfg.num_layers + 2)
    x = dropout(r[0], inputs_embeds, cfg.dropout_rate, deterministic)
    if fused is not None:
        if rng is not None:
            seeds = jax.random.randint(
                jax.random.fold_in(rng, 7), (cfg.num_layers,), 0, 2 ** 31 - 1,
                dtype=jnp.int32)
        else:
            seeds = jnp.zeros((cfg.num_layers,), jnp.int32)
        block_fn = _maybe_checkpoint(encoder_block_fused, (1, 6, 7), remat)
        for i in range(cfg.num_layers):
            x = block_fn(p[f"block_{i}"], cfg, x, fused["pos_bias"],
                         fused["mask"], seeds[i:i + 1],
                         fused.get("interpret", False),
                         deterministic, r[i + 1])
    else:
        block_fn = _maybe_checkpoint(encoder_block, (1, 4), remat)
        for i in range(cfg.num_layers):
            x = block_fn(p[f"block_{i}"], cfg, x, position_bias,
                         deterministic, r[i + 1], mask_add)
    x = layer_norm(p["final_ln"], x, cfg.layer_norm_epsilon)
    return dropout(r[-1], x, cfg.dropout_rate, deterministic)


def decoder_block(p: Params, cfg, x: jnp.ndarray,
                  self_bias: Optional[jnp.ndarray],
                  enc_states: jnp.ndarray,
                  cross_bias: Optional[jnp.ndarray],
                  deterministic: bool = True, rng=None,
                  self_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                  cross_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                  ) -> jnp.ndarray:
    merged = getattr(cfg, "merged_qkv", False) is True
    r = _split_rngs(rng, 6)
    h = layer_norm(p["ln1"], x, cfg.layer_norm_epsilon)
    a = multihead_attention(p["attn"], h, h, h, self_bias,
                            cfg.num_heads, cfg.d_kv, cfg.dropout_rate,
                            deterministic, r[0], kv_proj=self_kv,
                            merged=merged)
    x = x + dropout(r[1], a, cfg.dropout_rate, deterministic)
    h = layer_norm(p["ln2"], x, cfg.layer_norm_epsilon)
    c = multihead_attention(p["cross_attn"], h, enc_states, enc_states,
                            cross_bias, cfg.num_heads, cfg.d_kv,
                            cfg.dropout_rate, deterministic, r[2],
                            kv_proj=cross_kv, merged=merged)
    x = x + dropout(r[3], c, cfg.dropout_rate, deterministic)
    h = layer_norm(p["ln3"], x, cfg.layer_norm_epsilon)
    m = mlp_apply(p["mlp"], h, cfg.feed_forward_proj, cfg.dropout_rate,
                  deterministic, r[4])
    return x + dropout(r[5], m, cfg.dropout_rate, deterministic)


def causal_mask(L: int) -> jnp.ndarray:
    """[1,1,L,L] lower-triangular attend mask."""
    return jnp.tril(jnp.ones((L, L), jnp.float32))[None, None]


def decoder_block_fused(p: Params, cfg, x: jnp.ndarray,
                        self_bias: jnp.ndarray,
                        enc_states: jnp.ndarray, enc_mask: jnp.ndarray,
                        seeds: jnp.ndarray, interpret: bool = False,
                        deterministic: bool = True, rng=None) -> jnp.ndarray:
    """decoder_block with both attention cores in Pallas kernels.

    ``self_bias`` [H,T,T] f32 is the full causal+relative additive bias
    (batch-independent — the train path uses no decoder padding mask,
    matching the reference's ``decoder_attention_mask=None``); cross
    attention is the bias-free rectangular kernel masked by ``enc_mask``
    [B,S]. ``seeds`` [2] — one dropout stream per attention."""
    from vqacl_tpu.ops.fused_attention import (fused_cross_attention,
                                               fused_encoder_attention)

    merged = getattr(cfg, "merged_qkv", False) is True
    mesh = getattr(cfg, "fused_mesh", None)
    H, dkv = cfg.num_heads, cfg.d_kv
    r = _split_rngs(rng, 4)
    rate = 0.0 if deterministic else cfg.dropout_rate
    B, T, D = x.shape
    dt = x.dtype

    h = layer_norm(p["ln1"], x, cfg.layer_norm_epsilon)
    if merged:
        q, k, v = qkv_proj_merged(p["attn"], h, H, dkv)
    else:
        q = (h @ p["attn"]["wq"].astype(dt)).reshape(B, T, H, dkv)
        k = (h @ p["attn"]["wk"].astype(dt)).reshape(B, T, H, dkv)
        v = (h @ p["attn"]["wv"].astype(dt)).reshape(B, T, H, dkv)
    a = fused_encoder_attention(q, k, v, self_bias, jnp.ones((B, T)),
                                interpret=interpret, dropout_rate=rate,
                                seed=seeds[0:1], mesh=mesh)
    a = a @ p["attn"]["wo"].astype(dt)
    x = x + dropout(r[0], a, cfg.dropout_rate, deterministic)

    h = layer_norm(p["ln2"], x, cfg.layer_norm_epsilon)
    qc = (h @ p["cross_attn"]["wq"].astype(dt)).reshape(B, T, H, dkv)
    if merged:
        kc, vc = kv_proj_merged(p["cross_attn"], enc_states, H, dkv)
    else:
        S = enc_states.shape[1]
        kc = (enc_states @ p["cross_attn"]["wk"].astype(dt)
              ).reshape(B, S, H, dkv)
        vc = (enc_states @ p["cross_attn"]["wv"].astype(dt)
              ).reshape(B, S, H, dkv)
    c = fused_cross_attention(qc, kc, vc, enc_mask, interpret=interpret,
                              dropout_rate=rate, seed=seeds[1:2], mesh=mesh)
    c = c @ p["cross_attn"]["wo"].astype(dt)
    x = x + dropout(r[1], c, cfg.dropout_rate, deterministic)

    h = layer_norm(p["ln3"], x, cfg.layer_norm_epsilon)
    m = mlp_apply(p["mlp"], h, cfg.feed_forward_proj, cfg.dropout_rate,
                  deterministic, r[2])
    return x + dropout(r[3], m, cfg.dropout_rate, deterministic)


def decoder_stack(p: Params, cfg, inputs_embeds: jnp.ndarray,
                  enc_states: jnp.ndarray,
                  enc_mask: Optional[jnp.ndarray],
                  dec_mask: Optional[jnp.ndarray] = None,
                  deterministic: bool = True, rng=None,
                  remat: bool = False,
                  fused: Optional[Dict[str, Any]] = None) -> jnp.ndarray:
    """Teacher-forced decoder. inputs_embeds [B,T,D]; enc_mask [B,S].

    ``fused`` (dict, optional ``interpret``): run both attention cores
    in the Pallas kernels — the causal+relative self bias [H,T,T] goes
    in as a full-coverage block bias, cross attention as the bias-free
    rectangular kernel. Requires ``dec_mask is None`` (the train path's
    semantics) and an ``enc_mask``."""
    B, T, D = inputs_embeds.shape
    pb = compute_position_bias(p["rel_bias"], T, T, bidirectional=False,
                               num_buckets=cfg.relative_attention_num_buckets,
                               max_distance=cfg.relative_attention_max_distance)
    if fused is not None and dec_mask is None and enc_mask is not None:
        causal_add = (1.0 - jnp.tril(jnp.ones((T, T), jnp.float32))) * NEG_INF
        self_bias_full = pb[0] + causal_add[None]          # [H,T,T]
        r = _split_rngs(rng, cfg.num_decoder_layers + 2)
        if rng is not None:
            seeds = jax.random.randint(
                jax.random.fold_in(rng, 11), (2 * cfg.num_decoder_layers,),
                0, 2 ** 31 - 1, dtype=jnp.int32)
        else:
            seeds = jnp.zeros((2 * cfg.num_decoder_layers,), jnp.int32)
        x = dropout(r[0], inputs_embeds, cfg.dropout_rate, deterministic)
        block_fn = _maybe_checkpoint(decoder_block_fused, (1, 7, 8), remat)
        for i in range(cfg.num_decoder_layers):
            x = block_fn(p[f"block_{i}"], cfg, x, self_bias_full,
                         enc_states, enc_mask, seeds[2 * i:2 * i + 2],
                         fused.get("interpret", False),
                         deterministic, r[i + 1])
        x = layer_norm(p["final_ln"], x, cfg.layer_norm_epsilon)
        return dropout(r[-1], x, cfg.dropout_rate, deterministic)

    cm = causal_mask(T)
    if dec_mask is not None:
        cm = cm * dec_mask[:, None, None, :]
    self_bias = attention_scores_bias(cm, pb)
    cross_mask = None if enc_mask is None else enc_mask[:, None, None, :]
    cross_bias = attention_scores_bias(cross_mask, None)

    cross_kvs = None
    if getattr(cfg, "folded_cross_kv", False) is True:
        cross_kvs = cross_kv_fold_all(p, cfg.num_decoder_layers, enc_states,
                                      cfg.num_heads, cfg.d_kv)

    r = _split_rngs(rng, cfg.num_decoder_layers + 2)
    x = dropout(r[0], inputs_embeds, cfg.dropout_rate, deterministic)
    block_fn = _maybe_checkpoint(decoder_block, (1, 6), remat)
    for i in range(cfg.num_decoder_layers):
        x = block_fn(p[f"block_{i}"], cfg, x, self_bias, enc_states,
                     cross_bias, deterministic, r[i + 1], None,
                     None if cross_kvs is None else cross_kvs[i])
    x = layer_norm(p["final_ln"], x, cfg.layer_norm_epsilon)
    return dropout(r[-1], x, cfg.dropout_rate, deterministic)


# ---------------------------------------------------------------------------
# embedding / head
# ---------------------------------------------------------------------------

def embed_tokens(shared: jnp.ndarray, ids: jnp.ndarray, dtype) -> jnp.ndarray:
    # gather THEN cast: casting the table first makes XLA materialize a
    # full [vocab, d] bf16 copy (and convert the whole table back in the
    # scatter VJP) just to read a few hundred rows
    return jnp.asarray(shared)[ids].astype(dtype)


def lm_logits(shared: jnp.ndarray, hidden: jnp.ndarray, d_model: int,
              tie_word_embeddings: bool = True) -> jnp.ndarray:
    """Tied-embedding LM head with the mesh-tf rescale
    (``modeling_t5_our.py:663-671``). Returns f32 logits."""
    h = hidden
    if tie_word_embeddings:
        h = h * (d_model ** -0.5)
    return jnp.einsum("btd,vd->btv", h, shared.astype(h.dtype),
                      preferred_element_type=jnp.float32)


def shift_right(labels: jnp.ndarray, decoder_start_token_id: int,
                pad_token_id: int) -> jnp.ndarray:
    """HF ``_shift_right`` (used at ``modeling_t5_our.py:620``): prepend
    start token, drop last, replace -100 with pad."""
    shifted = jnp.concatenate(
        [jnp.full_like(labels[:, :1], decoder_start_token_id), labels[:, :-1]],
        axis=1)
    return jnp.where(shifted == -100, pad_token_id, shifted)
