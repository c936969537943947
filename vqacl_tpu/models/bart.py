"""Pure-functional BART encoder-decoder + VL-BART variant.

The reference ships a VL-BART model (/root/reference/VL-T5/src/
modeling_bart.py:31-552 — ``VisualEmbedding``, ``JointEncoder
(BartEncoder)``, ``VLBart``) that no trainer imports (SURVEY §2.1
"Used? no"); it is provided here so the model-family inventory is
complete and usable. Same functional design as ``models/t5.py``; BART
specifics honored:

- learned positional embeddings with the +2 offset, post-layer-norm
  blocks (standard mean-subtracting LayerNorm with bias),
  ``layernorm_embedding`` after token+position sum;
- scaled dot-product attention (q × d_kv^-0.5) with biased projections;
- GELU feed-forward; tied LM head + ``final_logits_bias``;
- ``shift_tokens_right`` with decoder_start = eos (id 2).

Numerics verified against HF ``BartForConditionalGeneration`` in
tests/test_bart_parity.py. The VL variant concatenates projected region
features (+ box embedding) to the token embeddings, mirroring the
reference's joint encoder; BART has no relative position bias, so no
text-only-bias special case exists.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vqacl_tpu.models.t5 import _normal, dropout as _dropout
from vqacl_tpu.models.visual_embedding import (apply_visual_embedding,
                                               init_visual_embedding)

Params = Dict[str, Any]
NEG_INF = -1e9


def std_layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5
                   ) -> jnp.ndarray:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(dt)


def _init_ln(d):
    return {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _init_linear(rng, din, dout, std=0.02):
    return {"w": _normal(rng, (din, dout), std),
            "b": jnp.zeros((dout,), jnp.float32)}


def _linear(p, x):
    dt = x.dtype
    return x @ p["w"].astype(dt) + p["b"].astype(dt)


def init_bart_attention(rng, d_model):
    ks = jax.random.split(rng, 4)
    return {n: _init_linear(k, d_model, d_model)
            for n, k in zip(("q", "k", "v", "o"), ks)}


def bart_attention(p: Params, cfg, q_in, kv_in, mask4,
                   deterministic=True, rng=None):
    """Scaled MHA; mask4 [B,1,Lq,Lk] additive-ready (1=attend)."""
    B, Lq, D = q_in.shape
    H, dk = cfg.num_heads, cfg.d_model // cfg.num_heads
    dt = q_in.dtype
    q = _linear(p["q"], q_in) * (dk ** -0.5)
    k = _linear(p["k"], kv_in)
    v = _linear(p["v"], kv_in)
    Lk = kv_in.shape[1]
    q = q.reshape(B, Lq, H, dk)
    k = k.reshape(B, Lk, H, dk)
    v = v.reshape(B, Lk, H, dk)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    if mask4 is not None:
        s = s + (1.0 - mask4.astype(jnp.float32)) * NEG_INF
    w = jax.nn.softmax(s, axis=-1)
    if not deterministic and cfg.dropout_rate > 0:
        w = _dropout(rng, w, cfg.dropout_rate, False)
    o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dt), v,
                   preferred_element_type=jnp.float32).astype(dt)
    return _linear(p["o"], o.reshape(B, Lq, H * dk))


def init_bart_layer(rng, cfg, is_decoder):
    ks = jax.random.split(rng, 4)
    d = cfg.d_model
    p = {
        "self_attn": init_bart_attention(ks[0], d),
        "self_ln": _init_ln(d),
        "fc1": _init_linear(ks[1], d, cfg.d_ff),
        "fc2": _init_linear(ks[2], cfg.d_ff, d),
        "final_ln": _init_ln(d),
    }
    if is_decoder:
        p["cross_attn"] = init_bart_attention(ks[3], d)
        p["cross_ln"] = _init_ln(d)
    return p


def _ffn(p, cfg, x, deterministic, rng):
    h = jax.nn.gelu(_linear(p["fc1"], x), approximate=False)
    h = _dropout(rng, h, cfg.dropout_rate, deterministic)
    return _linear(p["fc2"], h)


def bart_encoder_layer(p, cfg, x, mask4, deterministic=True, rng=None):
    r = (jax.random.split(rng, 4) if rng is not None else [None] * 4)
    res = x
    a = bart_attention(p["self_attn"], cfg, x, x, mask4, deterministic, r[0])
    x = std_layer_norm(p["self_ln"], res + _dropout(
        r[1], a, cfg.dropout_rate, deterministic))
    res = x
    f = _ffn(p, cfg, x, deterministic, r[2])
    return std_layer_norm(p["final_ln"], res + _dropout(
        r[3], f, cfg.dropout_rate, deterministic))


def bart_decoder_layer(p, cfg, x, self_mask4, enc, cross_mask4,
                       deterministic=True, rng=None):
    r = (jax.random.split(rng, 6) if rng is not None else [None] * 6)
    res = x
    a = bart_attention(p["self_attn"], cfg, x, x, self_mask4,
                       deterministic, r[0])
    x = std_layer_norm(p["self_ln"], res + _dropout(
        r[1], a, cfg.dropout_rate, deterministic))
    res = x
    c = bart_attention(p["cross_attn"], cfg, x, enc, cross_mask4,
                       deterministic, r[2])
    x = std_layer_norm(p["cross_ln"], res + _dropout(
        r[3], c, cfg.dropout_rate, deterministic))
    res = x
    f = _ffn(p, cfg, x, deterministic, r[4])
    return std_layer_norm(p["final_ln"], res + _dropout(
        r[5], f, cfg.dropout_rate, deterministic))


POS_OFFSET = 2  # HF Bart learned-position offset


def init_bart_params(rng, cfg) -> Params:
    ks = jax.random.split(rng, 8)
    d = cfg.d_model
    enc = {f"layer_{i}": init_bart_layer(k, cfg, False)
           for i, k in enumerate(jax.random.split(ks[0], cfg.num_layers))}
    dec = {f"layer_{i}": init_bart_layer(k, cfg, True)
           for i, k in enumerate(
               jax.random.split(ks[1], cfg.num_decoder_layers))}
    params = {
        "shared": _normal(ks[2], (cfg.vocab_size, d), 0.02),
        "enc_pos": _normal(ks[3], (cfg.max_position_embeddings + POS_OFFSET,
                                   d), 0.02),
        "dec_pos": _normal(ks[4], (cfg.max_position_embeddings + POS_OFFSET,
                                   d), 0.02),
        "enc_ln_emb": _init_ln(d),
        "dec_ln_emb": _init_ln(d),
        "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        "encoder": enc,
        "decoder": dec,
    }
    if getattr(cfg, "use_vision", True):
        params["visual_embedding"] = init_visual_embedding(ks[5], cfg)
    return params


def bart_encode(params, cfg, input_ids, attention_mask=None,
                vis_feats=None, boxes=None,
                deterministic=True, rng=None, dtype=jnp.float32):
    """(VL-)BART encoder. With vis inputs, region embeddings are
    concatenated after the text (JointEncoder, modeling_bart.py:146-283).
    Returns (hidden [B,S,D], enc_mask [B,S])."""
    B, L = input_ids.shape
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.float32)
    emb = jnp.asarray(params["shared"]).astype(dtype)[input_ids]
    pos = jnp.asarray(params["enc_pos"]).astype(dtype)[
        jnp.arange(L) + POS_OFFSET]
    x = emb + pos[None]
    mask = attention_mask
    if vis_feats is not None:
        vis = apply_visual_embedding(params["visual_embedding"], cfg,
                                     params["shared"], vis_feats, boxes,
                                     dtype=dtype)
        x = jnp.concatenate([x, vis], axis=1)
        mask = jnp.concatenate(
            [mask, jnp.ones((B, vis.shape[1]), mask.dtype)], axis=1)
    x = std_layer_norm(params["enc_ln_emb"], x)
    r = (jax.random.split(rng, cfg.num_layers + 1)
         if rng is not None else [None] * (cfg.num_layers + 1))
    x = _dropout(r[0], x, cfg.dropout_rate, deterministic)
    mask4 = mask[:, None, None, :]
    for i in range(cfg.num_layers):
        x = bart_encoder_layer(params["encoder"][f"layer_{i}"], cfg, x,
                               mask4, deterministic, r[i + 1])
    return x, mask


def shift_tokens_right(labels, pad_token_id, decoder_start_token_id):
    shifted = jnp.concatenate(
        [jnp.full_like(labels[:, :1], decoder_start_token_id),
         labels[:, :-1]], axis=1)
    return jnp.where(shifted == -100, pad_token_id, shifted)


def bart_decode_train(params, cfg, enc, enc_mask, labels,
                      deterministic=True, rng=None, dtype=jnp.float32):
    dec_ids = shift_tokens_right(labels, cfg.pad_token_id,
                                 cfg.decoder_start_token_id)
    B, T = dec_ids.shape
    emb = jnp.asarray(params["shared"]).astype(dtype)[dec_ids]
    pos = jnp.asarray(params["dec_pos"]).astype(dtype)[
        jnp.arange(T) + POS_OFFSET]
    x = std_layer_norm(params["dec_ln_emb"], emb + pos[None])
    r = (jax.random.split(rng, cfg.num_decoder_layers + 1)
         if rng is not None else [None] * (cfg.num_decoder_layers + 1))
    x = _dropout(r[0], x, cfg.dropout_rate, deterministic)
    causal = jnp.tril(jnp.ones((T, T)))[None, None]
    cross4 = enc_mask[:, None, None, :]
    for i in range(cfg.num_decoder_layers):
        x = bart_decoder_layer(params["decoder"][f"layer_{i}"], cfg, x,
                               causal, enc, cross4, deterministic, r[i + 1])
    logits = jnp.einsum("btd,vd->btv", x,
                        jnp.asarray(params["shared"]).astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return logits + jnp.asarray(params["final_logits_bias"])


# ---- HF weight import -----------------------------------------------------

def bart_from_state_dict(sd, cfg) -> Params:
    import numpy as np

    def t(k):
        return np.ascontiguousarray(np.asarray(sd[k], np.float32).T)

    def a(k):
        return np.asarray(sd[k], np.float32)

    def lin(prefix):
        return {"w": t(f"{prefix}.weight"), "b": a(f"{prefix}.bias")}

    def ln(prefix):
        return {"w": a(f"{prefix}.weight"), "b": a(f"{prefix}.bias")}

    def attn(prefix):
        return {"q": lin(f"{prefix}.q_proj"), "k": lin(f"{prefix}.k_proj"),
                "v": lin(f"{prefix}.v_proj"), "o": lin(f"{prefix}.out_proj")}

    def layer(prefix, is_decoder):
        p = {"self_attn": attn(f"{prefix}.self_attn"),
             "self_ln": ln(f"{prefix}.self_attn_layer_norm"),
             "fc1": lin(f"{prefix}.fc1"), "fc2": lin(f"{prefix}.fc2"),
             "final_ln": ln(f"{prefix}.final_layer_norm")}
        if is_decoder:
            p["cross_attn"] = attn(f"{prefix}.encoder_attn")
            p["cross_ln"] = ln(f"{prefix}.encoder_attn_layer_norm")
        return p

    return {
        "shared": a("model.shared.weight"),
        "enc_pos": a("model.encoder.embed_positions.weight"),
        "dec_pos": a("model.decoder.embed_positions.weight"),
        "enc_ln_emb": ln("model.encoder.layernorm_embedding"),
        "dec_ln_emb": ln("model.decoder.layernorm_embedding"),
        "final_logits_bias": a("final_logits_bias").reshape(-1),
        "encoder": {f"layer_{i}": layer(f"model.encoder.layers.{i}", False)
                    for i in range(cfg.num_layers)},
        "decoder": {f"layer_{i}": layer(f"model.decoder.layers.{i}", True)
                    for i in range(cfg.num_decoder_layers)},
    }
