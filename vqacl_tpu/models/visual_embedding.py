"""Region-feature visual embedding.

Rebuild of ``VisualEmbedding`` (/root/reference/VL-T5/src/modeling_t5_our.py:27-143):
projects 36×2048 Faster-RCNN region features plus box geometry
(x1,y1,x2,y2,area) into d_model, adds image-order and object-order
embeddings (object order indexes the *top* of the shared vocab — the
``<vis_extra_id_i>`` rows, ``modeling_t5_our.py:130``), with per-stream
T5 layer norms.

TPU notes: the whole thing is two small matmuls + gathers that XLA fuses
into the encoder's first layer; boxes arrive already normalized to [0,1]
by the collator (``vqa_data_memory.py:176-187``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vqacl_tpu.models.t5 import _normal, layer_norm

Params = Dict[str, Any]


def init_visual_embedding(rng, cfg) -> Params:
    kf, kp, ki = jax.random.split(rng, 3)
    p: Params = {
        # linear layers carry bias in the reference (torch nn.Linear default)
        "feat_w": _normal(kf, (cfg.feat_dim, cfg.d_model), cfg.feat_dim ** -0.5),
        "feat_b": jnp.zeros((cfg.d_model,), jnp.float32),
        "pos_w": _normal(kp, (cfg.pos_dim + 1, cfg.d_model), 1.0),
        "pos_b": jnp.zeros((cfg.d_model,), jnp.float32),
    }
    if cfg.use_vis_layer_norm and cfg.individual_vis_layer_norm:
        p["feat_ln"] = jnp.ones((cfg.d_model,), jnp.float32)
        p["pos_ln"] = jnp.ones((cfg.d_model,), jnp.float32)
    elif cfg.use_vis_layer_norm:
        p["joint_ln"] = jnp.ones((cfg.d_model,), jnp.float32)
    if cfg.use_vis_order_embedding:
        p["img_order"] = _normal(ki, (cfg.n_images, cfg.d_model), 1.0)
    return p


def apply_visual_embedding(p: Params, cfg, shared: jnp.ndarray,
                           feats: jnp.ndarray, boxes: jnp.ndarray,
                           img_order_ids: jnp.ndarray | None = None,
                           obj_order_ids: jnp.ndarray | None = None,
                           dtype=jnp.float32) -> jnp.ndarray:
    """feats [B,N,feat_dim], boxes [B,N,4] (x1,y1,x2,y2 in [0,1]) → [B,N,D].

    Box area uses the reference's index convention
    (``modeling_t5_our.py:78-90``: height=pos[...,3]-pos[...,2],
    width=pos[...,1]-pos[...,0]) so numerics match even though with
    (x1,y1,x2,y2) boxes that computes (y2-x2)*(y1-x1) — a reference
    quirk kept deliberately for parity.
    """
    B, N, _ = feats.shape
    feats = feats.astype(dtype)
    boxes = boxes.astype(dtype)

    feat_emb = feats @ p["feat_w"].astype(dtype) + p["feat_b"].astype(dtype)
    if "feat_ln" in p:
        feat_emb = layer_norm(p["feat_ln"], feat_emb, cfg.layer_norm_epsilon)

    area = (boxes[:, :, 3] - boxes[:, :, 2]) * (boxes[:, :, 1] - boxes[:, :, 0])
    pos = jnp.concatenate([boxes, area[..., None]], axis=2)  # [B,N,5]
    pos_emb = pos @ p["pos_w"].astype(dtype) + p["pos_b"].astype(dtype)
    if "pos_ln" in p:
        pos_emb = layer_norm(p["pos_ln"], pos_emb, cfg.layer_norm_epsilon)

    vis = feat_emb + pos_emb

    if cfg.use_vis_order_embedding:
        if img_order_ids is None:
            img_order_ids = jnp.zeros((1, N), jnp.int32)
        vis = vis + jnp.asarray(p["img_order"]).astype(dtype)[img_order_ids]
        # reference maps obj order i → vocab row (V - i - 1): the
        # <vis_extra_id_*> block at the top of the shared embedding
        if obj_order_ids is None:
            # default arange path = the top N rows reversed — a STATIC
            # slice, whose VJP is a pad instead of a full-vocab scatter
            # (one fewer dense [V,d] f32 grad buffer per step)
            rows = jax.lax.slice_in_dim(
                jnp.asarray(shared), cfg.vocab_size - N, cfg.vocab_size,
                axis=0)[::-1]
            vis = vis + rows[None].astype(dtype)
        else:
            inv_ids = cfg.vocab_size - obj_order_ids - 1
            vis = vis + jnp.asarray(shared)[inv_ids].astype(dtype)

    if "joint_ln" in p:
        vis = layer_norm(p["joint_ln"], vis, cfg.layer_norm_epsilon)
    return vis
