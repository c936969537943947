"""VL-T5: joint text+vision T5 encoder-decoder with prototype augmentation.

TPU-first rebuild of ``VLT5`` (/root/reference/VL-T5/src/modeling_t5_our.py:342-773):
one pure function per phase —

  ``encode``       text‖visual joint encoding, text-only relative position
                   bias (``JointEncoder.forward``, :175-339)
  ``augment``      prototype EMA update + tanh-cosine retrieval + concat of
                   the two retrieved (detached) vectors (:583-615)
  ``decode_train`` teacher-forced decoder + tied LM head (:618-686)
  ``forward_train``the full train-time forward returning per-token CE and
                   new prototype state

The whole train-time path is jit-able as a single XLA program: prototype
state is input/output, no Python control flow depends on data.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vqacl_tpu.models import t5
from vqacl_tpu.models.prototype import (
    ProtoState, batch_class_means, cosine_retrieve, memory_loss, proto_update,
)
from vqacl_tpu.models.visual_embedding import (
    apply_visual_embedding, init_visual_embedding,
)

Params = Dict[str, Any]


def init_vlt5_params(rng, cfg) -> Params:
    kt, kv = jax.random.split(rng)
    params = t5.init_t5_params(kt, cfg)
    params["visual_embedding"] = init_visual_embedding(kv, cfg)
    return params


# leaves the compute path consumes in f32 (layer_norm upcasts its weight;
# the relative bias is gathered f32) — pre-casting these would CHANGE
# numerics, everything else is `.astype(compute_dtype)`-ed at its use
# site anyway
_F32_LEAVES = frozenset({
    "ln1", "ln2", "ln3", "final_ln", "rel_bias",
    "feat_ln", "pos_ln", "joint_ln",
})


def cast_params_for_inference(params: Params,
                              dtype=jnp.bfloat16) -> Params:
    """Pre-cast the matmul weights to the compute dtype ONCE.

    Every projection/MLP/embedding weight is consumed through
    ``W.astype(compute_dtype)`` inside the compiled programs, so a jitted
    eval step called with f32 params re-materializes a ~0.45 GB bf16
    copy of the model EVERY call (~1.3 GB of cast traffic at t5-base).
    Params don't change across an eval epoch — casting once here and
    passing the result makes those casts no-ops while producing
    bit-identical outputs (``bf16(W)`` is the same array either way;
    the f32-consumed leaves above are left untouched). Use for
    eval/serving only — training must keep f32 master params."""
    def leaf(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in _F32_LEAVES or not jnp.issubdtype(x.dtype,
                                                     jnp.floating):
            return x
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(leaf, params)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def joint_pos_bias(params: Params, cfg, L: int, V_L: int) -> jnp.ndarray:
    """[1, H, L+V_L, L+V_L] f32: T5 relative bias on the text-text block
    only, zeros elsewhere (modeling_t5_our.py:258-273)."""
    S = L + V_L
    text_bias = t5.compute_position_bias(
        params["encoder"]["rel_bias"], L, L, bidirectional=True,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance)      # [1,H,L,L]
    bias = jnp.zeros((1, cfg.num_heads, S, S), jnp.float32)
    return bias.at[:, :, :L, :L].set(text_bias)


def encode(params: Params, cfg,
           input_ids: jnp.ndarray,            # [B, L] int32
           vis_feats: jnp.ndarray,            # [B, N, feat_dim]
           boxes: jnp.ndarray,                # [B, N, 4]
           attention_mask: Optional[jnp.ndarray] = None,   # [B, L]
           vis_attention_mask: Optional[jnp.ndarray] = None,
           img_order_ids: Optional[jnp.ndarray] = None,    # [B_or_1, N]
           obj_order_ids: Optional[jnp.ndarray] = None,
           deterministic: bool = True, rng=None,
           dtype=jnp.float32, remat: bool = False,
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joint encoder → (hidden [B, L+N, D], enc_mask [B, L+N]).

    ``img_order_ids``/``obj_order_ids`` support multi-image inputs
    (n_images=2 in the reference config, trainer_base.py:79) — defaults
    reproduce the single-image VQACL path."""
    B, L = input_ids.shape
    N = vis_feats.shape[1]
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.float32)
    if vis_attention_mask is None:
        vis_attention_mask = jnp.ones((B, N), jnp.float32)
    enc_mask = jnp.concatenate([attention_mask, vis_attention_mask], axis=1)

    text_emb = t5.embed_tokens(params["shared"], input_ids, dtype)
    vis_emb = apply_visual_embedding(
        params["visual_embedding"], cfg, params["shared"], vis_feats, boxes,
        img_order_ids=img_order_ids, obj_order_ids=obj_order_ids,
        dtype=dtype)
    inputs = jnp.concatenate([text_emb, vis_emb], axis=1)       # [B, S, D]

    if getattr(cfg, "pp_mesh", None) is not None:
        # pipeline-parallel encoder stack (parallel/pipeline.py): the
        # unfused bias/mask layout, blocks sharded over the pp axis
        from vqacl_tpu.parallel.pipeline import encoder_stack_pp
        pos_bias = joint_pos_bias(params, cfg, L, N)
        mask_add = t5.attention_scores_bias(enc_mask[:, None, None, :], None)
        hidden = encoder_stack_pp(
            params["encoder"], cfg, inputs, pos_bias, mask_add,
            cfg.pp_mesh, getattr(cfg, "pp_micro", 4),
            deterministic=deterministic, rng=rng)
    elif getattr(cfg, "fused_attention", False) is True:  # "auto" = not yet
                                                          # resolved → XLA path
        # text-text block only: the joint bias is structurally zero
        # elsewhere (modeling_t5_our.py:258-273), so the kernel never
        # moves the [H,S,S] zeros (or their gradients) through HBM
        text_bias = t5.compute_position_bias(
            params["encoder"]["rel_bias"], L, L, bidirectional=True,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance)[0]  # [H,L,L]
        fused = {"pos_bias": text_bias,
                 "mask": enc_mask,
                 "interpret": getattr(cfg, "fused_interpret", False)}
        hidden = t5.encoder_stack(params["encoder"], cfg, inputs, None,
                                  deterministic=deterministic, rng=rng,
                                  remat=remat, fused=fused)
    else:
        # pos bias [1,H,S,S] and padding mask [B,1,1,S] stay separate
        # additive terms (fused per-layer) — materializing their sum is
        # a [B,H,S,S] f32 HBM tensor read 12× fwd + 12× bwd
        pos_bias = joint_pos_bias(params, cfg, L, N)
        mask_add = t5.attention_scores_bias(enc_mask[:, None, None, :], None)
        hidden = t5.encoder_stack(params["encoder"], cfg, inputs, pos_bias,
                                  deterministic=deterministic, rng=rng,
                                  remat=remat, mask_add=mask_add)
    return hidden, enc_mask


# ---------------------------------------------------------------------------
# prototype augmentation
# ---------------------------------------------------------------------------

class ProtoAux(NamedTuple):
    loss_memory_q: jnp.ndarray
    loss_memory_v: jnp.ndarray
    retrieval_acc_q: jnp.ndarray
    retrieval_acc_v: jnp.ndarray


def augment(params: Params, cfg, hidden: jnp.ndarray, enc_mask: jnp.ndarray,
            proto_state: ProtoState,
            ques_labels: Optional[jnp.ndarray] = None,   # [B, 10] one-hot
            cate_labels: Optional[jnp.ndarray] = None,   # [B, 80] one-hot
            proto_update_flag: bool = False,
            use_memory_loss: bool = False,
            proto_alpha: float = 0.5, proto_beta: float = 0.5,
            ) -> Tuple[jnp.ndarray, jnp.ndarray, ProtoState, ProtoAux]:
    """Prototype update + retrieval + concat (modeling_t5_our.py:583-615).

    Pooling matches the reference exactly: plain mean over the first L
    positions (text, pads included) and the rest (visual) respectively.
    Returns (hidden_aug [B, S+2, D], enc_mask_aug [B, S+2], new_state, aux).
    """
    L = cfg.max_text_length
    pooled_q = jnp.mean(hidden[:, :L, :].astype(jnp.float32), axis=1)   # [B,D]
    pooled_v = jnp.mean(hidden[:, L:, :].astype(jnp.float32), axis=1)   # [B,D]

    zero = jnp.asarray(0.0, jnp.float32)
    aux = ProtoAux(zero, zero, jnp.asarray(-1.0), jnp.asarray(-1.0))

    if proto_update_flag:
        assert ques_labels is not None and cate_labels is not None
        cur_q, num_q = batch_class_means(pooled_q, ques_labels)
        cur_v, num_v = batch_class_means(pooled_v, cate_labels)
        if use_memory_loss:
            lq, lv = memory_loss(pooled_q, pooled_v, ques_labels,
                                 cate_labels, proto_state)
            aux = aux._replace(loss_memory_q=lq, loss_memory_v=lv)
        proto_state = proto_update(proto_state, cur_q, cur_v, num_q, num_v,
                                   proto_alpha, proto_beta)
        q_vec, _, acc_q = cosine_retrieve(proto_state.q_proto, pooled_q,
                                          ques_labels)
        v_vec, _, acc_v = cosine_retrieve(proto_state.v_proto, pooled_v,
                                          cate_labels)
        aux = aux._replace(retrieval_acc_q=acc_q, retrieval_acc_v=acc_v)
    else:
        q_vec, _, _ = cosine_retrieve(proto_state.q_proto, pooled_q)
        v_vec, _, _ = cosine_retrieve(proto_state.v_proto, pooled_v)

    q_vec = jax.lax.stop_gradient(q_vec).astype(hidden.dtype)[:, None, :]
    v_vec = jax.lax.stop_gradient(v_vec).astype(hidden.dtype)[:, None, :]
    hidden_aug = jnp.concatenate([hidden, q_vec, v_vec], axis=1)
    B = hidden.shape[0]
    mask_aug = jnp.concatenate(
        [enc_mask, jnp.ones((B, 2), enc_mask.dtype)], axis=1)
    return hidden_aug, mask_aug, proto_state, aux


# ---------------------------------------------------------------------------
# decoding (teacher-forced) + loss
# ---------------------------------------------------------------------------

def decode_hidden(params: Params, cfg, hidden: jnp.ndarray,
                  enc_mask: jnp.ndarray, labels: jnp.ndarray,
                  deterministic: bool = True, rng=None,
                  dtype=jnp.float32, remat: bool = False) -> jnp.ndarray:
    """Teacher-forced decoder states [B, T, D] (pre-LM-head).

    ``labels`` uses -100 for padding (collate semantics,
    ``vqa_data_memory.py:366-368``); shifted right internally like HF.
    """
    dec_input_ids = t5.shift_right(labels, cfg.decoder_start_token_id,
                                   cfg.pad_token_id)
    dec_emb = t5.embed_tokens(params["shared"], dec_input_ids, dtype)
    if getattr(cfg, "pp_mesh", None) is not None:
        from vqacl_tpu.parallel.pipeline import decoder_stack_pp
        return decoder_stack_pp(
            params["decoder"], cfg, dec_emb, hidden, enc_mask,
            cfg.pp_mesh, getattr(cfg, "pp_micro", 4),
            deterministic=deterministic, rng=rng)
    fused = None
    if getattr(cfg, "fused_attention", False) is True \
            and getattr(cfg, "fused_decoder", False):
        fused = {"interpret": getattr(cfg, "fused_interpret", False)}
    return t5.decoder_stack(params["decoder"], cfg, dec_emb, hidden, enc_mask,
                            deterministic=deterministic, rng=rng, remat=remat,
                            fused=fused)


def decode_train(params: Params, cfg, hidden: jnp.ndarray,
                 enc_mask: jnp.ndarray, labels: jnp.ndarray,
                 deterministic: bool = True, rng=None,
                 dtype=jnp.float32, remat: bool = False) -> jnp.ndarray:
    """Teacher-forced decode → f32 logits [B, T, vocab]."""
    seq = decode_hidden(params, cfg, hidden, enc_mask, labels,
                        deterministic=deterministic, rng=rng, dtype=dtype,
                        remat=remat)
    return t5.lm_logits(params["shared"], seq, cfg.d_model,
                        cfg.tie_word_embeddings)


def token_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token CE with ignore_index=-100 (reduction='none',
    modeling_t5_our.py:680-686). Returns (loss [B,T], mask [B,T])."""
    mask = (labels != -100).astype(jnp.float32)
    safe = jnp.clip(jnp.where(labels == -100, 0, labels), 0,
                    logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return nll * mask, mask


def weighted_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                     scores: jnp.ndarray) -> jnp.ndarray:
    """The train_step loss recipe (vqa_model.py:46-54): per-token CE →
    per-sequence mean over non-pad → × per-sample answer score → batch
    mean."""
    nll, mask = token_cross_entropy(logits, labels)
    per_seq = nll.sum(axis=1) / jnp.clip(mask.sum(axis=1), 1.0, None)
    return jnp.mean(per_seq * scores.astype(jnp.float32))


def _token_weights(labels: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """d(loss)/d(nll[b,t]) for the weighted-loss recipe: mask ×
    score_b / (valid_b · B)."""
    mask = (labels != -100).astype(jnp.float32)
    denom = jnp.clip(mask.sum(axis=1, keepdims=True), 1.0, None)
    B = labels.shape[0]
    return mask * scores.astype(jnp.float32)[:, None] / (denom * B)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_head_loss(hidden: jnp.ndarray, shared: jnp.ndarray,
                    labels: jnp.ndarray, scores: jnp.ndarray,
                    rescale: float) -> jnp.ndarray:
    """Tied LM head + weighted CE as ONE differentiable op.

    Numerically identical to ``weighted_lm_loss(lm_logits(...), ...)``
    (same f32 accumulation), but the backward pass never materializes the
    f32 log-softmax or f32 d(logits): residuals are (hidden, lse[B,T]);
    logits are recomputed in bwd (one extra [B·T,D]×[D,V] matmul — ~0.1 ms
    on the MXU vs ~0.3 GB of saved f32 HBM traffic at bs 80) and the
    probability/one-hot difference flows into the two grad matmuls in
    bf16. Loss surface: modeling_t5_our.py:663-686 + vqa_model.py:46-54.
    """
    loss, _ = _fused_head_loss_fwd(hidden, shared, labels, scores, rescale)
    return loss


def _head_logits(hidden, shared, rescale):
    h = hidden * jnp.asarray(rescale, hidden.dtype)
    return jnp.einsum("btd,vd->btv", h, shared.astype(hidden.dtype),
                      preferred_element_type=jnp.float32)


def ll_from(logits, safe):
    """Label-token logit [B,T] from f32 logits and clipped labels."""
    return jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]


def _fused_head_loss_fwd(hidden, shared, labels, scores, rescale):
    logits = _head_logits(hidden, shared, rescale)
    lse = jax.nn.logsumexp(logits, axis=-1)                     # [B,T]
    safe = jnp.clip(jnp.where(labels == -100, 0, labels), 0,
                    logits.shape[-1] - 1)
    ll = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    w = _token_weights(labels, scores)
    loss = jnp.sum((lse - ll) * w)
    return loss, (hidden, shared, labels, scores, lse)


def _fused_head_loss_bwd(rescale, res, g):
    hidden, shared, labels, scores, lse = res
    logits = _head_logits(hidden, shared, rescale)              # recompute
    p = jnp.exp(logits - lse[..., None])                        # softmax f32
    safe = jnp.clip(jnp.where(labels == -100, 0, labels), 0,
                    logits.shape[-1] - 1)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
    w = _token_weights(labels, scores) * g
    dlogits = ((p - onehot) * w[..., None]).astype(hidden.dtype)
    dt = hidden.dtype
    rs = jnp.asarray(rescale, dt)
    dh = jnp.einsum("btv,vd->btd", dlogits, shared.astype(dt),
                    preferred_element_type=jnp.float32).astype(dt) * rs
    dshared = jnp.einsum("btv,btd->vd", dlogits, hidden * rs,
                         preferred_element_type=jnp.float32
                         ).astype(shared.dtype)
    # true scores cotangent: loss = Σ_b score_b · (Σ_t nll·mask)/valid_b / B
    # → d/d(score_b) = per-sequence mean NLL / B (training only
    # differentiates params, but anything differentiating the answer-score
    # weights gets the real gradient, not a silent zero)
    mask = (labels != -100).astype(jnp.float32)
    nll = (lse - ll_from(logits, safe)) * mask
    valid = jnp.clip(mask.sum(axis=1), 1.0, None)
    dscores = (g * nll.sum(axis=1) / valid / labels.shape[0]
               ).astype(scores.dtype)
    return dh, dshared, None, dscores


fused_head_loss.defvjp(_fused_head_loss_fwd, _fused_head_loss_bwd)


# ---------------------------------------------------------------------------
# classifier head (working version of the reference's broken --classifier)
# ---------------------------------------------------------------------------

def init_classifier_head(rng, cfg, num_answers: int = 3129) -> Params:
    """Answer-classification head over the top-k answer vocabulary.

    The reference's ``--classifier`` branch references an undefined
    ``self.answer_head`` (vqa_model.py:102 — SURVEY §2.5); this is the
    working equivalent in VL-T5's original style: decoder start-token
    hidden state → Linear(d, 2d) → GELU → LayerNorm → Linear(2d, A),
    trained with BCE-with-logits over the soft VQA scores
    (vqa_data_memory.py:224-229 builds those targets).
    """
    k1, k2 = jax.random.split(rng)
    d = cfg.d_model
    return {
        "fc1_w": jax.random.normal(k1, (d, 2 * d)) * d ** -0.5,
        "fc1_b": jnp.zeros((2 * d,)),
        "ln": jnp.ones((2 * d,)),
        "fc2_w": jax.random.normal(k2, (2 * d, num_answers)) * (2 * d) ** -0.5,
        "fc2_b": jnp.zeros((num_answers,)),
    }


def classifier_logits(head: Params, cfg, params: Params,
                      hidden: jnp.ndarray, enc_mask: jnp.ndarray,
                      dtype=jnp.float32) -> jnp.ndarray:
    """One decoder step from the start token → answer logits [B, A]
    (test_step classifier branch semantics, vqa_model.py:81-108)."""
    B = hidden.shape[0]
    start = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
    dec_emb = t5.embed_tokens(params["shared"], start, dtype)
    seq = t5.decoder_stack(params["decoder"], cfg, dec_emb, hidden, enc_mask,
                           deterministic=True)
    h = seq[:, 0].astype(jnp.float32)                       # [B, d]
    x = h @ head["fc1_w"] + head["fc1_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = t5.layer_norm(head["ln"], x, cfg.layer_norm_epsilon)
    return x @ head["fc2_w"] + head["fc2_b"]


def classifier_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray
                        ) -> jnp.ndarray:
    """BCEWithLogits over soft targets (vqa_model.py:16 ``bce_loss``)."""
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(targets * logp + (1.0 - targets) * lognp)


# ---------------------------------------------------------------------------
# full train-time forward
# ---------------------------------------------------------------------------

class ForwardOut(NamedTuple):
    loss: jnp.ndarray
    proto_state: ProtoState
    aux: ProtoAux


def forward_train(params: Params, cfg, batch: Dict[str, jnp.ndarray],
                  proto_state: ProtoState,
                  proto_alpha: float, proto_beta: float,
                  use_prototype: bool = True,
                  use_memory_loss: bool = False,
                  lambda_q: float = 0.0, lambda_v: float = 0.0,
                  deterministic: bool = False, rng=None,
                  dtype=jnp.bfloat16, remat: bool = False) -> ForwardOut:
    """Full training forward (vqa_model.py:18-66 + modeling_t5_our.py:514-686).

    batch: input_ids [B,L], vis_feats [B,N,2048], boxes [B,N,4],
           target_ids [B,T] (-100 padded), scores [B],
           ques_labels [B,10], cate_labels [B,80].
    """
    r_enc = r_dec = None
    if rng is not None:
        r_enc, r_dec = jax.random.split(rng)
    hidden, enc_mask = encode(params, cfg, batch["input_ids"],
                              batch["vis_feats"], batch["boxes"],
                              deterministic=deterministic, rng=r_enc,
                              dtype=dtype, remat=remat)
    if use_prototype:
        hidden, enc_mask, proto_state, aux = augment(
            params, cfg, hidden, enc_mask, proto_state,
            ques_labels=batch["ques_labels"], cate_labels=batch["cate_labels"],
            proto_update_flag=True, use_memory_loss=use_memory_loss,
            proto_alpha=proto_alpha, proto_beta=proto_beta)
    else:
        zero = jnp.asarray(0.0, jnp.float32)
        aux = ProtoAux(zero, zero, jnp.asarray(-1.0), jnp.asarray(-1.0))

    seq = decode_hidden(params, cfg, hidden, enc_mask, batch["target_ids"],
                        deterministic=deterministic, rng=r_dec, dtype=dtype,
                        remat=remat)
    rescale = cfg.d_model ** -0.5 if cfg.tie_word_embeddings else 1.0
    loss = fused_head_loss(seq, params["shared"], batch["target_ids"],
                           batch["scores"], rescale)
    if use_memory_loss:
        loss = loss + lambda_q * aux.loss_memory_q + lambda_v * aux.loss_memory_v
    return ForwardOut(loss=loss, proto_state=proto_state, aux=aux)
