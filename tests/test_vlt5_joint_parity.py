"""Torch cross-check of the FULL joint VL forward.

``test_t5_parity.py`` pins the plain T5 stack against HuggingFace; this
test pins everything VL-T5 adds on top — transcribed into torch *from
the reference's semantics* (not its code) and driven with identical
ported weights:

- VisualEmbedding: feat Linear(2048→d)+T5LN, pos Linear(5→d)+T5LN with
  the reference's area quirk, img-order embedding, obj-order rows taken
  from the TOP of the shared vocab (modeling_t5_our.py:27-134);
- joint encoder: text‖visual concat with the text-only relative bias
  placed in the top-left block of a zero [1,H,S,S] bias + extended
  mask, driven through the HF T5 blocks (modeling_t5_our.py:175-339);
- tanh-cosine prototype retrieval + detached concat of the two
  retrieved vectors (modeling_t5_our.py:434-462, 583-615);
- decoder cross-attending the augmented states with the mask extended
  by 2, tied-head rescale (modeling_t5_our.py:618-671);
- the weighted loss recipe: per-token CE (ignore −100) → per-sequence
  mean over non-pad → × answer score → batch mean (vqa_model.py:46-54,
  modeling_t5_our.py:680-686).

The torch weights flow to JAX through ``hf_import.from_state_dict``'s
``encoder.visual_embedding.*`` path — the same ingest used for real
reference ``.pth`` checkpoints.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.models import vlt5
from vqacl_tpu.models.hf_import import from_state_dict
from vqacl_tpu.models.prototype import ProtoState
from vqacl_tpu.utils.config import tiny_model_config

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def build_torch_visual_embedding(cfg):
    """Reference VisualEmbedding (modeling_t5_our.py:27-76), individual
    layer norms, submodule names matching the checkpoint layout so
    ``state_dict()`` feeds hf_import directly."""
    from torch import nn
    from transformers.models.t5.modeling_t5 import T5LayerNorm

    mod = nn.Module()
    mod.feat_embedding = nn.Sequential(
        nn.Linear(cfg.feat_dim, cfg.d_model),
        T5LayerNorm(cfg.d_model, eps=cfg.layer_norm_epsilon))
    mod.absolute_vis_pos_embedding = nn.Sequential(
        nn.Linear(cfg.pos_dim + 1, cfg.d_model),
        T5LayerNorm(cfg.d_model, eps=cfg.layer_norm_epsilon))
    mod.img_order_embedding = nn.Embedding(cfg.n_images, cfg.d_model)
    return mod


def torch_visual_embed(mod, shared, feats, pos):
    """Forward semantics of modeling_t5_our.py:94-134 (defaults path:
    img_order 0s, obj_order arange inverted into the top vocab rows),
    incl. the area quirk (height=pos[...,3]-pos[...,2],
    width=pos[...,1]-pos[...,0])."""
    B, N, _ = feats.shape
    feat_emb = mod.feat_embedding(feats)
    area = ((pos[:, :, 3] - pos[:, :, 2])
            * (pos[:, :, 1] - pos[:, :, 0])).unsqueeze(2)
    pos5 = torch.cat([pos, area], dim=2)
    pos_emb = mod.absolute_vis_pos_embedding(pos5)
    img_order = mod.img_order_embedding(
        torch.zeros(1, N, dtype=torch.long))
    obj_ids = shared.num_embeddings - torch.arange(N) - 1
    obj_order = shared(obj_ids.unsqueeze(0))
    return feat_emb + pos_emb + img_order + obj_order


def torch_cosine_retrieve(bank, pooled):
    """cosine_similarity_multi (modeling_t5_our.py:434-462): tanh → L2
    normalize → argmax cosine → select RAW bank rows."""
    import torch.nn.functional as F
    a = F.normalize(torch.tanh(bank), dim=1)
    b = F.normalize(torch.tanh(pooled), dim=1)
    sim = (b @ a.T)                                   # [B, C]
    idx = sim.argmax(dim=1)
    return bank[idx]


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(vocab_size=64, feat_dim=12, n_boxes=5,
                            max_text_length=7)
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        dropout_rate=0.0, layer_norm_epsilon=cfg.layer_norm_epsilon,
        feed_forward_proj="relu", tie_word_embeddings=True,
        pad_token_id=0, eos_token_id=1, decoder_start_token_id=0)
    torch.manual_seed(7)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    vis_mod = build_torch_visual_embedding(cfg).eval()
    # give the layer norms non-trivial weights so LN parity is exercised
    with torch.no_grad():
        for m in [vis_mod.feat_embedding[1], vis_mod.absolute_vis_pos_embedding[1]]:
            m.weight.copy_(torch.rand_like(m.weight) + 0.5)

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd.update({f"encoder.visual_embedding.{k}": v.detach().numpy()
               for k, v in vis_mod.state_dict().items()})
    params = from_state_dict(sd, cfg)

    rng = np.random.default_rng(11)
    B, L, N, T = 4, cfg.max_text_length, cfg.n_boxes, 5
    input_ids = rng.integers(2, cfg.vocab_size, size=(B, L))
    input_ids[1, 4:] = 0                                  # pad
    feats = rng.normal(size=(B, N, cfg.feat_dim)).astype(np.float32)
    x1 = rng.uniform(0, 0.5, (B, N)); y1 = rng.uniform(0, 0.5, (B, N))
    boxes = np.stack([x1, y1, x1 + rng.uniform(0, 0.5, (B, N)),
                      y1 + rng.uniform(0, 0.5, (B, N))],
                     axis=-1).astype(np.float32)
    labels = rng.integers(2, cfg.vocab_size, size=(B, T))
    labels[0, 3:] = -100
    labels[2, 2:] = -100
    scores = rng.uniform(0.3, 1.0, size=(B,)).astype(np.float32)
    q_bank = rng.normal(size=(cfg.n_ques_types, cfg.d_model)).astype(np.float32)
    v_bank = rng.normal(size=(cfg.n_categories, cfg.d_model)).astype(np.float32)
    data = dict(input_ids=input_ids, feats=feats, boxes=boxes, labels=labels,
                scores=scores, q_bank=q_bank, v_bank=v_bank)
    return cfg, hf, vis_mod, params, data


def torch_joint_encode(cfg, hf, vis_mod, input_ids, feats, boxes):
    """JointEncoder.forward semantics (modeling_t5_our.py:175-339)."""
    enc = hf.encoder
    text_emb = hf.shared(input_ids)
    vis_emb = torch_visual_embed(vis_mod, hf.shared, feats, boxes)
    x = torch.cat([text_emb, vis_emb], dim=1)
    B, L = input_ids.shape
    N = feats.shape[1]
    S = L + N
    attn = (input_ids != cfg.pad_token_id).float()
    mask = torch.cat([attn, torch.ones(B, N)], dim=1)     # [B,S]
    ext = (1.0 - mask)[:, None, None, :] * -1e9
    tb = enc.block[0].layer[0].SelfAttention.compute_bias(L, L)
    bias = tb.new_zeros(1, cfg.num_heads, S, S)
    bias[:, :, :L, :L] = tb
    bias = bias + ext                                      # [B,H,S,S]
    h = x
    for blk in enc.block:
        h = blk(h, attention_mask=None, position_bias=bias)[0]
    h = enc.final_layer_norm(h)
    return h, mask


def torch_full_forward(cfg, hf, vis_mod, d):
    input_ids = torch.tensor(d["input_ids"])
    feats = torch.tensor(d["feats"])
    boxes = torch.tensor(d["boxes"])
    labels = torch.tensor(d["labels"])
    h, mask = torch_joint_encode(cfg, hf, vis_mod, input_ids, feats, boxes)
    L = cfg.max_text_length
    pooled_q = h[:, :L].mean(dim=1)
    pooled_v = h[:, L:].mean(dim=1)
    qv = torch_cosine_retrieve(torch.tensor(d["q_bank"]), pooled_q)
    vv = torch_cosine_retrieve(torch.tensor(d["v_bank"]), pooled_v)
    h_aug = torch.cat([h, qv.unsqueeze(1).detach(), vv.unsqueeze(1).detach()],
                      dim=1)
    B = h.shape[0]
    mask_aug = torch.cat([mask, torch.ones(B, 2)], dim=1)
    out = hf(encoder_outputs=(h_aug,), attention_mask=mask_aug,
             labels=labels)
    logits = out.logits
    # weighted loss recipe, vqa_model.py:46-54
    ce = torch.nn.CrossEntropyLoss(ignore_index=-100, reduction="none")
    nll = ce(logits.view(-1, logits.size(-1)), labels.view(-1)).view(B, -1)
    lm_mask = (labels != -100).float()
    per_seq = (nll * lm_mask).sum(dim=1) / lm_mask.sum(dim=1).clamp(min=1)
    loss = (per_seq * torch.tensor(d["scores"])).mean()
    return h_aug, logits, loss


def jax_full_forward(cfg, params, d):
    proto = ProtoState.create(cfg.n_ques_types, cfg.n_categories,
                              cfg.d_model)._replace(
        q_proto=jnp.asarray(d["q_bank"]), v_proto=jnp.asarray(d["v_bank"]))
    hidden, enc_mask = vlt5.encode(params, cfg, jnp.asarray(d["input_ids"]),
                                   jnp.asarray(d["feats"]),
                                   jnp.asarray(d["boxes"]),
                                   dtype=jnp.float32)
    hidden_aug, mask_aug, _, _ = vlt5.augment(params, cfg, hidden, enc_mask,
                                              proto, proto_update_flag=False)
    logits = vlt5.decode_train(params, cfg, hidden_aug, mask_aug,
                               jnp.asarray(d["labels"]), dtype=jnp.float32)
    loss = vlt5.weighted_lm_loss(logits, jnp.asarray(d["labels"]),
                                 jnp.asarray(d["scores"]))
    return hidden_aug, logits, loss


def test_joint_forward_matches_torch(setup):
    cfg, hf, vis_mod, params, d = setup
    with torch.no_grad():
        t_hidden, t_logits, t_loss = torch_full_forward(cfg, hf, vis_mod, d)
    j_hidden, j_logits, j_loss = jax_full_forward(cfg, params, d)

    np.testing.assert_allclose(np.asarray(j_hidden), t_hidden.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=2e-4, atol=3e-4)
    assert abs(float(j_loss) - float(t_loss)) < 2e-4


def test_visual_embedding_matches_torch(setup):
    cfg, hf, vis_mod, params, d = setup
    from vqacl_tpu.models.visual_embedding import apply_visual_embedding
    with torch.no_grad():
        ref = torch_visual_embed(vis_mod, hf.shared,
                                 torch.tensor(d["feats"]),
                                 torch.tensor(d["boxes"])).numpy()
    ours = apply_visual_embedding(params["visual_embedding"], cfg,
                                  params["shared"],
                                  jnp.asarray(d["feats"]),
                                  jnp.asarray(d["boxes"]))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)
