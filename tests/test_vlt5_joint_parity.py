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

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)

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


def test_joint_backward_matches_torch(setup):
    """Gradient parity of the FULL joint path through the production
    ``fused_head_loss`` custom VJP: visual-embedding Linears + LNs,
    encoder/decoder rel-bias tables, attention projections, and the tied
    shared embedding (embed + obj-order + LM-head uses all accumulate)
    against torch autograd on the transcribed model."""
    import jax

    cfg, hf, vis_mod, params, d = setup
    hf.zero_grad(set_to_none=False)
    vis_mod.zero_grad(set_to_none=False)
    _, _, t_loss = torch_full_forward(cfg, hf, vis_mod, d)
    t_loss.backward()

    labels = jnp.asarray(d["labels"])
    scores = jnp.asarray(d["scores"])
    proto = ProtoState.create(cfg.n_ques_types, cfg.n_categories,
                              cfg.d_model)._replace(
        q_proto=jnp.asarray(d["q_bank"]), v_proto=jnp.asarray(d["v_bank"]))

    def loss_fn(p):
        hidden, enc_mask = vlt5.encode(p, cfg, jnp.asarray(d["input_ids"]),
                                       jnp.asarray(d["feats"]),
                                       jnp.asarray(d["boxes"]),
                                       dtype=jnp.float32)
        hidden_aug, mask_aug, _, _ = vlt5.augment(
            p, cfg, hidden, enc_mask, proto, proto_update_flag=False)
        seq = vlt5.decode_hidden(p, cfg, hidden_aug, mask_aug, labels,
                                 dtype=jnp.float32)
        return vlt5.fused_head_loss(seq, p["shared"], labels, scores,
                                    cfg.d_model ** -0.5)

    g = jax.grad(loss_fn)(params)

    def t_grad(mod_param):
        return mod_param.grad.detach().numpy()

    pairs = [
        (g["shared"], t_grad(hf.shared.weight), "shared"),
        (g["visual_embedding"]["feat_w"],
         t_grad(vis_mod.feat_embedding[0].weight).T, "feat_w"),
        (g["visual_embedding"]["feat_b"],
         t_grad(vis_mod.feat_embedding[0].bias), "feat_b"),
        (g["visual_embedding"]["feat_ln"],
         t_grad(vis_mod.feat_embedding[1].weight), "feat_ln"),
        (g["visual_embedding"]["pos_w"],
         t_grad(vis_mod.absolute_vis_pos_embedding[0].weight).T, "pos_w"),
        (g["encoder"]["rel_bias"],
         t_grad(hf.encoder.block[0].layer[0]
                .SelfAttention.relative_attention_bias.weight), "enc_bias"),
        (g["decoder"]["rel_bias"],
         t_grad(hf.decoder.block[0].layer[0]
                .SelfAttention.relative_attention_bias.weight), "dec_bias"),
        (g["encoder"]["block_0"]["attn"]["wq"],
         t_grad(hf.encoder.block[0].layer[0].SelfAttention.q.weight).T,
         "enc0_wq"),
        (g["encoder"]["block_1"]["mlp"]["wi"],
         t_grad(hf.encoder.block[1].layer[1].DenseReluDense.wi.weight).T,
         "enc1_wi"),
        (g["decoder"]["block_1"]["cross_attn"]["wv"],
         t_grad(hf.decoder.block[1].layer[1].EncDecAttention.v.weight).T,
         "dec1_cross_wv"),
        (g["decoder"]["block_0"]["ln1"],
         t_grad(hf.decoder.block[0].layer[0].layer_norm.weight), "dec0_ln1"),
    ]
    for ours, ref, name in pairs:
        scale = max(np.abs(ref).max(), 1e-8)
        np.testing.assert_allclose(np.asarray(ours) / scale, ref / scale,
                                   rtol=2e-3, atol=2e-5, err_msg=name)


def _torch_forward_noproto(cfg, hf, vis_mod, input_ids, feats, boxes,
                           labels, scores):
    """Joint forward without prototype concat (trajectory harness: the
    prototype EMA algebra is pinned separately in test_prototype.py)."""
    h, mask = torch_joint_encode(cfg, hf, vis_mod, input_ids, feats, boxes)
    out = hf(encoder_outputs=(h,), attention_mask=mask, labels=labels)
    B = h.shape[0]
    ce = torch.nn.CrossEntropyLoss(ignore_index=-100, reduction="none")
    nll = ce(out.logits.view(-1, out.logits.size(-1)),
             labels.view(-1)).view(B, -1)
    lm_mask = (labels != -100).float()
    per_seq = (nll * lm_mask).sum(dim=1) / lm_mask.sum(dim=1).clamp(min=1)
    return (per_seq * scores).mean()


def _hf_adamw_references_step(named_params, opt_state, lr, wd_default,
                              b1=0.9, b2=0.999, eps=1e-6, clip=5.0):
    """One reference optimizer step: clip-5 global norm (vqacl.py:475)
    then HF-4.2.1 AdamW (trainer_base.py:137,188): m/v EMA, bias
    correction folded into step size (ε added to the *uncorrected* √v),
    decoupled weight decay applied to the post-Adam params, no_decay =
    names containing 'bias' (the 'LayerNorm.weight' entry never matches
    T5's lowercase naming)."""
    import math as _math

    torch.nn.utils.clip_grad_norm_([p for _, p in named_params], clip)
    with torch.no_grad():
        for name, p in named_params:
            if p.grad is None:
                continue
            st = opt_state.setdefault(name, {
                "t": 0, "m": torch.zeros_like(p), "v": torch.zeros_like(p)})
            st["t"] += 1
            g = p.grad
            st["m"].mul_(b1).add_(g, alpha=1 - b1)
            st["v"].mul_(b2).addcmul_(g, g, value=1 - b2)
            denom = st["v"].sqrt().add_(eps)
            step_size = lr * _math.sqrt(1 - b2 ** st["t"]) / (1 - b1 ** st["t"])
            p.addcdiv_(st["m"], denom, value=-step_size)
            wd = 0.0 if "bias" in name else wd_default
            if wd > 0:
                p.add_(p, alpha=-lr * wd)


def test_train_trajectory_matches_torch(setup):
    """3-5 optimizer steps of the FULL train recipe — clip 5, HF AdamW
    groups (eps 1e-6), constant-with-warmup schedule incl. the zero
    first step — on identical data: the loss trajectory and final params
    must match torch within f32 noise. This is the strongest Table-1
    surrogate available without the real Partition_Q artifacts."""
    import copy

    import jax

    from vqacl_tpu.models.prototype import ProtoState as PS
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_train_step
    from vqacl_tpu.utils.config import Config, TrainConfig

    cfg, hf0, vis0, params, d = setup
    hf = copy.deepcopy(hf0).train()
    vis_mod = copy.deepcopy(vis0).train()
    for p in list(hf.parameters()) + list(vis_mod.parameters()):
        p.requires_grad_(True)

    LR, WD, WARMUP, T_TOTAL, STEPS = 1e-3, 0.01, 2.0, 20.0, 5

    # --- torch side ---
    named = ([(f"__vis__.{n}", p) for n, p in vis_mod.named_parameters()]
             + [(n, p) for n, p in hf.named_parameters()
                if n != "lm_head.weight"])        # tied to shared.weight
    opt_state: dict = {}
    t_losses = []
    input_ids = torch.tensor(d["input_ids"])
    feats = torch.tensor(d["feats"])
    boxes = torch.tensor(d["boxes"])
    labels_t = torch.tensor(d["labels"])
    scores_t = torch.tensor(d["scores"])
    for k in range(STEPS):
        for _, p in named:
            p.grad = None
        loss = _torch_forward_noproto(cfg, hf, vis_mod, input_ids, feats,
                                      boxes, labels_t, scores_t)
        loss.backward()
        factor = k / WARMUP if k < WARMUP else 1.0   # HF lr_lambda
        _hf_adamw_references_step(named, opt_state, LR * factor, WD)
        t_losses.append(float(loss.detach()))

    # --- jax side: the production compiled train step ---
    full = Config()
    full.model = copy.deepcopy(cfg)
    full.model.dropout_rate = 0.0
    full.train = TrainConfig(lr=LR, weight_decay=WD, clip_grad_norm=5.0,
                             adam_eps=1e-6, seed=1,
                             # bit-exact torch-AdamW trajectory parity
                             # needs f32 moments (the production default
                             # is bf16 storage — test_optim covers the
                             # drift bound)
                             adam_dtype="float32")
    tx = make_transform(full.train)
    proto = PS.create(cfg.n_ques_types, cfg.n_categories, cfg.d_model)
    state = TrainState.create(
        jax.tree.map(jnp.asarray, params), tx, proto,
        jax.random.PRNGKey(0), warmup_iters=WARMUP, t_total=T_TOTAL)
    step = make_train_step(full, tx, dtype=jnp.float32,
                           use_prototype=False, donate=False)
    batch = {
        "input_ids": jnp.asarray(d["input_ids"]),
        "vis_feats": jnp.asarray(d["feats"]),
        "boxes": jnp.asarray(d["boxes"]),
        "target_ids": jnp.asarray(d["labels"]),
        "scores": jnp.asarray(d["scores"]),
        "ques_labels": jnp.zeros((4, cfg.n_ques_types), jnp.float32),
        "cate_labels": jnp.zeros((4, cfg.n_categories), jnp.float32),
    }
    j_losses = []
    for k in range(STEPS):
        state, metrics = step(state, batch)
        j_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    # final params too — catches compensating errors the loss can hide
    final_pairs = [
        (state.params["shared"], hf.shared.weight, "shared"),
        (state.params["encoder"]["block_0"]["attn"]["wq"],
         hf.encoder.block[0].layer[0].SelfAttention.q.weight.T, "wq"),
        (state.params["encoder"]["block_0"]["ln1"],
         hf.encoder.block[0].layer[0].layer_norm.weight, "ln1"),
        (state.params["visual_embedding"]["feat_w"],
         vis_mod.feat_embedding[0].weight.T, "feat_w"),
        (state.params["decoder"]["rel_bias"],
         hf.decoder.block[0].layer[0]
         .SelfAttention.relative_attention_bias.weight, "dec_rel_bias"),
    ]
    for ours, ref, name in final_pairs:
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.detach().numpy(),
                                   rtol=5e-4, atol=5e-6, err_msg=name)


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
