"""Reference checkpoint (.pth) ingestion: module./vis_encoder. remaps."""

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.models.hf_import import from_state_dict, load_reference_pth
from vqacl_tpu.utils.config import tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_vlt5_state_dict(cfg):
    """HF T5 weights + reference visual-embedding tensors, with the
    DDP 'module.' prefix the reference saves (utils.py:63-71)."""
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        dropout_rate=0.0)
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(hf_cfg)
    sd = dict(hf.state_dict())
    d = cfg.d_model
    # reference VisualEmbedding params under the vis_encoder. prefix
    sd["vis_encoder.visual_embedding.feat_embedding.0.weight"] = \
        torch.randn(d, cfg.feat_dim)
    sd["vis_encoder.visual_embedding.feat_embedding.0.bias"] = torch.randn(d)
    sd["vis_encoder.visual_embedding.feat_embedding.1.weight"] = torch.ones(d)
    sd["vis_encoder.visual_embedding.absolute_vis_pos_embedding.0.weight"] = \
        torch.randn(d, cfg.pos_dim + 1)
    sd["vis_encoder.visual_embedding.absolute_vis_pos_embedding.0.bias"] = \
        torch.randn(d)
    sd["vis_encoder.visual_embedding.absolute_vis_pos_embedding.1.weight"] = \
        torch.ones(d)
    sd["vis_encoder.visual_embedding.img_order_embedding.weight"] = \
        torch.randn(cfg.n_images, d)
    return {f"module.{k}": v for k, v in sd.items()}


def test_load_reference_pth(tmp_path):
    cfg = tiny_model_config(vocab_size=64)
    sd = make_vlt5_state_dict(cfg)
    path = str(tmp_path / "q_causal_LAST.pth")
    torch.save(sd, path)

    params = load_reference_pth(path, cfg)
    assert "visual_embedding" in params
    assert params["visual_embedding"]["feat_w"].shape == (cfg.feat_dim,
                                                          cfg.d_model)
    assert params["shared"].shape == (cfg.vocab_size, cfg.d_model)
    # direct-conversion equivalence (prefix stripping is the only delta)
    direct = from_state_dict(
        {k[len("module."):]: v.numpy() for k, v in sd.items()}, cfg)
    np.testing.assert_allclose(
        params["encoder"]["block_0"]["attn"]["wq"],
        direct["encoder"]["block_0"]["attn"]["wq"])
    np.testing.assert_allclose(params["visual_embedding"]["img_order"],
                               direct["visual_embedding"]["img_order"])

    # loaded params drive the model
    from vqacl_tpu.models import vlt5
    rng = np.random.default_rng(0)
    B = 2
    ids = rng.integers(2, cfg.vocab_size, size=(B, cfg.max_text_length))
    feats = rng.normal(size=(B, cfg.n_boxes, cfg.feat_dim)).astype(np.float32)
    boxes = rng.uniform(0, 1, size=(B, cfg.n_boxes, 4)).astype(np.float32)
    h, m = vlt5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(feats),
                       jnp.asarray(boxes))
    assert np.isfinite(np.asarray(h)).all()


def test_export_roundtrip(tmp_path):
    """save_reference_pth is the exact inverse of load_reference_pth:
    pytree -> .pth -> pytree is bit-identical (incl. visual embedding),
    and the exported dict strict-loads into an HF T5 (text part)."""
    import jax

    from vqacl_tpu.models.hf_import import save_reference_pth, to_state_dict
    from vqacl_tpu.models.vlt5 import init_vlt5_params

    cfg = tiny_model_config(vocab_size=64)
    params = jax.tree.map(np.asarray,
                          init_vlt5_params(jax.random.PRNGKey(0), cfg))
    path = str(tmp_path / "q_causal_LAST.pth")
    save_reference_pth(params, path, cfg)

    back = load_reference_pth(path, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for key, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      flat_b[key], err_msg=str(key))

    # the text-model subset strict-loads into HF T5 (reference loads the
    # same keys through trainer_base.py:246-269 with strict=False)
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        dropout_rate=0.0, tie_word_embeddings=True)
    hf = transformers.T5ForConditionalGeneration(hf_cfg)
    full_sd = to_state_dict(params, cfg)
    # reference state_dicts carry the tied obj_order_embedding copy
    # (modeling_t5_our.py:418) — exact key parity for strict loads
    np.testing.assert_array_equal(
        full_sd["encoder.visual_embedding.obj_order_embedding.weight"],
        full_sd["shared.weight"])
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in full_sd.items()
          if not k.startswith("encoder.visual_embedding")}
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert missing == [] and unexpected == []

    # HF forward with the exported weights == our forward numerics
    from vqacl_tpu.models import t5 as t5m
    rng = np.random.default_rng(1)
    B, L = 2, cfg.max_text_length
    ids = rng.integers(2, cfg.vocab_size, size=(B, L))
    dec = rng.integers(2, cfg.vocab_size, size=(B, 4))
    attn = np.ones((B, L), np.float32)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.ones(B, L, dtype=torch.long),
                       decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    emb = t5m.embed_tokens(params["shared"], jnp.asarray(ids), jnp.float32)
    pb = t5m.compute_position_bias(
        params["encoder"]["rel_bias"], L, L, True,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias = t5m.attention_scores_bias(jnp.asarray(attn)[:, None, None, :], pb)
    enc = t5m.encoder_stack(params["encoder"], cfg, emb, bias)
    dec_emb = t5m.embed_tokens(params["shared"], jnp.asarray(dec),
                               jnp.float32)
    seq = t5m.decoder_stack(params["decoder"], cfg, dec_emb, enc,
                            jnp.asarray(attn))
    logits = t5m.lm_logits(params["shared"], seq, cfg.d_model, True)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_reference_prototype_ingest(tmp_path):
    """Q/V_prototype.pt round-trip (vqacl.py:420-426 save, :540-542
    eval-only load): torch.save'd banks -> ProtoState -> identical
    retrieval tokens."""
    from vqacl_tpu.models.hf_import import load_reference_prototypes
    from vqacl_tpu.models.prototype import ProtoState, cosine_retrieve

    d = 16
    rng = np.random.default_rng(7)
    q_bank = rng.normal(size=(10, d)).astype(np.float32)
    v_bank = rng.normal(size=(80, d)).astype(np.float32)
    qp, vp = str(tmp_path / "Q_prototype.pt"), str(tmp_path / "V_prototype.pt")
    torch.save(torch.from_numpy(q_bank.copy()), qp)
    torch.save(torch.from_numpy(v_bank.copy()), vp)

    proto = load_reference_prototypes(ProtoState.create(10, 80, d), qp, vp)
    np.testing.assert_array_equal(np.asarray(proto.q_proto), q_bank)
    np.testing.assert_array_equal(np.asarray(proto.v_proto), v_bank)

    pooled = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    sel, idx, _ = cosine_retrieve(proto.q_proto, pooled)
    sel2, idx2, _ = cosine_retrieve(jnp.asarray(q_bank), pooled)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel2))

    # shape mismatch is rejected, not silently broadcast
    with pytest.raises(ValueError):
        load_reference_prototypes(ProtoState.create(10, 80, d + 1), qp, vp)


def test_trainer_eval_only_proto_ingest(tmp_path):
    """VQACLTrainer.test(load=True) picks up reference .pt banks placed
    in the output dir (the vqacl.py:540-542 eval-only workflow)."""
    import jax

    from vqacl_tpu.cl.tasks import ALL_TASKS
    from vqacl_tpu.cl.trainer import VQACLTrainer
    from vqacl_tpu.data.synthetic_module import SyntheticDataModule
    from vqacl_tpu.data.tokenizer import VLT5Tokenizer
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.checkpoint import save_checkpoint
    from vqacl_tpu.utils.config import Config, tiny_model_config

    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.vocab_size = 32200
    cfg.train.batch_size = 16
    cfg.train.valid_batch_size = 16
    cfg.output = str(tmp_path)
    tok = VLT5Tokenizer()
    data = SyntheticDataModule(tok, tasks=ALL_TASKS[:1],
                               n_train_per_task=16, n_val_per_task=16,
                               n_test_per_task=16,
                               feat_dim=cfg.model.feat_dim,
                               n_boxes=cfg.model.n_boxes)
    trainer = VQACLTrainer(cfg, data, tok, verbose=False,
                           dtype=jnp.float32)
    params = jax.tree.map(np.asarray, init_vlt5_params(
        jax.random.PRNGKey(0), cfg.model))
    proto = ProtoState.create(cfg.model.n_ques_types,
                              cfg.model.n_categories, cfg.model.d_model)
    save_checkpoint(str(tmp_path / f"{ALL_TASKS[0]}_LAST"), params, proto,
                    step=1)
    rng = np.random.default_rng(3)
    q_bank = rng.normal(size=(cfg.model.n_ques_types,
                              cfg.model.d_model)).astype(np.float32)
    v_bank = rng.normal(size=(cfg.model.n_categories,
                              cfg.model.d_model)).astype(np.float32)
    torch.save(torch.from_numpy(q_bank.copy()),
               str(tmp_path / "Q_prototype.pt"))
    torch.save(torch.from_numpy(v_bank.copy()),
               str(tmp_path / "V_prototype.pt"))

    trainer.test(ALL_TASKS[0], load=True)
    got_q = np.asarray(jax.device_get(trainer.state.proto.q_proto))
    np.testing.assert_allclose(got_q, q_bank, rtol=1e-6)


def test_export_pth_cli(tmp_path, capsys):
    """npz checkpoint -> CLI export -> reference .pth -> re-ingest."""
    import jax

    from vqacl_tpu.cli.export_pth import main as export_main
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.checkpoint import save_checkpoint

    cfg = tiny_model_config(vocab_size=64)
    params = jax.tree.map(np.asarray,
                          init_vlt5_params(jax.random.PRNGKey(3), cfg))
    proto = ProtoState.create(10, 80, cfg.d_model)
    proto = proto._replace(q_proto=proto.q_proto + 1.0)  # non-empty bank
    npz = str(tmp_path / "q_recognition_LAST")
    save_checkpoint(npz, params, proto, step=11)

    out = str(tmp_path / "q_recognition_LAST.pth")
    export_main([npz, out])
    printed = capsys.readouterr().out
    assert "step 11" in printed
    # non-empty prototype banks trigger the not-carried-over notice
    assert "prototype" in printed

    back = load_reference_pth(out, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["block_0"]["cross_attn"]["wo"],
                   np.float32),
        back["decoder"]["block_0"]["cross_attn"]["wo"])
    np.testing.assert_array_equal(
        np.asarray(params["visual_embedding"]["feat_w"], np.float32),
        back["visual_embedding"]["feat_w"])
