"""Reference checkpoint (.pth) ingestion: module./vis_encoder. remaps."""

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.models.hf_import import from_state_dict, load_reference_pth
from vqacl_tpu.utils.config import tiny_model_config

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
