"""BART numerics vs HuggingFace BartForConditionalGeneration."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.models.bart import (bart_decode_train, bart_encode,
                                   bart_from_state_dict, init_bart_params)
from vqacl_tpu.utils.config import tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@dataclasses.dataclass
class BartCfg:
    vocab_size: int = 128
    d_model: int = 32
    num_heads: int = 4
    d_ff: int = 64
    num_layers: int = 2
    num_decoder_layers: int = 2
    dropout_rate: float = 0.0
    max_position_embeddings: int = 64
    pad_token_id: int = 1
    eos_token_id: int = 2
    decoder_start_token_id: int = 2
    feat_dim: int = 16
    pos_dim: int = 4
    n_images: int = 2
    use_vis_order_embedding: bool = False
    use_vis_layer_norm: bool = True
    individual_vis_layer_norm: bool = True
    layer_norm_epsilon: float = 1e-5
    use_vision: bool = True


@pytest.fixture(scope="module")
def pair():
    cfg = BartCfg()
    hf_cfg = transformers.BartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        encoder_layers=cfg.num_layers, decoder_layers=cfg.num_decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.d_ff, decoder_ffn_dim=cfg.d_ff,
        max_position_embeddings=cfg.max_position_embeddings,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu", pad_token_id=1, bos_token_id=0,
        eos_token_id=2, decoder_start_token_id=2, forced_eos_token_id=None,
        scale_embedding=False, tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = bart_from_state_dict(sd, cfg)
    return cfg, hf, params


def test_bart_logits_match(pair):
    cfg, hf, params = pair
    rng = np.random.default_rng(0)
    B, L, T = 2, 9, 5
    ids = rng.integers(3, cfg.vocab_size, size=(B, L))
    ids[1, 7:] = 1
    attn = (ids != 1).astype(np.float32)
    labels = rng.integers(3, cfg.vocab_size, size=(B, T))
    labels[0, 3:] = -100

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(attn),
                 labels=torch.tensor(labels))
    enc, mask = bart_encode(params, cfg, jnp.asarray(ids),
                            jnp.asarray(attn))
    logits = bart_decode_train(params, cfg, enc, mask, jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_vl_bart_forward_shapes(pair):
    cfg, _, params = pair
    import jax

    # add visual embedding params (not in the HF checkpoint)
    from vqacl_tpu.models.visual_embedding import init_visual_embedding
    params = dict(params)
    params["visual_embedding"] = init_visual_embedding(
        jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    B, L, N = 2, 6, 4
    ids = rng.integers(3, cfg.vocab_size, size=(B, L))
    feats = rng.normal(size=(B, N, cfg.feat_dim)).astype(np.float32)
    boxes = rng.uniform(0, 1, size=(B, N, 4)).astype(np.float32)
    enc, mask = bart_encode(params, cfg, jnp.asarray(ids),
                            vis_feats=jnp.asarray(feats),
                            boxes=jnp.asarray(boxes))
    assert enc.shape == (B, L + N, cfg.d_model)
    assert mask.shape == (B, L + N)
    labels = rng.integers(3, cfg.vocab_size, size=(B, 4))
    logits = bart_decode_train(params, cfg, enc, mask, jnp.asarray(labels))
    assert logits.shape == (B, 4, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
