"""Numerics parity of the from-scratch T5 vs HuggingFace T5 (torch CPU).

Strategy (SURVEY.md §4b): random-init a tiny HF T5 with the same
architecture, port its weights via hf_import, and require logit
agreement on identical inputs. This pins down the subtle T5 details
(RMS norm, unscaled attention, relative-position buckets, tied-head
rescale, shift_right) without copying any reference code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.models import t5
from vqacl_tpu.models.hf_import import from_state_dict
from vqacl_tpu.utils.config import tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    cfg = tiny_model_config(vocab_size=64)
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        dropout_rate=0.0, layer_norm_epsilon=cfg.layer_norm_epsilon,
        feed_forward_proj="relu", tie_word_embeddings=True,
        pad_token_id=0, eos_token_id=1, decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = from_state_dict(sd, cfg)
    return cfg, hf, params


def test_encoder_decoder_logits_match(hf_pair):
    cfg, hf, params = hf_pair
    rng = np.random.default_rng(1)
    B, L, T = 3, 7, 5
    input_ids = rng.integers(2, cfg.vocab_size, size=(B, L))
    input_ids[1, 5:] = 0  # pad some
    labels = rng.integers(2, cfg.vocab_size, size=(B, T))
    labels[2, 3:] = -100
    attn = (input_ids != 0).astype(np.float32)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(input_ids),
                 attention_mask=torch.tensor(attn),
                 labels=torch.tensor(labels))
    ref_logits = out.logits.numpy()

    # ours: encoder over token embeds w/ standard T5 bias, then decode
    emb = t5.embed_tokens(params["shared"], jnp.asarray(input_ids), jnp.float32)
    pb = t5.compute_position_bias(
        params["encoder"]["rel_bias"], L, L, True,
        cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
    bias = t5.attention_scores_bias(jnp.asarray(attn)[:, None, None, :], pb)
    enc = t5.encoder_stack(params["encoder"], cfg, emb, bias)

    dec_ids = t5.shift_right(jnp.asarray(labels), cfg.decoder_start_token_id,
                             cfg.pad_token_id)
    dec_emb = t5.embed_tokens(params["shared"], dec_ids, jnp.float32)
    seq = t5.decoder_stack(params["decoder"], cfg, dec_emb, enc,
                           jnp.asarray(attn))
    logits = t5.lm_logits(params["shared"], seq, cfg.d_model, True)

    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=2e-4, atol=2e-4)


def test_loss_matches_hf(hf_pair):
    cfg, hf, params = hf_pair
    rng = np.random.default_rng(2)
    B, L, T = 2, 6, 4
    input_ids = rng.integers(2, cfg.vocab_size, size=(B, L))
    labels = rng.integers(2, cfg.vocab_size, size=(B, T))
    labels[0, 2:] = -100
    attn = np.ones((B, L), np.float32)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(input_ids),
                 attention_mask=torch.tensor(attn),
                 labels=torch.tensor(labels))

    emb = t5.embed_tokens(params["shared"], jnp.asarray(input_ids), jnp.float32)
    pb = t5.compute_position_bias(
        params["encoder"]["rel_bias"], L, L, True,
        cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
    bias = t5.attention_scores_bias(jnp.asarray(attn)[:, None, None, :], pb)
    enc = t5.encoder_stack(params["encoder"], cfg, emb, bias)
    dec_ids = t5.shift_right(jnp.asarray(labels), 0, 0)
    dec_emb = t5.embed_tokens(params["shared"], dec_ids, jnp.float32)
    seq = t5.decoder_stack(params["decoder"], cfg, dec_emb, enc,
                           jnp.asarray(attn))
    logits = t5.lm_logits(params["shared"], seq, cfg.d_model, True)

    from vqacl_tpu.models.vlt5 import token_cross_entropy
    nll, mask = token_cross_entropy(logits, jnp.asarray(labels))
    mean_loss = float(nll.sum() / mask.sum())  # HF CE ignore_index mean
    assert abs(mean_loss - float(out.loss)) < 2e-4


def test_greedy_decode_matches_hf_generate(hf_pair):
    cfg, hf, params = hf_pair
    rng = np.random.default_rng(3)
    B, L = 2, 7
    input_ids = rng.integers(2, cfg.vocab_size, size=(B, L))
    attn = np.ones((B, L), np.float32)

    with torch.no_grad():
        hf_tokens = hf.generate(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attn),
            max_length=cfg.gen_max_length, num_beams=1, do_sample=False,
        ).numpy()

    emb = t5.embed_tokens(params["shared"], jnp.asarray(input_ids), jnp.float32)
    pb = t5.compute_position_bias(
        params["encoder"]["rel_bias"], L, L, True,
        cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
    bias = t5.attention_scores_bias(jnp.asarray(attn)[:, None, None, :], pb)
    enc = t5.encoder_stack(params["encoder"], cfg, emb, bias)

    from vqacl_tpu.models.generate import greedy_decode
    ours = np.asarray(greedy_decode(params, cfg, enc, jnp.asarray(attn),
                                    dtype=jnp.float32))
    # HF output includes leading decoder_start (0); compare the rest.
    # After EOS both pad; HF may stop earlier — compare up to min length.
    ref = hf_tokens[:, 1:]
    n = min(ref.shape[1], ours.shape[1])
    for b in range(B):
        for t in range(n):
            assert ours[b, t] == ref[b, t], (b, t, ours[b], ref[b])
            if ref[b, t] == cfg.eos_token_id:
                break
