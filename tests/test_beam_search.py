"""Beam search: k=1 ≡ greedy; k>1 never scores worse than greedy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.models import t5
from vqacl_tpu.models.generate import beam_search, greedy_decode
from vqacl_tpu.models.t5 import init_t5_params
from vqacl_tpu.utils.config import tiny_model_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(vocab_size=64)
    params = init_t5_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, L = 3, 7
    ids = rng.integers(2, 64, size=(B, L))
    attn = np.ones((B, L), np.float32)
    emb = t5.embed_tokens(params["shared"], jnp.asarray(ids), jnp.float32)
    pb = t5.compute_position_bias(
        params["encoder"]["rel_bias"], L, L, True,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias = t5.attention_scores_bias(jnp.asarray(attn)[:, None, None, :], pb)
    enc = t5.encoder_stack(params["encoder"], cfg, emb, bias)
    return cfg, params, enc, jnp.asarray(attn)


def seq_logprob(cfg, params, enc, mask, tokens):
    """Teacher-forced log-prob of a generated sequence (up to EOS)."""
    tokens = np.asarray(tokens)
    B, T = tokens.shape
    dec_in = np.concatenate(
        [np.zeros((B, 1), np.int64), tokens[:, :-1]], axis=1)
    emb = t5.embed_tokens(params["shared"], jnp.asarray(dec_in), jnp.float32)
    seq = t5.decoder_stack(params["decoder"], cfg, emb, enc, mask)
    logits = t5.lm_logits(params["shared"], seq, cfg.d_model, True)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    total = np.zeros(B)
    for b in range(B):
        for t_ in range(T):
            total[b] += logp[b, t_, tokens[b, t_]]
            if tokens[b, t_] == cfg.eos_token_id:
                break
        else:
            continue
    return total


def test_beam1_equals_greedy(setup):
    cfg, params, enc, mask = setup
    g = np.asarray(greedy_decode(params, cfg, enc, mask, dtype=jnp.float32,
                                 early_stop=False))
    b1 = np.asarray(beam_search(params, cfg, enc, mask, num_beams=1,
                                dtype=jnp.float32))
    np.testing.assert_array_equal(g, b1)


def test_beam_score_at_least_greedy(setup):
    cfg, params, enc, mask = setup
    g = np.asarray(greedy_decode(params, cfg, enc, mask, dtype=jnp.float32,
                                 early_stop=False))
    b = np.asarray(beam_search(params, cfg, enc, mask, num_beams=4,
                               length_penalty=0.0, dtype=jnp.float32))
    lp_g = seq_logprob(cfg, params, enc, mask, g)
    lp_b = seq_logprob(cfg, params, enc, mask, b)
    assert np.all(lp_b >= lp_g - 1e-3), (lp_b, lp_g)
