"""Beam search: pinned against HF ``generate(num_beams=K)`` token-for-
token on ported weights, plus the score-dominance property vs greedy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.models import t5
from vqacl_tpu.models.generate import beam_search, greedy_decode
from vqacl_tpu.models.t5 import init_t5_params
from vqacl_tpu.utils.config import tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


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


@pytest.mark.parametrize("seed,num_beams", [(0, 5), (1, 5), (2, 3),
                                            (3, 5), (4, 2)])
def test_beam_matches_hf_generate(seed, num_beams):
    """Token-for-token parity with HF ``generate(num_beams=K,
    do_sample=False, early_stopping=False, length_penalty=1.0)`` on
    ported weights — several random tiny models × inputs so the
    finished-pool / is_done / finalize paths all fire."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from vqacl_tpu.models.hf_import import from_state_dict

    cfg = tiny_model_config(vocab_size=48, gen_max_length=8)
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        dropout_rate=0.0, layer_norm_epsilon=cfg.layer_norm_epsilon,
        feed_forward_proj="relu", tie_word_embeddings=True,
        pad_token_id=0, eos_token_id=1, decoder_start_token_id=0)
    torch.manual_seed(seed)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    params = from_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg)

    rng = np.random.default_rng(seed + 100)
    B, L = 4, 7
    ids = rng.integers(2, cfg.vocab_size, size=(B, L))
    attn = np.ones((B, L), np.float32)
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(attn),
                          max_length=cfg.gen_max_length,
                          num_beams=num_beams, do_sample=False,
                          early_stopping=False,
                          length_penalty=1.0).numpy()

    emb = t5.embed_tokens(params["shared"], jnp.asarray(ids), jnp.float32)
    pb = t5.compute_position_bias(
        params["encoder"]["rel_bias"], L, L, True,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias = t5.attention_scores_bias(jnp.asarray(attn)[:, None, None, :], pb)
    enc = t5.encoder_stack(params["encoder"], cfg, emb, bias)
    ours = np.asarray(beam_search(params, cfg, enc, jnp.asarray(attn),
                                  num_beams=num_beams, dtype=jnp.float32))

    T = cfg.gen_max_length - 1
    ref_body = np.zeros((B, T), ref.dtype)       # drop start, pad to T
    ref_body[:, :ref.shape[1] - 1] = ref[:, 1:]
    np.testing.assert_array_equal(ours, ref_body)


def test_beam_score_at_least_greedy(setup):
    cfg, params, enc, mask = setup
    g = np.asarray(greedy_decode(params, cfg, enc, mask, dtype=jnp.float32,
                                 early_stop=False))
    b = np.asarray(beam_search(params, cfg, enc, mask, num_beams=4,
                               length_penalty=0.0, dtype=jnp.float32))
    lp_g = seq_logprob(cfg, params, enc, mask, g)
    lp_b = seq_logprob(cfg, params, enc, mask, b)
    assert np.all(lp_b >= lp_g - 1e-3), (lp_b, lp_g)
