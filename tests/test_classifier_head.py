"""Classifier-head extension: learns a tiny answer-classification task."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vqacl_tpu.data.synthetic import SyntheticVQA
from vqacl_tpu.models import vlt5
from vqacl_tpu.models.vlt5 import (classifier_bce_loss, classifier_logits,
                                   init_classifier_head, init_vlt5_params)
from vqacl_tpu.utils.config import tiny_model_config

import pytest

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def test_classifier_head_learns():
    cfg = tiny_model_config()
    n_answers = 8
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg)
    head = init_classifier_head(jax.random.PRNGKey(1), cfg, n_answers)

    data = SyntheticVQA(48, seed=0, feat_dim=cfg.feat_dim,
                        n_boxes=cfg.n_boxes, text_len=cfg.max_text_length,
                        vocab_size=cfg.vocab_size, answer_vocab=n_answers)
    # classification targets: one-hot over the synthetic answer index
    ans_base = min(3000, cfg.vocab_size - n_answers)

    def batch_of(idx):
        from vqacl_tpu.data.collate import collate
        b = collate([data.examples[i] for i in idx], feat_dim=cfg.feat_dim,
                    n_boxes=cfg.n_boxes,
                    max_text_length=cfg.max_text_length)["tensors"]
        tgt = np.zeros((len(idx), n_answers), np.float32)
        for r, i in enumerate(idx):
            tgt[r, data.examples[i]["target_ids"][0] - ans_base] = 1.0
        return {k: jnp.asarray(v) for k, v in b.items()}, jnp.asarray(tgt)

    tx = optax.adam(3e-3)
    opt = tx.init((params, head))

    @jax.jit
    def step(params, head, opt, batch, tgt):
        def loss_fn(ph):
            p, hd = ph
            hidden, mask = vlt5.encode(p, cfg, batch["input_ids"],
                                       batch["vis_feats"], batch["boxes"],
                                       dtype=jnp.float32)
            logits = classifier_logits(hd, cfg, p, hidden, mask)
            return classifier_bce_loss(logits, tgt)

        loss, g = jax.value_and_grad(loss_fn)((params, head))
        updates, opt = tx.update(g, opt)
        params, head = optax.apply_updates((params, head), updates)
        return params, head, opt, loss

    rng = np.random.default_rng(0)
    losses = []
    for ep in range(30):
        order = rng.permutation(48)
        for s in range(0, 48, 16):
            b, t = batch_of(order[s:s + 16])
            params, head, opt, loss = step(params, head, opt, b, t)
        losses.append(float(loss))
    assert losses[-1] < 0.4 * losses[0], losses[::10]

    # eval accuracy above chance
    b, t = batch_of(np.arange(16))
    hidden, mask = vlt5.encode(params, cfg, b["input_ids"], b["vis_feats"],
                               b["boxes"], dtype=jnp.float32)
    logits = classifier_logits(head, cfg, params, hidden, mask)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == jnp.argmax(t, -1)))
    assert acc > 0.4, acc
