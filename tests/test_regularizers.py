"""EWC / MAS parameter-importance regularizers (cl/regularizers.py).

These are the paper's Table-1 comparison baselines (BASELINE.md rows
EWC / MAS) that the reference repo does not implement. Tests pin the
penalty math, the importance estimates against independently computed
gradients, the anchor-pull effect inside the compiled train step, and
the trainer-level consolidation loop end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.cl import regularizers as R
from vqacl_tpu.data.synthetic import SyntheticVQA
from vqacl_tpu.models import vlt5
from vqacl_tpu.models.prototype import ProtoState
from vqacl_tpu.models.vlt5 import init_vlt5_params
from vqacl_tpu.train.optim import make_transform
from vqacl_tpu.train.state import TrainState
from vqacl_tpu.train.step import make_train_step
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def tiny_cfg():
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 16
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    proto = ProtoState.create(cfg.model.n_ques_types,
                              cfg.model.n_categories, cfg.model.d_model)
    data = SyntheticVQA(32, seed=0, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    batch = next(iter(data.batches(16, seed=0)))["tensors"]
    return cfg, params, proto, batch


def test_penalty_math():
    p = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([[3.0]])}
    reg = R.RegState(
        omega={"a": jnp.asarray([2.0, 0.5]), "b": jnp.asarray([[4.0]])},
        anchor={"a": jnp.asarray([0.0, 1.0]), "b": jnp.asarray([[5.0]])})
    want = 2.0 * 1.0 + 0.5 * 1.0 + 4.0 * 4.0
    assert float(R.penalty(p, reg)) == pytest.approx(want)


def test_init_reg_state_inert(setup):
    _, params, _, _ = setup
    reg = R.init_reg_state(params)
    assert float(R.penalty(params, reg)) == 0.0
    moved = jax.tree.map(lambda p: p + 1.0, params)
    assert float(R.penalty(moved, reg)) == 0.0  # omega zero => still inert


@pytest.mark.parametrize("kind", ["ewc", "mas"])
def test_importance_matches_direct_grad(setup, kind):
    """The jitted accumulate step == |grad| / grad² of the same
    objective computed independently here (retrieval-only forward)."""
    cfg, params, proto, batch = setup
    mcfg = cfg.model

    def objective(p):
        hidden, enc_mask = vlt5.encode(
            p, mcfg, batch["input_ids"], batch["vis_feats"],
            batch["boxes"], deterministic=True, dtype=jnp.float32)
        if mcfg.use_prototype:
            hidden, enc_mask, _, _ = vlt5.augment(
                p, mcfg, hidden, enc_mask, proto, proto_update_flag=False)
        logits = vlt5.decode_train(p, mcfg, hidden, enc_mask,
                                   batch["target_ids"], deterministic=True,
                                   dtype=jnp.float32)
        if kind == "ewc":
            return vlt5.weighted_lm_loss(logits, batch["target_ids"],
                                         batch["scores"])
        mask = (batch["target_ids"] != -100).astype(jnp.float32)
        sq = jnp.sum(logits.astype(jnp.float32) ** 2, axis=-1)
        return jnp.sum(sq * mask) / jnp.maximum(mask.sum(), 1.0)

    g = jax.grad(objective)(params)
    want = jax.tree.map(
        (lambda x: x * x) if kind == "ewc" else jnp.abs, g)

    step = R.make_importance_step(cfg, kind, dtype=jnp.float32)
    acc = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
    acc = step(acc, params, proto, batch)
    got_l, want_l = jax.tree.leaves(acc), jax.tree.leaves(want)
    assert len(got_l) == len(want_l)
    for a, b in zip(got_l, want_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
        assert np.all(np.asarray(a) >= 0)

    # additive across calls (the per-task mean divides in consolidate)
    acc2 = step(acc, params, proto, batch)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(acc2)[0]),
                               2 * np.asarray(want_l[0]), rtol=2e-4,
                               atol=1e-6)


def test_unknown_kind_rejected(setup):
    cfg = setup[0]
    with pytest.raises(ValueError, match="unknown regularizer"):
        R.make_importance_step(cfg, "si")


def test_consolidate_accumulates_and_reanchors(setup):
    _, params, _, _ = setup
    reg = R.init_reg_state(params)
    ones = jax.tree.map(lambda p: jnp.ones_like(p, jnp.float32), params)
    moved = jax.tree.map(lambda p: p + 1.0, params)
    reg = R.consolidate(reg, moved, ones, n_batches=4)
    leaf = jax.tree.leaves(reg.omega)[0]
    np.testing.assert_allclose(np.asarray(leaf), 0.25)   # mean over 4
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(reg.anchor)[0]),
        np.asarray(jax.tree.leaves(moved)[0], np.float32))
    # second task adds on top of the first
    reg = R.consolidate(reg, moved, ones, n_batches=2)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(reg.omega)[0]), 0.75)


def test_penalty_pulls_params_to_anchor(setup):
    """Inside the compiled train step a large λ must keep the params
    near the anchor; λ=0 must reproduce the unregularized trajectory."""
    cfg, params, proto, batch = setup
    tx = make_transform(cfg.train)

    def drift(reg_lambda, reg):
        state = TrainState.create(params, tx, proto, jax.random.PRNGKey(1),
                                  warmup_iters=0.0, t_total=100.0)
        step = make_train_step(cfg, tx, dtype=jnp.float32,
                               reg_lambda=reg_lambda, donate=False)
        for _ in range(5):
            state, _ = step(state, batch, reg)
        sq = jax.tree.map(lambda a, b: jnp.sum((a.astype(jnp.float32) -
                                                b.astype(jnp.float32)) ** 2),
                          state.params, params)
        return float(jnp.sqrt(jax.tree.reduce(jnp.add, sq))), state

    reg = R.RegState(
        omega=jax.tree.map(lambda p: jnp.ones_like(p, jnp.float32), params),
        anchor=jax.tree.map(lambda p: p.astype(jnp.float32), params))
    d_free, s_free = drift(0.0, reg)
    d_anchored, _ = drift(1e4, reg)
    assert d_anchored < 0.2 * d_free, (d_anchored, d_free)

    # λ=0 with a reg argument == the plain unregularized step
    step_plain = make_train_step(cfg, tx, dtype=jnp.float32, donate=False)
    state = TrainState.create(params, tx, proto, jax.random.PRNGKey(1),
                              warmup_iters=0.0, t_total=100.0)
    for _ in range(5):
        state, _ = step_plain(state, batch)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(s_free.params)[0]), rtol=1e-6)


@pytest.mark.parametrize("kind", ["ewc", "mas"])
def test_trainer_consolidation_e2e(tmp_path, kind):
    """Two-task CL run with --cl_reg: consolidation fires per task,
    omega grows, anchor tracks the trained params, and the loop still
    produces the full metric set."""
    from vqacl_tpu.cl.trainer import VQACLTrainer
    from vqacl_tpu.data.synthetic_module import SyntheticDataModule
    from vqacl_tpu.data.tokenizer import VLT5Tokenizer

    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.vocab_size = 32200
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 16
    cfg.train.valid_batch_size = 16
    cfg.train.epochs = 1
    cfg.train.memory = False
    cfg.model.use_prototype = False
    cfg.train.cl_reg = kind
    cfg.train.reg_lambda = 10.0
    cfg.train.fisher_batches = 3
    cfg.output = str(tmp_path)

    tok = VLT5Tokenizer()
    data = SyntheticDataModule(tok, tasks=["q_recognition", "q_location"],
                               n_train_per_task=64, n_val_per_task=16,
                               n_test_per_task=16,
                               feat_dim=cfg.model.feat_dim,
                               n_boxes=cfg.model.n_boxes,
                               answer_vocab=4, seed=0)
    trainer = VQACLTrainer(cfg, data, tok, verbose=False, dtype=jnp.float32)
    metrics = trainer.train()
    assert "Avg_acc" in metrics and "Avg_forget" in metrics
    omega_sum = float(jax.tree.reduce(
        jnp.add, jax.tree.map(jnp.sum, trainer._reg.omega)))
    assert omega_sum > 0.0
    anchor0 = jax.tree.leaves(trainer._reg.anchor)[0]
    param0 = jax.tree.leaves(trainer.state.params)[0]
    np.testing.assert_allclose(np.asarray(anchor0),
                               np.asarray(param0, np.float32), rtol=1e-6)
