"""DER / DER++ (dark experience replay) — Table-1 comparison method.

Covers: logit capture at buffer insert (pinned targets), collate of the
stored-logit tensor, the distillation replay step (MSE falls toward the
stored logits), and the full CL loop under --cl_reg der/derpp.
The reference repo implements neither (its replay is plain ER,
vqacl.py:371-373); see train/step.py::make_der_replay_step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.cl.trainer import VQACLTrainer
from vqacl_tpu.data.collate import collate
from vqacl_tpu.data.synthetic_module import SyntheticDataModule
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def _cfg(out, reg="der", use_prototype=False):
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.vocab_size = 32200   # real id space (tokenizer hashes words)
    cfg.model.use_prototype = use_prototype
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 16
    cfg.train.valid_batch_size = 16
    cfg.train.epochs = 1
    cfg.train.m_size = 40
    cfg.train.memory = True
    cfg.train.cl_reg = reg
    cfg.train.reg_lambda = 0.5
    cfg.output = str(out)
    return cfg


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    out = tmp_path_factory.mktemp("snap_der")
    cfg = _cfg(out, reg="der")
    tok = VLT5Tokenizer()
    tasks = ["q_recognition", "q_location", "q_judge"]
    data = SyntheticDataModule(tok, tasks=tasks, n_train_per_task=64,
                               n_val_per_task=16, n_test_per_task=16,
                               feat_dim=cfg.model.feat_dim,
                               n_boxes=cfg.model.n_boxes,
                               answer_vocab=4, seed=0)
    trainer = VQACLTrainer(cfg, data, tok, verbose=False,
                           dtype=jnp.float32)
    metrics = trainer.train()
    return cfg, trainer, metrics


def test_buffer_items_carry_logits(run):
    _, trainer, _ = run
    items = trainer.buffer.all_examplars()
    assert len(items) > 0
    T = trainer.cfg.model.target_max_length
    V = trainer.cfg.model.vocab_size
    for d in items:
        assert d["der_logits"].shape == (T, V)
        assert d["der_logits"].dtype == np.float16
        assert len(d["der_target_ids"]) == T
        # pinned target is consistent with the stored logits' geometry:
        # at least one real (non -100) token
        assert any(t != -100 for t in d["der_target_ids"])


def test_example_pins_target(run):
    """Replay examples must reuse the capture-time target — re-sampling
    the multinomial answer would misalign the stored logits."""
    _, trainer, _ = run
    items = trainer.buffer.all_examplars()
    ds = trainer.data.make_dataset(items, mode="train", task_idx=0)
    for i in range(min(8, len(items))):
        ex1 = ds.example(i)
        ex2 = ds.example(i)
        assert ex1["target_ids"] == items[i]["der_target_ids"]
        assert ex1["target_ids"] == ex2["target_ids"]
        assert "der_logits" in ex1


def test_collate_stacks_der_logits(run):
    _, trainer, _ = run
    items = trainer.buffer.all_examplars()
    ds = trainer.data.make_dataset(items, mode="train", task_idx=0)
    exs = [ds.example(i) for i in range(4)]
    m = trainer.cfg.model
    b = collate(exs, max_text_length=m.max_text_length, n_boxes=m.n_boxes,
                target_max_length=m.target_max_length, feat_dim=m.feat_dim,
                pad_to_batch=8)["tensors"]
    assert b["der_logits"].shape == (8, m.target_max_length, m.vocab_size)
    assert b["der_logits"].dtype == np.float16
    np.testing.assert_array_equal(b["der_logits"][0],
                                  exs[0]["der_logits"])
    assert not b["der_logits"][4:].any()   # pad rows zero


def test_result_matrix_and_metrics(run):
    _, trainer, metrics = run
    res = trainer.result_matrix.to_dict()
    assert res["q_judge"]["q_recognition"] >= 0
    assert "Avg_acc" in metrics and "Avg_forget" in metrics


def test_der_step_reduces_mse(tmp_path):
    """The distillation gradient actually pulls the logits toward the
    stored ones: repeated DER steps on one batch shrink the masked MSE."""
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_der_replay_step, make_logits_step

    cfg = _cfg(tmp_path, reg="der")
    cfg.model.vocab_size = 64
    cfg.train.reg_lambda = 1.0
    m = cfg.model
    rng = np.random.default_rng(0)
    B, L, N, T = 8, m.max_text_length, m.n_boxes, m.target_max_length
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(1, 50, size=(B, L)), jnp.int32),
        "vis_feats": jnp.asarray(
            rng.normal(size=(B, N, m.feat_dim)), jnp.float32),
        "boxes": jnp.asarray(rng.uniform(0, 1, size=(B, N, 4)), jnp.float32),
        "target_ids": jnp.asarray(
            np.where(np.arange(T)[None] < 3,
                     rng.integers(1, 50, size=(B, T)), -100), jnp.int32),
        "scores": jnp.ones((B,), jnp.float32),
        "ques_labels": jnp.zeros((B, 10), jnp.float32),
        "cate_labels": jnp.zeros((B, 80), jnp.float32),
    }
    # teacher = a different random init: its logits are the stored target
    teacher = init_vlt5_params(jax.random.PRNGKey(7), m)
    proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)
    zfn = make_logits_step(cfg, dtype=jnp.float32, use_prototype=False)
    z = zfn(teacher, proto, batch)
    batch["der_logits"] = z.astype(jnp.float16)

    params = init_vlt5_params(jax.random.PRNGKey(0), m)
    tx = make_transform(cfg.train)
    state = TrainState.create(params, tx, proto,
                              jax.random.key(1, impl="rbg"),
                              warmup_iters=0.0, t_total=100.0)
    step = make_der_replay_step(cfg, tx, dtype=jnp.float32,
                                use_prototype=False, donate=False)
    _, m0 = step(state, batch)
    for _ in range(30):
        state, mtr = step(state, batch)
    assert float(mtr["der_mse"]) < 0.5 * float(m0["der_mse"]), \
        (float(m0["der_mse"]), float(mtr["der_mse"]))


def test_derpp_adds_ce(tmp_path):
    """DER++ loss = α·MSE + β·CE > α·MSE alone on the same batch/state."""
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_der_replay_step

    cfg = _cfg(tmp_path, reg="der")
    cfg.model.vocab_size = 64
    m = cfg.model
    rng = np.random.default_rng(1)
    B, L, N, T = 4, m.max_text_length, m.n_boxes, m.target_max_length
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(1, 50, size=(B, L)), jnp.int32),
        "vis_feats": jnp.asarray(
            rng.normal(size=(B, N, m.feat_dim)), jnp.float32),
        "boxes": jnp.asarray(rng.uniform(0, 1, size=(B, N, 4)), jnp.float32),
        "target_ids": jnp.asarray(
            np.where(np.arange(T)[None] < 2,
                     rng.integers(1, 50, size=(B, T)), -100), jnp.int32),
        "scores": jnp.ones((B,), jnp.float32),
        "ques_labels": jnp.zeros((B, 10), jnp.float32),
        "cate_labels": jnp.zeros((B, 80), jnp.float32),
        "der_logits": jnp.zeros((B, T, m.vocab_size), jnp.float16),
    }
    params = init_vlt5_params(jax.random.PRNGKey(0), m)
    proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)
    tx = make_transform(cfg.train)
    state = TrainState.create(params, tx, proto,
                              jax.random.key(1, impl="rbg"),
                              warmup_iters=0.0, t_total=100.0)
    der = make_der_replay_step(cfg, tx, dtype=jnp.float32,
                               use_prototype=False, donate=False)
    cfg.train.cl_reg = "derpp"
    cfg.train.der_beta = 1.0
    derpp = make_der_replay_step(cfg, tx, dtype=jnp.float32,
                                 use_prototype=False, donate=False)
    _, a = der(state, batch)
    _, b = derpp(state, batch)
    assert float(b["loss"]) > float(a["loss"])
    # same α·MSE component in both
    assert abs(float(b["der_mse"]) - float(a["der_mse"])) < 1e-5


def test_der_requires_memory(tmp_path):
    cfg = _cfg(tmp_path, reg="der")
    cfg.train.memory = False
    tok = VLT5Tokenizer()
    data = SyntheticDataModule(tok, tasks=["q_recognition"],
                               n_train_per_task=8, n_val_per_task=4,
                               n_test_per_task=4,
                               feat_dim=cfg.model.feat_dim,
                               n_boxes=cfg.model.n_boxes, seed=0)
    with pytest.raises(ValueError, match="memory"):
        VQACLTrainer(cfg, data, tok, verbose=False, dtype=jnp.float32)
