"""Composition-split trainer: holdout skip + comp/noncomp matrices."""

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.cl.comp_trainer import CompVQACLTrainer
from vqacl_tpu.data.synthetic_module import SyntheticDataModule
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.vocab_size = 32200
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 16
    cfg.train.valid_batch_size = 16
    cfg.train.epochs = 1
    cfg.train.m_size = 20
    cfg.train.comp_cate = "G5"
    cfg.output = str(tmp_path_factory.mktemp("snap_comp"))

    tok = VLT5Tokenizer()
    tasks = ["q_recognition", "q_location"]
    data = SyntheticDataModule(tok, tasks=tasks, n_train_per_task=60,
                               n_val_per_task=10, n_test_per_task=30,
                               feat_dim=tiny_model_config().feat_dim,
                               n_boxes=tiny_model_config().n_boxes,
                               answer_vocab=4, seed=0)
    trainer = CompVQACLTrainer(cfg, data, tok, verbose=False,
                               dtype=jnp.float32)
    out = trainer.train()
    return cfg, trainer, out


def test_comp_matrices_filled(run):
    _, trainer, out = run
    comp = trainer.result_matrix_comp.to_dict()
    noncomp = trainer.result_matrix_noncomp.to_dict()
    assert comp["q_location"]["q_recognition"] >= 0
    assert noncomp["q_location"]["q_location"] >= 0
    assert set(out) == {"standard", "comp", "noncomp"}
    assert np.isfinite(out["comp"]["Avg_acc"])


def test_comp_gate_is_key_membership():
    """Reference gate: ``composition_test_cate in Category_splits``
    (nextqa_CL.py:421) — G-1 AND any unknown key disable comp tests."""
    from vqacl_tpu.cl.comp_trainer import comp_enabled
    from vqacl_tpu.cl.tasks import CATEGORY_SPLITS
    from vqacl_tpu.nextqa.data import NEXTQA_SPLITS

    assert comp_enabled("G5", CATEGORY_SPLITS)
    assert not comp_enabled("G-1", CATEGORY_SPLITS)
    assert not comp_enabled("G9", CATEGORY_SPLITS)   # invalid key ≠ G-1
    assert not comp_enabled(None, CATEGORY_SPLITS)
    # NExT-QA groups are G0..G4: G5 is NOT a valid comp key there
    assert comp_enabled("G0", NEXTQA_SPLITS)
    assert not comp_enabled("G5", NEXTQA_SPLITS)


def test_holdout_group_not_trained_after_first_task(run, capsys):
    """comp group must be skipped for tasks after the first trained one;
    verified via the trainer's metrics log (G5 absent for task 2)."""
    _, trainer, _ = run
    trained_groups = [(e["task"], e["group"]) for e in trainer.metrics_log]
    second_task_groups = [g for t, g in trained_groups if t == "q_location"]
    assert "G5" not in second_task_groups
    first_task_groups = [g for t, g in trained_groups
                         if t == "q_recognition"]
    assert "G5" in first_task_groups
