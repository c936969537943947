"""Full VQACL dual-level loop smoke test on synthetic data (tiny model).

Covers: exemplar rebuild, group loaders, comp-split skip, replay double
step, per-epoch validation, checkpoint save, result-matrix fill, final
Avg-Acc/Forget — the reference train() path end-to-end (vqacl.py:147-427).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.cl.trainer import VQACLTrainer
from vqacl_tpu.data.synthetic_module import SyntheticDataModule
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    out = tmp_path_factory.mktemp("snap")
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.vocab_size = 32200   # real id space (tokenizer hashes words)
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 16
    cfg.train.valid_batch_size = 16
    cfg.train.epochs = 2
    cfg.train.m_size = 40
    cfg.output = str(out)

    tok = VLT5Tokenizer()  # fallback word tokenizer
    tasks = ["q_recognition", "q_location", "q_judge"]
    data = SyntheticDataModule(tok, tasks=tasks, n_train_per_task=80,
                               n_val_per_task=16, n_test_per_task=16,
                               feat_dim=cfg.model.feat_dim,
                               n_boxes=cfg.model.n_boxes,
                               answer_vocab=4, seed=0)
    trainer = VQACLTrainer(cfg, data, tok, verbose=False,
                           dtype=jnp.float32)
    metrics = trainer.train()
    return cfg, trainer, metrics


def test_result_matrix_filled(run):
    _, trainer, _ = run
    res = trainer.result_matrix.to_dict()
    # lower triangle populated
    assert res["q_recognition"]["q_recognition"] >= 0
    assert res["q_judge"]["q_recognition"] >= 0
    assert res["q_judge"]["q_judge"] >= 0


def test_learns_above_chance(run):
    _, trainer, metrics = run
    # emitting an exact "ansK" word at all requires learning; random
    # generation scores ~0. (Capacity is asserted separately in
    # test_train_step with a longer single-task run.)
    assert metrics["Avg_acc"] > 15, metrics


def test_checkpoints_written(run):
    cfg, trainer, _ = run
    for task in trainer.tasks:
        assert os.path.exists(os.path.join(cfg.output, f"{task}_LAST.npz"))
    assert os.path.exists(os.path.join(cfg.output, "Q_prototype.npy"))
    assert os.path.exists(os.path.join(cfg.output, "metrics.json"))


def test_exemplar_buffer_respects_quota(run):
    cfg, trainer, _ = run
    # after 3 tasks: M//2 per prev task /5 groups... total ≤ M
    assert 0 < len(trainer.buffer) <= cfg.train.m_size


def test_eval_only_mode(run):
    cfg, trainer, _ = run
    from vqacl_tpu.cl.metrics import ResultMatrix
    trainer.result_matrix = ResultMatrix(trainer.tasks)
    metrics = trainer.Test()
    assert metrics["Avg_acc"] > 15


def test_failed_background_ckpt_still_writes_emergency(tmp_path):
    """A background {task}_LAST write failure from a PREVIOUS task is
    surfaced by the next save() — that re-raise must still route through
    the emergency path so the just-trained params reach
    {task}_EMERGENCY (the 'lose at most the current task' guarantee)."""
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.vocab_size = 32200
    cfg.train.batch_size = 16
    cfg.train.valid_batch_size = 16
    cfg.train.epochs = 1
    cfg.output = str(tmp_path)

    tok = VLT5Tokenizer()
    tasks = ["q_recognition", "q_location"]
    data = SyntheticDataModule(tok, tasks=tasks, n_train_per_task=32,
                               n_val_per_task=16, n_test_per_task=16,
                               feat_dim=cfg.model.feat_dim,
                               n_boxes=cfg.model.n_boxes,
                               answer_vocab=4, seed=0)
    trainer = VQACLTrainer(cfg, data, tok, verbose=False,
                           dtype=jnp.float32)

    class PoisonedWriter:
        """First save 'succeeds' in the background but its failure
        surfaces at the second save's wait() — the AsyncCheckpointWriter
        contract for a failed previous write."""
        def __init__(self):
            self.calls = 0

        def save(self, *a, **kw):
            self.calls += 1
            if self.calls == 2:
                raise IOError("simulated ENOSPC from previous write")

        def wait(self):
            pass

    trainer._ckpt_writer = PoisonedWriter()
    with pytest.raises(IOError):
        trainer.train()
    # the failure hit at task 2's save → its params must be in EMERGENCY
    assert os.path.exists(
        os.path.join(cfg.output, "q_location_EMERGENCY.npz"))
