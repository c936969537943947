"""Checkpoint-resume path: --checkpoint <task> semantics (vqacl.py:147-160)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.cl.trainer import VQACLTrainer
from vqacl_tpu.data.synthetic_module import SyntheticDataModule
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def make(tmp, tasks):
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.vocab_size = 32200
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 16
    cfg.train.valid_batch_size = 16
    cfg.train.epochs = 1
    cfg.train.m_size = 20
    cfg.output = str(tmp)
    tok = VLT5Tokenizer()
    data = SyntheticDataModule(tok, tasks=tasks, n_train_per_task=40,
                               n_val_per_task=8, n_test_per_task=8,
                               feat_dim=cfg.model.feat_dim,
                               n_boxes=cfg.model.n_boxes,
                               answer_vocab=4, seed=0)
    return cfg, data, tok


def test_resume_from_task(tmp_path):
    tasks = ["q_recognition", "q_location"]
    cfg, data, tok = make(tmp_path, tasks)

    # phase 1: train only the first task (simulate interruption by
    # truncating the task list), checkpoint lands on disk
    t1 = VQACLTrainer(cfg, data, tok, verbose=False, dtype=jnp.float32)
    t1.tasks = tasks[:1]
    t1.result_matrix.tasks = tasks  # full-size matrix
    t1.train_task(0, first_trained=True)
    from vqacl_tpu.train.checkpoint import save_checkpoint
    import jax
    save_checkpoint(os.path.join(cfg.output, "q_recognition_LAST"),
                    jax.device_get(t1.state.params),
                    jax.device_get(t1.state.proto), 1)

    # phase 2: fresh trainer resumes AFTER q_recognition
    t2 = VQACLTrainer(cfg, data, tok, verbose=False, dtype=jnp.float32)
    t2.train(resume_task="q_recognition")

    # proto/params were restored: prototypes non-zero at resume start
    assert float(jnp.abs(t2.state.proto.q_proto).sum()) > 0
    res = t2.result_matrix.to_dict()
    # only the second task's rows were (re)trained + tested
    assert res["q_location"]["q_recognition"] >= 0
    assert res["q_location"]["q_location"] >= 0
    assert os.path.exists(os.path.join(cfg.output, "q_location_LAST.npz"))


def test_beam_eval_step_runs(tmp_path):
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.step import make_eval_step
    import jax

    cfg = Config()
    cfg.model = tiny_model_config()
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    proto = ProtoState.create(10, 80, cfg.model.d_model)
    data = SyntheticVQA(8, seed=0, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    batch = next(data.batches(8))["tensors"]
    ev = make_eval_step(cfg, dtype=jnp.float32, num_beams=3)
    toks = np.asarray(ev(params, proto, batch))
    assert toks.shape[0] == 8
    assert np.isfinite(toks).all()


def test_async_checkpointer_roundtrip_and_error(tmp_path):
    """Background writer produces byte-identical checkpoints to the
    sync path (atomic tmp+replace), and a failed write surfaces at the
    next wait() instead of being swallowed."""
    import numpy as np

    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.train.checkpoint import (AsyncCheckpointer,
                                            load_checkpoint,
                                            save_checkpoint)

    params = {"layer": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                        "b": np.zeros(3, np.float32)}}
    proto = ProtoState.create(4, 5, 3)

    sync_p = str(tmp_path / "sync")
    async_p = str(tmp_path / "async")
    save_checkpoint(sync_p, params, proto, step=7)
    w = AsyncCheckpointer()
    w.save(async_p, params, proto, step=7)
    w.wait()

    pa, pra, sa = load_checkpoint(async_p)
    ps, prs, ss = load_checkpoint(sync_p)
    assert sa == ss == 7
    np.testing.assert_array_equal(pa["layer"]["w"], ps["layer"]["w"])
    np.testing.assert_array_equal(pra.q_proto, prs.q_proto)
    # no stray tmp files
    assert not [f for f in tmp_path.iterdir() if f.name.endswith(".tmp")]

    # unwritable destination: error is raised by wait(), then cleared
    w.save(str(tmp_path / "no_dir_here" / "x" / "y" / "\0bad"), params,
           proto)
    import pytest
    with pytest.raises(Exception):
        w.wait()
    w.wait()          # error consumed; writer reusable

    # a failed overwrite must leave the previous file intact
    good = str(tmp_path / "keep")
    save_checkpoint(good, params, proto, step=1)
    before = (tmp_path / "keep.npz").read_bytes()
    try:
        import vqacl_tpu.train.checkpoint as ck
        orig = ck.np.savez

        def boom(*a, **k):
            raise IOError("disk full")

        ck.np.savez = boom
        w.save(good, params, proto, step=2)
        with pytest.raises(IOError):
            w.wait()
    finally:
        ck.np.savez = orig
    assert (tmp_path / "keep.npz").read_bytes() == before
