"""Trainer-level multi-device integration (VERDICT r2 weak #5).

The step-level dryrun covers train/eval under tp and FSDP; this drives
the FULL ``VQACLTrainer`` orchestration — dual-level loop, per-group
optimizer reset, exemplar replay, checkpoint save → reload of sharded
params, eval-only mode — on non-dp layouts over the 8-device virtual
CPU mesh: a tp=2×dp=4 Megatron layout and an fsdp (dp-sharded params)
layout, cross-checked against the replicated run's result matrix.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.cl.trainer import VQACLTrainer
from vqacl_tpu.data.synthetic_module import SyntheticDataModule
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.parallel import make_mesh
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = [
    pytest.mark.slow,  # full-pipeline / compile-heavy (>5 s)
    pytest.mark.skipif(jax.device_count() < 8,
                       reason="needs the 8-device virtual mesh"),
]


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """Same quarantine as test_pipeline.py: XLA:CPU executables
    DESERIALIZED from the persistent compilation cache mis-rendezvous
    multi-collective programs. This module's tp train steps (per-layer
    psums + dp grad psum) are exactly that shape — and the poison is
    cross-test: with a warm ``.jax_cache_cpu`` these tests pass but a
    LATER module's freshly-compiled collectives abort (reproduced 100%:
    warm cache → test_pipeline's first tp×pp test dies in
    rendezvous.cc; cold cache or this fixture → green). Compile fresh
    here so no multi-collective executable in the process ever comes
    from the disk cache."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


def _cfg(out):
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.vocab_size = 32200
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 16
    cfg.train.valid_batch_size = 16
    cfg.train.epochs = 1
    cfg.train.m_size = 20
    cfg.output = str(out)
    return cfg


def _data(cfg):
    tok = VLT5Tokenizer()
    return tok, SyntheticDataModule(
        tok, tasks=["q_recognition", "q_location"], n_train_per_task=48,
        n_val_per_task=16, n_test_per_task=16,
        feat_dim=cfg.model.feat_dim, n_boxes=cfg.model.n_boxes,
        answer_vocab=4, seed=0)


def _run(layout, out, dp, tp):
    cfg = _cfg(out)
    cfg.mesh.param_layout = layout
    cfg.mesh.dp, cfg.mesh.tp = dp, tp
    tok, data = _data(cfg)
    ctx = make_mesh(dp=dp, tp=tp)
    trainer = VQACLTrainer(cfg, data, tok, verbose=False,
                           mesh_ctx=ctx, dtype=jnp.float32)
    metrics = trainer.train()
    return cfg, trainer, metrics


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    out = {}
    for layout, dp, tp in [("replicated", 8, 1), ("tp", 4, 2),
                           ("fsdp", 8, 1)]:
        out[layout] = _run(layout, tmp_path_factory.mktemp(layout), dp, tp)
    return out


def test_layouts_complete_and_agree(runs):
    """All three layouts finish the full CL loop; since the data, seeds,
    and f32 math are identical, the result matrices must agree (GSPMD
    resharding changes nothing semantically)."""
    ref = runs["replicated"][1].result_matrix.to_dict()
    for layout in ("tp", "fsdp"):
        got = runs[layout][1].result_matrix.to_dict()
        for t_row, row in ref.items():
            for t_col, v in row.items():
                assert abs(got[t_row][t_col] - v) < 1e-6, \
                    (layout, t_row, t_col, got[t_row][t_col], v)


def test_sharded_params_actually_sharded(runs):
    """The tp/fsdp runs must really carry distributed layouts — not
    silently replicate."""
    # fsdp_rules only shard tensors ≥ 2^14 elements — in the tiny model
    # that's the shared embedding; tp shards every attention projection
    for layout, axis, path in [
            ("tp", "tp", ("encoder", "block_0", "attn", "wq")),
            ("fsdp", "dp", ("shared",))]:
        _, trainer, _ = runs[layout]
        leaf = trainer.state.params
        mu = trainer.state.opt_state[1].mu        # Adam moments mirror it
        for k in path:
            leaf = leaf[k]
            mu = mu[k]
        assert axis in jax.tree.leaves(tuple(leaf.sharding.spec)), \
            (layout, leaf.sharding.spec)
        assert axis in jax.tree.leaves(tuple(mu.sharding.spec))


def test_checkpoints_roundtrip_sharded(runs):
    """Checkpoint files written from sharded params load back and drive
    eval-only mode (save → gather → np file → reload → re-place)."""
    from vqacl_tpu.cl.metrics import ResultMatrix

    for layout in ("tp", "fsdp"):
        cfg, trainer, metrics = runs[layout]
        for task in trainer.tasks:
            assert os.path.exists(
                os.path.join(cfg.output, f"{task}_LAST.npz")), (layout, task)
        trainer.result_matrix = ResultMatrix(trainer.tasks)
        test_metrics = trainer.Test()            # reload every checkpoint
        assert test_metrics["Avg_acc"] == pytest.approx(
            metrics["Avg_acc"], abs=1e-6), layout


def test_pipeline_layout_full_loop(tmp_path):
    """Full CL orchestration on a dp=4×pp=2 GPipe mesh: the trainer
    wires ``cfg.model.pp_mesh`` (cl/trainer.py) so encode/decode_hidden
    route through parallel/pipeline.py. Dropout 0 on both sides makes
    the pipelined run bit-comparable to the replicated one (the pp
    dropout streams are intentionally folded differently)."""
    def run(pp):
        cfg = _cfg(tmp_path / f"pp{pp}")
        cfg.model.dropout_rate = 0.0
        cfg.mesh.dp, cfg.mesh.tp, cfg.mesh.pp = (4, 1, 2) if pp > 1 \
            else (8, 1, 1)
        cfg.mesh.pp_micro = 4
        tok, data = _data(cfg)
        ctx = make_mesh(dp=cfg.mesh.dp, tp=cfg.mesh.tp, pp=cfg.mesh.pp)
        trainer = VQACLTrainer(cfg, data, tok, verbose=False,
                               mesh_ctx=ctx, dtype=jnp.float32)
        metrics = trainer.train()
        return trainer, metrics

    t_ref, m_ref = run(pp=1)
    t_pp, m_pp = run(pp=2)
    assert t_pp.cfg.model.pp_mesh is not None     # wiring really engaged
    assert np.isfinite(m_pp["Avg_acc"])
    ref = t_ref.result_matrix.to_dict()
    got = t_pp.result_matrix.to_dict()
    for t_row, row in ref.items():
        for t_col, v in row.items():
            assert abs(got[t_row][t_col] - v) < 1e-6, \
                (t_row, t_col, got[t_row][t_col], v)


def test_resume_on_sharded_layout(runs, tmp_path):
    """Resume (--checkpoint semantics) re-places loaded params in the
    sharded layout and continues the task sequence."""
    cfg, trainer, _ = runs["tp"]
    tok, data = _data(cfg)
    ctx = make_mesh(dp=4, tp=2)
    resumed = VQACLTrainer(cfg, data, tok, verbose=False,
                           mesh_ctx=ctx, dtype=jnp.float32)
    metrics = resumed.train(resume_task="q_recognition")
    assert np.isfinite(metrics["Avg_acc"])
    wq = resumed.state.params["encoder"]["block_0"]["attn"]["wq"]
    assert "tp" in jax.tree.leaves(tuple(wq.sharding.spec))
