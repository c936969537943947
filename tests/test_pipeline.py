"""Pipeline parallelism (GPipe over a ``pp`` mesh axis) vs the
sequential stacks — forward, gradients, and the full train step.

Runs on the 8-device virtual CPU mesh (conftest). The reference has no
pipeline parallelism; parity target is our own sequential stacks."""

import numpy as np
import pytest

import jax as _jax


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """XLA:CPU executables DESERIALIZED from the persistent compilation
    cache can deadlock this module's multi-collective programs (GPipe
    ppermute + tp psum + GSPMD all-to-all resharding): devices end up
    waiting in different collectives and the 40 s rendezvous termination
    timeout aborts the process (xla rendezvous.cc:127; reproduced 100%
    with a warm cache, 0% without). Compile fresh for this module."""
    _jax.config.update("jax_enable_compilation_cache", False)
    yield
    _jax.config.update("jax_enable_compilation_cache", True)

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vqacl_tpu.models import t5
from vqacl_tpu.parallel.pipeline import (decoder_stack_pp, encoder_stack_pp,
                                         gpipe, stack_blocks)
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def _mesh(pp, dp=1):
    devs = jax.devices()
    if len(devs) < pp * dp:
        pytest.skip("needs the virtual multi-device mesh")
    arr = np.asarray(devs[:pp * dp]).reshape(dp, pp)
    return Mesh(arr, ("dp", "pp"))


def _allclose_tree(a, b, rtol, atol, label=""):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    for (path, x), (_, y) in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol,
            err_msg=f"{label}{jax.tree_util.keystr(path)}")


def test_encoder_stack_pp_matches_sequential(rng):
    cfg = tiny_model_config(num_layers=4)
    mesh = _mesh(pp=4)
    p = t5.init_stack(jax.random.PRNGKey(0), cfg, is_decoder=False)
    B, S, D = 8, 10, cfg.d_model
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    bias = jnp.asarray(
        rng.normal(size=(1, cfg.num_heads, S, S)).astype(np.float32))
    mask = np.ones((B, S), np.float32)
    mask[3, 7:] = 0.0
    mask_add = t5.attention_scores_bias(
        jnp.asarray(mask)[:, None, None, :], None)

    def seq(params):
        return t5.encoder_stack(params, cfg, x, bias, mask_add=mask_add)

    def pp(params):
        return encoder_stack_pp(params, cfg, x, bias, mask_add, mesh,
                                n_micro=4)

    np.testing.assert_allclose(np.asarray(jax.jit(pp)(p)),
                               np.asarray(seq(p)), rtol=2e-5, atol=2e-5)

    g_pp = jax.jit(jax.grad(lambda q: jnp.sum(jnp.sin(pp(q)))))(p)
    g_seq = jax.jit(jax.grad(lambda q: jnp.sum(jnp.sin(seq(q)))))(p)
    _allclose_tree(g_pp, g_seq, 2e-4, 2e-4, "enc grad ")


def test_decoder_stack_pp_matches_sequential(rng):
    cfg = tiny_model_config(num_decoder_layers=4)
    mesh = _mesh(pp=4)
    p = t5.init_stack(jax.random.PRNGKey(1), cfg, is_decoder=True)
    B, T, S, D = 8, 5, 11, cfg.d_model
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    enc = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    em = np.ones((B, S), np.float32)
    em[2, 8:] = 0.0
    em = jnp.asarray(em)

    def seq(params):
        return t5.decoder_stack(params, cfg, x, enc, em)

    def pp(params):
        return decoder_stack_pp(params, cfg, x, enc, em, mesh, n_micro=2)

    np.testing.assert_allclose(np.asarray(jax.jit(pp)(p)),
                               np.asarray(seq(p)), rtol=2e-5, atol=2e-5)

    g_pp = jax.jit(jax.grad(lambda q: jnp.sum(jnp.cos(pp(q)))))(p)
    g_seq = jax.jit(jax.grad(lambda q: jnp.sum(jnp.cos(seq(q)))))(p)
    _allclose_tree(g_pp, g_seq, 2e-4, 2e-4, "dec grad ")


def _joint_setup(pp_mesh=None):
    """Tiny VL-T5 + one synthetic batch; optionally pipeline-enabled."""
    import dataclasses

    from vqacl_tpu.data.collate import collate
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.vlt5 import init_vlt5_params

    cfg = tiny_model_config(num_layers=4, num_decoder_layers=4)
    if pp_mesh is not None:
        cfg = dataclasses.replace(cfg)
        cfg.pp_mesh = pp_mesh
        cfg.pp_micro = 4
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg)
    pool = SyntheticVQA(8, seed=0, feat_dim=cfg.feat_dim,
                        n_boxes=cfg.n_boxes, text_len=cfg.max_text_length,
                        vocab_size=cfg.vocab_size, answer_vocab=8)
    batch = collate(pool.examples, feat_dim=cfg.feat_dim,
                    n_boxes=cfg.n_boxes,
                    max_text_length=cfg.max_text_length)["tensors"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, params, batch


def test_forward_train_pp_matches_sequential():
    """Full joint VL-T5 loss + parameter grads: pipelined encoder AND
    decoder on a dp×pp mesh vs the plain path."""
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import forward_train

    mesh = _mesh(pp=4, dp=2)
    cfg_s, params, batch = _joint_setup()
    cfg_p, _, _ = _joint_setup(pp_mesh=mesh)
    proto = ProtoState.create(cfg_s.n_ques_types, cfg_s.n_categories,
                              cfg_s.d_model)

    def loss(params, cfg):
        out = forward_train(params, cfg, batch, proto,
                            proto_alpha=0.5, proto_beta=0.3,
                            deterministic=True, rng=None,
                            dtype=jnp.float32)
        return out.loss

    l_s, g_s = jax.value_and_grad(lambda q: loss(q, cfg_s))(params)
    l_p, g_p = jax.jit(jax.value_and_grad(lambda q: loss(q, cfg_p)))(params)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-5)
    _allclose_tree(g_p, g_s, 5e-4, 5e-4, "joint grad ")


def test_train_step_pp_runs_and_matches():
    """One compiled train step with the pipelined stacks (dropout 0 for
    comparability): loss matches the sequential step."""
    import dataclasses

    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_train_step

    mesh = _mesh(pp=4, dp=2)
    cfg = Config()
    cfg.model = tiny_model_config(num_layers=4, num_decoder_layers=4,
                                  dropout_rate=0.0)
    cfg.train.batch_size = 8

    cfg_pp = Config()
    cfg_pp.model = dataclasses.replace(cfg.model)
    cfg_pp.model.pp_mesh = mesh
    cfg_pp.model.pp_micro = 4
    cfg_pp.train = cfg.train

    _, params, batch = None, init_vlt5_params(
        jax.random.PRNGKey(0), cfg.model), None
    from vqacl_tpu.data.collate import collate
    from vqacl_tpu.data.synthetic import SyntheticVQA
    pool = SyntheticVQA(8, seed=0, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    batch = collate(pool.examples, feat_dim=cfg.model.feat_dim,
                    n_boxes=cfg.model.n_boxes,
                    max_text_length=cfg.model.max_text_length)["tensors"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    tx = make_transform(cfg.train)
    proto = ProtoState.create(cfg.model.n_ques_types,
                              cfg.model.n_categories, cfg.model.d_model)

    def one_step(c):
        state = TrainState.create(params, tx, proto, jax.random.PRNGKey(2),
                                  warmup_iters=10.0, t_total=100.0)
        step = make_train_step(c, tx, dtype=jnp.float32, donate=False)
        _, metrics = step(state, batch)
        return float(metrics["loss"]), float(metrics["grad_norm"])

    l_seq, g_seq = one_step(cfg)
    l_pp, g_pp = one_step(cfg_pp)
    assert np.isfinite(l_pp)
    np.testing.assert_allclose(l_pp, l_seq, rtol=1e-5)
    np.testing.assert_allclose(g_pp, g_seq, rtol=1e-3)


def _mesh3(dp, tp, pp):
    devs = jax.devices()
    if len(devs) < dp * tp * pp:
        pytest.skip("needs the virtual multi-device mesh")
    arr = np.asarray(devs[:dp * tp * pp]).reshape(dp, tp, pp)
    return Mesh(arr, ("dp", "tp", "pp"))


def test_encoder_stack_tp_pp_matches_sequential(rng):
    """dp=2 × tp=2 × pp=2: Megatron tensor parallelism INSIDE pipeline
    stages (q/k/v/wi output-sharded, wo input-sharded, psum before each
    residual) must reproduce the sequential stack — fwd and grads."""
    cfg = tiny_model_config(num_layers=4)
    mesh = _mesh3(dp=2, tp=2, pp=2)
    p = t5.init_stack(jax.random.PRNGKey(0), cfg, is_decoder=False)
    B, S, D = 8, 10, cfg.d_model
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    bias = jnp.asarray(
        rng.normal(size=(1, cfg.num_heads, S, S)).astype(np.float32))
    mask = np.ones((B, S), np.float32)
    mask[3, 7:] = 0.0
    mask_add = t5.attention_scores_bias(
        jnp.asarray(mask)[:, None, None, :], None)

    def seq(params):
        return t5.encoder_stack(params, cfg, x, bias, mask_add=mask_add)

    def pp(params):
        return encoder_stack_pp(params, cfg, x, bias, mask_add, mesh,
                                n_micro=4)

    np.testing.assert_allclose(np.asarray(jax.jit(pp)(p)),
                               np.asarray(seq(p)), rtol=2e-5, atol=2e-5)
    g_pp = jax.jit(jax.grad(lambda q: jnp.sum(jnp.sin(pp(q)))))(p)
    g_seq = jax.jit(jax.grad(lambda q: jnp.sum(jnp.sin(seq(q)))))(p)
    _allclose_tree(g_pp, g_seq, 2e-4, 2e-4, "enc tp-pp grad ")


def test_decoder_stack_tp_pp_matches_sequential(rng):
    cfg = tiny_model_config(num_decoder_layers=4)
    mesh = _mesh3(dp=2, tp=2, pp=2)
    p = t5.init_stack(jax.random.PRNGKey(1), cfg, is_decoder=True)
    B, T, S, D = 8, 5, 11, cfg.d_model
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    enc = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    em = np.ones((B, S), np.float32)
    em[2, 8:] = 0.0
    em = jnp.asarray(em)

    def seq(params):
        return t5.decoder_stack(params, cfg, x, enc, em)

    def pp(params):
        return decoder_stack_pp(params, cfg, x, enc, em, mesh, n_micro=2)

    np.testing.assert_allclose(np.asarray(jax.jit(pp)(p)),
                               np.asarray(seq(p)), rtol=2e-5, atol=2e-5)
    g_pp = jax.jit(jax.grad(lambda q: jnp.sum(jnp.cos(pp(q)))))(p)
    g_seq = jax.jit(jax.grad(lambda q: jnp.sum(jnp.cos(seq(q)))))(p)
    _allclose_tree(g_pp, g_seq, 2e-4, 2e-4, "dec tp-pp grad ")


def test_train_step_tp_pp_runs_and_matches():
    """Full compiled train step on a dp=2×tp=2×pp=2 mesh (Megatron
    stages inside the GPipe schedule): loss == sequential step."""
    import dataclasses

    from vqacl_tpu.data.collate import collate
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_train_step

    mesh = _mesh3(dp=2, tp=2, pp=2)
    cfg = Config()
    cfg.model = tiny_model_config(num_layers=4, num_decoder_layers=4,
                                  dropout_rate=0.0)
    cfg.train.batch_size = 8

    cfg_pp = Config()
    cfg_pp.model = dataclasses.replace(cfg.model)
    cfg_pp.model.pp_mesh = mesh
    cfg_pp.model.pp_micro = 2
    cfg_pp.train = cfg.train

    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    pool = SyntheticVQA(8, seed=0, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    batch = collate(pool.examples, feat_dim=cfg.model.feat_dim,
                    n_boxes=cfg.model.n_boxes,
                    max_text_length=cfg.model.max_text_length)["tensors"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    tx = make_transform(cfg.train)
    proto = ProtoState.create(cfg.model.n_ques_types,
                              cfg.model.n_categories, cfg.model.d_model)

    def one_step(c):
        state = TrainState.create(params, tx, proto, jax.random.PRNGKey(2),
                                  warmup_iters=10.0, t_total=100.0)
        step = make_train_step(c, tx, dtype=jnp.float32, donate=False)
        _, metrics = step(state, batch)
        return float(metrics["loss"]), float(metrics["grad_norm"])

    l_seq, g_seq = one_step(cfg)
    l_pp, g_pp = one_step(cfg_pp)
    assert np.isfinite(l_pp)
    np.testing.assert_allclose(l_pp, l_seq, rtol=1e-5)
    np.testing.assert_allclose(g_pp, g_seq, rtol=1e-3)
