"""End-to-end compiled train/eval step: learning + multi-device sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.data.synthetic import SyntheticVQA
from vqacl_tpu.models.prototype import ProtoState
from vqacl_tpu.models.vlt5 import init_vlt5_params
from vqacl_tpu.parallel import make_mesh, replicate, shard_batch
from vqacl_tpu.train.optim import make_transform
from vqacl_tpu.train.state import TrainState
from vqacl_tpu.train.step import make_eval_step, make_train_step
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def tiny_cfg():
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.train.lr = 5e-3
    cfg.train.batch_size = 16
    return cfg


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_cfg()
    cfg.train.lr = 1e-2
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_transform(cfg.train)
    proto = ProtoState.create(cfg.model.n_ques_types, cfg.model.n_categories,
                              cfg.model.d_model)
    state = TrainState.create(params, tx, proto, jax.random.PRNGKey(1), warmup_iters=24.0, t_total=240.0)
    step = make_train_step(cfg, tx, dtype=jnp.float32)

    data = SyntheticVQA(64, seed=0, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    losses = []
    for ep in range(60):
        for b in data.batches(16, seed=ep):
            state, m = step(state, b["tensors"])
            losses.append(float(m["loss"]))
    return cfg, state, data, losses


def test_loss_decreases(trained):
    _, _, _, losses = trained
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert last < 0.5 * first, (first, last)


def test_proto_state_advances(trained):
    cfg, state, _, _ = trained
    assert int(state.proto.steps_in_task) > 0
    assert float(jnp.abs(state.proto.q_proto).sum()) > 0
    assert float(jnp.abs(state.proto.v_proto).sum()) > 0


def test_eval_step_predicts_learned_answers(trained):
    cfg, state, data, _ = trained
    eval_step = make_eval_step(cfg, dtype=jnp.float32)
    batch = next(data.batches(16, seed=99))
    tokens = np.asarray(eval_step(state.params, state.proto,
                                  batch["tensors"]))
    # first generated token should be the learned answer token
    tgt = np.asarray(batch["tensors"]["target_ids"])[:, 0]
    acc = float(np.mean(tokens[:, 0] == tgt))
    assert acc > 0.5, acc


def test_train_step_on_8dev_mesh():
    """Batch-sharded dp=8 mesh: same step, XLA inserts the grad psum."""
    cfg = tiny_cfg()
    ctx = make_mesh(dp=8, tp=1)
    assert ctx.dp == 8
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    tx = make_transform(cfg.train)
    proto = ProtoState.create(cfg.model.n_ques_types, cfg.model.n_categories,
                              cfg.model.d_model)
    state = TrainState.create(params, tx, proto, jax.random.PRNGKey(1), warmup_iters=24.0, t_total=240.0)
    state = replicate(ctx, state)
    step = make_train_step(cfg, tx, dtype=jnp.float32)

    data = SyntheticVQA(32, seed=0, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    b = next(data.batches(16))
    batch = shard_batch(ctx, b["tensors"])
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # params stay replicated-consistent after the update
    state2, m2 = step(state, batch)
    assert np.isfinite(float(m2["loss"]))


def test_loss_eval_step(trained):
    from vqacl_tpu.train.step import make_loss_eval_step
    cfg, state, data, _ = trained
    step = make_loss_eval_step(cfg, dtype=jnp.float32)
    batch = next(data.batches(16, seed=3))["tensors"]
    loss = float(step(state.params, state.proto, batch))
    assert np.isfinite(loss) and loss < 2.0  # trained model → low loss


def test_merged_qkv_equals_separate():
    """merged_qkv (one [D,3·H·dk] projection GEMM) must be numerically
    equivalent to the separate wq/wk/wv path: forward, gradients, and
    greedy/beam decode tokens."""
    import copy

    from vqacl_tpu.models import vlt5
    from vqacl_tpu.models.generate import beam_search, greedy_decode
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params

    cfg_off = tiny_model_config(vocab_size=96)
    cfg_off.merged_qkv = False
    cfg_on = copy.deepcopy(cfg_off)
    cfg_on.merged_qkv = True

    params = init_vlt5_params(jax.random.PRNGKey(3), cfg_off)
    rng = np.random.default_rng(4)
    B, L, N, T = 3, cfg_off.max_text_length, cfg_off.n_boxes, 4
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 96, size=(B, L))),
        "vis_feats": jnp.asarray(
            rng.normal(size=(B, N, cfg_off.feat_dim)).astype(np.float32)),
        "boxes": jnp.asarray(
            rng.uniform(0, 1, (B, N, 4)).astype(np.float32)),
        "target_ids": jnp.asarray(rng.integers(2, 96, size=(B, T))),
        "scores": jnp.asarray(rng.uniform(0.5, 1, B).astype(np.float32)),
        "ques_labels": jnp.eye(10)[rng.integers(0, 10, B)],
        "cate_labels": jnp.eye(80)[rng.integers(0, 80, B)],
    }
    proto = ProtoState.create(10, 80, cfg_off.d_model)

    def loss(p, cfg):
        out = vlt5.forward_train(p, cfg, batch, proto, 0.3, 0.3,
                                 deterministic=True, dtype=jnp.float32)
        return out.loss

    (l0, g0), (l1, g1) = [jax.value_and_grad(loss)(params, c)
                          for c in (cfg_off, cfg_on)]
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)

    enc0, m0 = vlt5.encode(params, cfg_off, batch["input_ids"],
                           batch["vis_feats"], batch["boxes"],
                           dtype=jnp.float32)
    for fn in (greedy_decode,
               lambda *a, **k: beam_search(*a, num_beams=3, **k)):
        t_off = np.asarray(fn(params, cfg_off, enc0, m0, dtype=jnp.float32))
        t_on = np.asarray(fn(params, cfg_on, enc0, m0, dtype=jnp.float32))
        np.testing.assert_array_equal(t_off, t_on)


def test_folded_cross_kv_equals_separate():
    """folded_cross_kv (ALL decoder layers' cross K/V as one GEMM over
    the layer-invariant encoder states) must be numerically equivalent
    to per-layer projections: forward, gradients, and decode tokens."""
    import copy

    from vqacl_tpu.models import vlt5
    from vqacl_tpu.models.generate import beam_search, greedy_decode
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params

    cfg_off = tiny_model_config(vocab_size=96)
    cfg_off.merged_qkv = False
    cfg_off.folded_cross_kv = False
    cfg_on = copy.deepcopy(cfg_off)
    cfg_on.folded_cross_kv = True

    params = init_vlt5_params(jax.random.PRNGKey(7), cfg_off)
    rng = np.random.default_rng(8)
    B, L, N, T = 3, cfg_off.max_text_length, cfg_off.n_boxes, 4
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 96, size=(B, L))),
        "vis_feats": jnp.asarray(
            rng.normal(size=(B, N, cfg_off.feat_dim)).astype(np.float32)),
        "boxes": jnp.asarray(
            rng.uniform(0, 1, (B, N, 4)).astype(np.float32)),
        "target_ids": jnp.asarray(rng.integers(2, 96, size=(B, T))),
        "scores": jnp.asarray(rng.uniform(0.5, 1, B).astype(np.float32)),
        "ques_labels": jnp.eye(10)[rng.integers(0, 10, B)],
        "cate_labels": jnp.eye(80)[rng.integers(0, 80, B)],
    }
    proto = ProtoState.create(10, 80, cfg_off.d_model)

    def loss(p, cfg):
        out = vlt5.forward_train(p, cfg, batch, proto, 0.3, 0.3,
                                 deterministic=True, dtype=jnp.float32)
        return out.loss

    (l0, g0), (l1, g1) = [jax.value_and_grad(loss)(params, c)
                          for c in (cfg_off, cfg_on)]
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)

    enc0, m0 = vlt5.encode(params, cfg_off, batch["input_ids"],
                           batch["vis_feats"], batch["boxes"],
                           dtype=jnp.float32)
    for fn in (greedy_decode,
               lambda *a, **k: beam_search(*a, num_beams=3, **k)):
        t_off = np.asarray(fn(params, cfg_off, enc0, m0, dtype=jnp.float32))
        t_on = np.asarray(fn(params, cfg_on, enc0, m0, dtype=jnp.float32))
        np.testing.assert_array_equal(t_off, t_on)


def test_fused_head_loss_matches_reference_chain():
    """fused_head_loss (custom VJP) must equal lm_logits→weighted_lm_loss
    in value AND in gradients wrt decoder hidden + shared embedding."""
    from vqacl_tpu.models import t5
    from vqacl_tpu.models.vlt5 import fused_head_loss, weighted_lm_loss

    cfg = tiny_model_config(vocab_size=48)
    rng = np.random.default_rng(5)
    B, T, D = 4, 5, cfg.d_model
    hidden = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    shared = jnp.asarray(rng.normal(size=(cfg.vocab_size, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(B, T)))
    labels = labels.at[1, 3:].set(-100).at[2, :].set(-100)
    scores = jnp.asarray(rng.uniform(0.2, 1.0, size=(B,)).astype(np.float32))
    rescale = cfg.d_model ** -0.5

    def ref(h, s):
        logits = t5.lm_logits(s, h * 1.0, cfg.d_model, True)
        return weighted_lm_loss(logits, labels, scores)

    def fused(h, s):
        return fused_head_loss(h, s, labels, scores, rescale)

    v_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1))(hidden, shared)
    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1))(hidden, shared)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-5)

    # scores cotangent too (nothing in training differentiates the answer
    # weights, but the VJP must still be the true gradient, not zero)
    gs_ref = jax.grad(lambda sc: weighted_lm_loss(
        t5.lm_logits(shared, hidden, cfg.d_model, True), labels, sc))(scores)
    gs_f = jax.grad(lambda sc: fused_head_loss(
        hidden, shared, labels, sc, rescale))(scores)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_ref),
                               rtol=1e-4, atol=1e-6)


def test_grad_accum_matches_full_batch():
    """grad_accum=4 must reproduce the full-batch step: the loss is a
    per-example batch mean, so averaged microbatch grads equal the
    full-batch grads (dropout off, prototype bank threads per
    microbatch — disabled here for exactness)."""
    import dataclasses

    cfg = tiny_cfg()
    cfg.model = dataclasses.replace(cfg.model, dropout_rate=0.0,
                                    use_prototype=False)
    cfg.train.grad_accum = 1
    tx = make_transform(cfg.train)
    proto = ProtoState.create(cfg.model.n_ques_types,
                              cfg.model.n_categories, cfg.model.d_model)
    data = SyntheticVQA(16, seed=3, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    batch = next(iter(data.batches(16, seed=0)))["tensors"]

    def run(accum):
        import copy
        c = copy.deepcopy(cfg)
        c.train.grad_accum = accum
        params = init_vlt5_params(jax.random.PRNGKey(0), c.model)
        state = TrainState.create(params, tx, proto, jax.random.PRNGKey(1),
                                  warmup_iters=4.0, t_total=40.0)
        step = make_train_step(c, tx, dtype=jnp.float32, donate=False)
        state, m = step(state, batch)
        return state, m

    s1, m1 = run(1)
    s4, m4 = run(4)
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m4["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-5)
    flat1 = jax.tree.leaves(s1.params)
    flat4 = jax.tree.leaves(s4.params)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)


def test_grad_accum_rejects_indivisible_batch():
    cfg = tiny_cfg()
    cfg.train.grad_accum = 3
    tx = make_transform(cfg.train)
    proto = ProtoState.create(cfg.model.n_ques_types,
                              cfg.model.n_categories, cfg.model.d_model)
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    state = TrainState.create(params, tx, proto, jax.random.PRNGKey(1),
                              warmup_iters=4.0, t_total=40.0)
    data = SyntheticVQA(16, seed=3, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    batch = next(iter(data.batches(16, seed=0)))["tensors"]
    step = make_train_step(cfg, tx, dtype=jnp.float32, donate=False)
    with pytest.raises(ValueError, match="divisible"):
        step(state, batch)


def test_precast_params_inference_parity(trained):
    """cast_params_for_inference must be a pure no-op on eval numerics:
    the compiled step casts every matmul weight to the compute dtype at
    its use site anyway, so pre-cast bf16 params → bit-identical tokens
    (and the f32-consumed LayerNorm/rel_bias leaves must stay f32)."""
    from vqacl_tpu.models.vlt5 import cast_params_for_inference

    cfg, state, data, _ = trained
    eval_step = make_eval_step(cfg, dtype=jnp.bfloat16)
    batch = next(data.batches(16, seed=7))["tensors"]

    cast = cast_params_for_inference(state.params, jnp.bfloat16)
    # structure: LN/rel_bias stay f32, projection weights narrow
    assert cast["encoder"]["final_ln"].dtype == jnp.float32
    assert cast["encoder"]["rel_bias"].dtype == jnp.float32
    assert cast["encoder"]["block_0"]["ln1"].dtype == jnp.float32
    assert cast["encoder"]["block_0"]["attn"]["wq"].dtype == jnp.bfloat16
    assert cast["shared"].dtype == jnp.bfloat16
    assert cast["visual_embedding"]["feat_ln"].dtype == jnp.float32

    t_f32 = np.asarray(eval_step(state.params, state.proto, batch))
    t_cast = np.asarray(eval_step(cast, state.proto, batch))
    np.testing.assert_array_equal(t_f32, t_cast)
