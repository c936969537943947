"""Schedules, freeze mask, decay groups."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.models.vlt5 import init_vlt5_params
from vqacl_tpu.train.optim import (decay_mask, dynamic_lr, freeze_mask,
                                   make_schedule, make_transform)
from vqacl_tpu.utils.config import TrainConfig, tiny_model_config


def test_constant_warmup_schedule():
    """HF get_constant_schedule_with_warmup semantics: k-th completed
    step uses factor k/warmup — first step is a ZERO update."""
    s = make_schedule(1e-3, t_total=100, warmup_ratio=0.1)
    assert abs(float(s(0))) < 1e-12           # HF warmup: lr_lambda(0)=0
    assert abs(float(s(5)) - 5e-4) < 1e-9
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert abs(float(s(99)) - 1e-3) < 1e-9    # constant after warmup
    # warmup 0 (tiny t_total) → full lr from the start, like HF
    s0 = make_schedule(1e-3, t_total=5, warmup_ratio=0.1)
    assert abs(float(s0(0)) - 1e-3) < 1e-9


def test_linear_warmup_schedule():
    s = make_schedule(1e-3, t_total=100, warmup_ratio=0.1,
                      kind="linear_warmup")
    assert abs(float(s(0))) < 1e-12
    assert abs(float(s(99)) - 1e-3 / 90) < 1e-9   # (100-99)/(100-10)
    assert float(s(10)) > float(s(50)) > float(s(99))


def test_dynamic_lr_matches_static():
    sched = jnp.asarray([10.0, 100.0])
    static = make_schedule(1e-3, t_total=100, warmup_ratio=0.1)
    for step in (0, 5, 9, 50, 99):
        assert abs(float(dynamic_lr(jnp.asarray(float(step)), sched, 1e-3))
                   - float(static(step))) < 1e-9
    static_l = make_schedule(1e-3, t_total=100, warmup_ratio=0.1,
                             kind="linear_warmup")
    for step in (0, 9, 50, 99):
        assert abs(float(dynamic_lr(jnp.asarray(float(step)), sched, 1e-3,
                                    "linear_warmup"))
                   - float(static_l(step))) < 1e-8


def test_decay_mask_matches_reference_groups():
    """The reference's no_decay substring test ('bias'/'LayerNorm.weight',
    trainer_base.py:148) misses T5's lowercase ``layer_norm.weight``
    naming, so layer norms ARE decayed there; only ``*.bias`` params and
    ``relative_attention_bias.weight`` are exempt."""
    cfg = tiny_model_config()
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg)
    mask = decay_mask(params)
    assert mask["encoder"]["block_0"]["attn"]["wq"] is True
    assert mask["encoder"]["block_0"]["ln1"] is True      # decayed (quirk)
    assert mask["encoder"]["final_ln"] is True            # decayed (quirk)
    assert mask["encoder"]["rel_bias"] is False           # contains 'bias'
    assert mask["visual_embedding"]["feat_b"] is False    # Linear bias
    assert mask["visual_embedding"]["feat_w"] is True


def test_freeze_mode_only_updates_shared():
    cfg = tiny_model_config()
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(freeze=True)
    tx = make_transform(tcfg)
    opt = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt, params)
    assert float(jnp.abs(updates["shared"]).sum()) > 0
    assert float(jnp.abs(updates["encoder"]["block_0"]["attn"]["wq"]).sum()) == 0
    assert float(jnp.abs(updates["decoder"]["block_0"]["mlp"]["wi"]).sum()) == 0


def test_multi_image_order_ids():
    """Two-image visual embedding path (n_images=2)."""
    from vqacl_tpu.models import vlt5
    cfg = tiny_model_config()
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, N = 2, cfg.n_boxes
    ids = rng.integers(2, 100, size=(B, cfg.max_text_length))
    feats = rng.normal(size=(B, N, cfg.feat_dim)).astype(np.float32)
    boxes = rng.uniform(0, 1, size=(B, N, 4)).astype(np.float32)
    # first half of the boxes from image 0, second half image 1
    img_order = np.zeros((1, N), np.int32)
    img_order[:, N // 2:] = 1
    h2, _ = vlt5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(feats),
                        jnp.asarray(boxes),
                        img_order_ids=jnp.asarray(img_order))
    h1, _ = vlt5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(feats),
                        jnp.asarray(boxes))
    assert h2.shape == h1.shape
    # different image-order embeddings → different activations
    assert float(jnp.abs(h2 - h1).max()) > 1e-5


def test_scale_by_adam_lowmem_matches_optax_in_f32():
    """With f32 moment storage the lowmem Adam is EXACTLY optax's."""
    import optax

    from vqacl_tpu.train.optim import scale_by_adam_lowmem

    params = {"a": jnp.arange(6.0).reshape(2, 3) / 7.0,
              "b": jnp.asarray([0.5, -2.0])}
    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-6)
    low = scale_by_adam_lowmem(0.9, 0.999, 1e-6, moment_dtype=jnp.float32)
    s_ref, s_low = ref.init(params), low.init(params)
    g = {"a": jnp.ones((2, 3)) * 0.3, "b": jnp.asarray([1.0, -1.0])}
    for _ in range(5):
        u_ref, s_ref = ref.update(g, s_ref)
        u_low, s_low = low.update(g, s_low)
        for k in params:
            np.testing.assert_allclose(np.asarray(u_low[k]),
                                       np.asarray(u_ref[k]),
                                       rtol=1e-6, atol=1e-7)


@pytest.mark.slow  # ~7 s: trains two full trajectories
def test_adam_bf16_moments_track_f32_training():
    """bf16 moment storage must not change the loss trajectory beyond
    rounding noise on a real (tiny) training run — the gate for using
    --adam_dtype bfloat16 in benchmarks."""
    import jax

    from vqacl_tpu.data.collate import collate
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_train_step
    from vqacl_tpu.utils.config import Config, tiny_model_config

    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.train.lr = 5e-3
    cfg.train.batch_size = 16

    m = cfg.model
    pool = SyntheticVQA(16, seed=3, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                        text_len=m.max_text_length, vocab_size=m.vocab_size,
                        answer_vocab=8)
    batch = collate(pool.examples, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                    max_text_length=m.max_text_length,
                    target_max_length=m.target_max_length)["tensors"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = {}
    for dtype_name in ("float32", "bfloat16"):
        cfg.train.adam_dtype = dtype_name
        params = init_vlt5_params(jax.random.PRNGKey(0), m)
        tx = make_transform(cfg.train)
        proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)
        state = TrainState.create(params, tx, proto, jax.random.PRNGKey(1))
        step = make_train_step(cfg, tx, dtype=jnp.float32, donate=False)
        traj = []
        for _ in range(60):
            state, mtr = step(state, batch)
            traj.append(float(mtr["loss"]))
        losses[dtype_name] = traj

    f32, bf16 = np.asarray(losses["float32"]), np.asarray(losses["bfloat16"])
    assert f32[-1] < f32[0] * 0.5          # it actually trained
    # trajectories agree to a fraction of the training signal
    denom = max(f32[0] - f32[-1], 1e-3)
    assert abs(f32[-1] - bf16[-1]) / denom < 0.05, (f32[-1], bf16[-1])
