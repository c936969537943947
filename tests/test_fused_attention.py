"""Pallas fused attention vs einsum reference — forward and gradients.

Runs in interpret mode on CPU; the same kernel compiles on TPU (the
bench exercises that path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.ops.fused_attention import fused_encoder_attention

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def reference_attention(q, k, v, pos_bias, mask):
    """Unscaled T5 attention, f32 softmax (t5.multihead_attention)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s + pos_bias[None] + (1.0 - mask[:, None, None, :]) * -1e9
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                   preferred_element_type=jnp.float32)
    B, S, H, dk = q.shape
    return o.astype(q.dtype).reshape(B, S, H * dk)


@pytest.fixture(params=["serial", "batched"])
def impl(request, monkeypatch):
    """Run the reference-parity tests under BOTH kernel implementations
    (per-head serial dots and head-batched dot_generals); 'batched' is
    the measured-default on v5e, 'serial' stays as the probe baseline."""
    from vqacl_tpu.ops import fused_attention as FA
    monkeypatch.setattr(FA, "FWD_IMPL", request.param)
    monkeypatch.setattr(FA, "BWD_IMPL", request.param)
    return request.param


@pytest.fixture
def data(rng):
    B, S, H, dk = 3, 58, 4, 16
    q = rng.normal(size=(B, S, H, dk)).astype(np.float32)
    k = rng.normal(size=(B, S, H, dk)).astype(np.float32)
    v = rng.normal(size=(B, S, H, dk)).astype(np.float32)
    bias = rng.normal(size=(H, S, S)).astype(np.float32)
    mask = np.ones((B, S), np.float32)
    mask[0, 50:] = 0.0
    mask[2, 20:] = 0.0
    return map(jnp.asarray, (q, k, v, bias, mask))


def test_forward_matches_reference(data, impl):
    q, k, v, bias, mask = data
    ours = fused_encoder_attention(q, k, v, bias, mask, interpret=True)
    ref = reference_attention(q, k, v, bias, mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference(data, impl):
    q, k, v, bias, mask = data

    def loss_fused(q, k, v, bias):
        o = fused_encoder_attention(q, k, v, bias, mask, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v, bias):
        o = reference_attention(q, k, v, bias, mask)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g1, g2, "qkv b"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad {name}")


def test_encode_fused_matches_unfused():
    """Full joint-encoder parity: fused Pallas path (interpret) vs the
    einsum path, deterministic."""
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.vlt5 import encode, init_vlt5_params
    from vqacl_tpu.utils.config import tiny_model_config

    cfg = tiny_model_config(d_kv=16)
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg)
    data = SyntheticVQA(4, seed=0, feat_dim=cfg.feat_dim,
                        n_boxes=cfg.n_boxes, text_len=cfg.max_text_length,
                        vocab_size=cfg.vocab_size, answer_vocab=8)
    from vqacl_tpu.data.collate import collate
    b = collate(data.examples, feat_dim=cfg.feat_dim, n_boxes=cfg.n_boxes,
                max_text_length=cfg.max_text_length)["tensors"]
    args = (params, cfg, jnp.asarray(b["input_ids"]),
            jnp.asarray(b["vis_feats"]), jnp.asarray(b["boxes"]))
    h_ref, m_ref = encode(*args, dtype=jnp.float32)
    cfg.fused_attention = True
    cfg.fused_interpret = True
    h_fused, m_fused = encode(*args, dtype=jnp.float32)
    cfg.fused_attention = False
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(m_fused), np.asarray(m_ref))


def test_text_block_bias_matches_zero_padded_full(rng, impl):
    """pos_bias [H,L,L] (text-text block, the production joint-encoder
    path) must equal a full [H,S,S] bias that is zero outside the block —
    forward AND gradients (incl. the block-only dbias)."""
    B, S, L, H, dk = 2, 56, 20, 4, 16
    q = jnp.asarray(rng.normal(size=(B, S, H, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, dk)).astype(np.float32))
    bias_blk = jnp.asarray(rng.normal(size=(H, L, L)).astype(np.float32))
    full = jnp.zeros((H, S, S)).at[:, :L, :L].set(bias_blk)
    mask = np.ones((B, S), np.float32)
    mask[1, 40:] = 0.0
    mask = jnp.asarray(mask)

    def loss_blk(q, k, v, b):
        o = fused_encoder_attention(q, k, v, b, mask, interpret=True)
        return jnp.sum(o * jnp.sin(o))

    def loss_ref(q, k, v, b):
        o = reference_attention(q, k, v, b, mask)
        return jnp.sum(o * jnp.sin(o))

    v_blk, g_blk = jax.value_and_grad(loss_blk, argnums=(0, 1, 2, 3))(
        q, k, v, bias_blk)
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        q, k, v, full)
    np.testing.assert_allclose(float(v_blk), float(v_ref), rtol=2e-5)
    for a, b in zip(g_blk[:3], g_ref[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_blk[3]),
                               np.asarray(g_ref[3][:, :L, :L]),
                               rtol=2e-4, atol=2e-4)


def test_cross_attention_matches_reference(rng):
    """Rectangular bias-free kernel (decoder cross-attention): q length
    != kv length, forward and q/k/v grads vs the einsum reference."""
    from vqacl_tpu.ops.fused_attention import fused_cross_attention

    B, Tq, Sk, H, dk = 3, 9, 21, 4, 16
    q = jnp.asarray(rng.normal(size=(B, Tq, H, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Sk, H, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Sk, H, dk)).astype(np.float32))
    mask = np.ones((B, Sk), np.float32)
    mask[0, 15:] = 0.0
    mask[2, 5:] = 0.0
    mask = jnp.asarray(mask)

    def ref(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        s = s + (1.0 - mask[:, None, None, :]) * -1e9
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                       preferred_element_type=jnp.float32)
        return o.astype(q.dtype).reshape(B, Tq, H * dk)

    def loss_fused(q, k, v):
        o = fused_cross_attention(q, k, v, mask, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = ref(q, k, v)
        return jnp.sum(o * jnp.cos(o))

    np.testing.assert_allclose(
        np.asarray(fused_cross_attention(q, k, v, mask, interpret=True)),
        np.asarray(ref(q, k, v)), rtol=2e-5, atol=2e-5)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad {name}")


def test_decoder_stack_fused_matches_unfused(rng):
    """Full decoder stack (causal self-attn kernel + rectangular cross
    kernel) vs the einsum path — forward AND parameter gradients (incl.
    the relative-bias table through the kernel's block-bias grad)."""
    from vqacl_tpu.models import t5
    from vqacl_tpu.utils.config import tiny_model_config

    cfg = tiny_model_config(d_kv=16)
    p = t5.init_stack(jax.random.PRNGKey(1), cfg, is_decoder=True)
    B, T, S = 3, 9, 17
    x = jnp.asarray(rng.normal(size=(B, T, cfg.d_model)).astype(np.float32))
    enc = jnp.asarray(rng.normal(size=(B, S, cfg.d_model)).astype(np.float32))
    em = np.ones((B, S), np.float32)
    em[1, 12:] = 0.0
    em = jnp.asarray(em)

    def run(params, fused):
        return t5.decoder_stack(params, cfg, x, enc, em, fused=fused)

    np.testing.assert_allclose(np.asarray(run(p, {"interpret": True})),
                               np.asarray(run(p, None)),
                               rtol=2e-4, atol=2e-4)

    def loss(params, fused):
        return jnp.sum(jnp.sin(run(params, fused)))

    g1 = jax.grad(lambda q: loss(q, {"interpret": True}))(p)
    g2 = jax.grad(lambda q: loss(q, None))(p)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    for (path1, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"grad {jax.tree_util.keystr(path1)}")


def test_shard_map_kernel_on_dp_mesh(rng):
    """The shard_map-wrapped kernel (multi-device path) must match the
    single-device kernel and the einsum reference on the 8-device CPU
    mesh — forward AND gradients, incl. the psum'd bias cotangent."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = Mesh(np.asarray(devs[:4]), ("dp",))

    B, S, L, H, dk = 8, 24, 10, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, dk)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(H, L, L)).astype(np.float32))
    mask = np.ones((B, S), np.float32)
    mask[3, 15:] = 0.0
    mask = jnp.asarray(mask)
    full = jnp.zeros((H, S, S)).at[:, :L, :L].set(bias)

    shard = NamedSharding(mesh, P("dp"))
    qs = jax.device_put(q, shard)
    ks = jax.device_put(k, shard)
    vs = jax.device_put(v, shard)
    ms = jax.device_put(mask, shard)

    def loss_sharded(q, k, v, b):
        o = fused_encoder_attention(q, k, v, b, ms, interpret=True,
                                    mesh=mesh)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v, b):
        o = reference_attention(q, k, v, b, mask)
        return jnp.sum(o * jnp.cos(o))

    v_s, g_s = jax.jit(jax.value_and_grad(loss_sharded, argnums=(0, 1, 2, 3))
                       )(qs, ks, vs, bias)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        q, k, v, full)
    np.testing.assert_allclose(float(v_s), float(v_r), rtol=2e-5)
    for a, b in zip(g_s[:3], g_r[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    # bias grad: per-shard partials must have been psum'd over dp
    np.testing.assert_allclose(np.asarray(g_s[3]),
                               np.asarray(g_r[3][:, :L, :L]),
                               rtol=2e-4, atol=2e-4)
