"""HBM feature cache: replicated + dp-sharded lookup, cached train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.data.device_cache import DeviceFeatureCache, \
    make_cached_eval_step, make_cached_train_step
from vqacl_tpu.data.features import MemoryFeatureStore
from vqacl_tpu.parallel import make_mesh, replicate, shard_batch

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def make_table(rng, n=20, n_boxes=4, feat_dim=16):
    feats = rng.normal(size=(n, n_boxes, feat_dim)).astype(np.float32)
    boxes = rng.uniform(0, 1, (n, n_boxes, 4)).astype(np.float32)
    return feats, boxes


def test_lookup_replicated(rng):
    feats, boxes = make_table(rng)
    cache = DeviceFeatureCache(feats, boxes, feat_dtype=jnp.float32)
    slots = jnp.asarray([3, 0, 19, -1, 7], jnp.int32)
    f, b = cache.lookup(slots)
    np.testing.assert_allclose(np.asarray(f[0]), feats[3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f[2]), feats[19], rtol=1e-6)
    assert float(jnp.abs(f[3]).sum()) == 0.0      # pad slot → zeros
    np.testing.assert_allclose(np.asarray(b[4]), boxes[7], rtol=1e-6)


def test_lookup_sharded_over_dp(rng):
    ctx = make_mesh(dp=8, tp=1)
    feats, boxes = make_table(rng, n=21)  # non-divisible → padded
    cache = DeviceFeatureCache(feats, boxes, mesh_ctx=ctx, shard=True,
                               feat_dtype=jnp.float32)
    slots = jnp.asarray([20, 1, 13, 5], jnp.int32)
    f, b = cache.lookup(slots)
    np.testing.assert_allclose(np.asarray(f[0]), feats[20], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f[2]), feats[13], rtol=1e-6)


def test_from_store(rng):
    store = MemoryFeatureStore()
    for i in range(5):
        store.put(f"img{i}", rng.normal(size=(4, 16)).astype(np.float32),
                  rng.uniform(0, 1, (4, 4)).astype(np.float32))
    cache, slot_of = DeviceFeatureCache.from_store(
        store, [f"img{i}" for i in range(5)], feat_dtype=jnp.float32)
    assert slot_of["img3"] == 3
    f, _ = cache.lookup(jnp.asarray([slot_of["img2"]], jnp.int32))
    np.testing.assert_allclose(np.asarray(f[0]), store.get("img2")[0],
                               rtol=1e-6)


def test_cached_train_step_matches_explicit(rng):
    """slots-based step == explicit-features step, numerically."""
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_train_step
    from vqacl_tpu.utils.config import Config, tiny_model_config

    cfg = Config()
    cfg.model = tiny_model_config()
    data = SyntheticVQA(16, seed=0, feat_dim=cfg.model.feat_dim,
                        n_boxes=cfg.model.n_boxes,
                        text_len=cfg.model.max_text_length,
                        vocab_size=cfg.model.vocab_size, answer_vocab=8)
    batch = next(data.batches(16))["tensors"]
    cache = DeviceFeatureCache(batch["vis_feats"], batch["boxes"],
                               feat_dtype=jnp.float32)
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    proto = ProtoState.create(10, 80, cfg.model.d_model)
    tx = make_transform(cfg.train)

    s1 = TrainState.create(params, tx, proto, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, dtype=jnp.float32, donate=False)
    _, m1 = step(s1, batch)

    s2 = TrainState.create(params, tx, proto, jax.random.PRNGKey(1))
    cstep = make_cached_train_step(cfg, tx, cache, dtype=jnp.float32,
                                   donate=False)
    cached_batch = {k: v for k, v in batch.items()
                    if k not in ("vis_feats", "boxes")}
    cached_batch["slots"] = np.arange(16, dtype=np.int32)
    _, m2 = cstep(s2, cached_batch)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5


def test_trainer_with_device_cache(tmp_path):
    """Full CL loop with the HBM cache enabled — results match the
    host-feature path exactly (same seeds, same math)."""
    from vqacl_tpu.cl.trainer import VQACLTrainer
    from vqacl_tpu.data.synthetic_module import SyntheticDataModule
    from vqacl_tpu.data.tokenizer import VLT5Tokenizer
    from vqacl_tpu.utils.config import Config, tiny_model_config

    def run(device_cache):
        cfg = Config()
        cfg.model = tiny_model_config()
        cfg.model.vocab_size = 32200
        cfg.train.lr = 1e-2
        cfg.train.batch_size = 16
        cfg.train.valid_batch_size = 16
        cfg.train.epochs = 1
        cfg.train.m_size = 20
        cfg.data.device_cache = device_cache
        cfg.output = str(tmp_path / ("dc" if device_cache else "host"))
        tok = VLT5Tokenizer()
        data = SyntheticDataModule(tok, tasks=["q_recognition"],
                                   n_train_per_task=48, n_val_per_task=8,
                                   n_test_per_task=8,
                                   feat_dim=cfg.model.feat_dim,
                                   n_boxes=cfg.model.n_boxes,
                                   answer_vocab=4, seed=0)
        tr = VQACLTrainer(cfg, data, tok, verbose=False, dtype=jnp.float32)
        metrics = tr.train()
        return metrics["Avg_acc"], tr

    acc_cache, tr = run(True)
    assert tr._cache is not None
    acc_host, _ = run(False)
    assert abs(acc_cache - acc_host) < 1e-6


def test_int8_cache_dequant_error_bound(rng):
    """int8 table: dequantized features within s/2 of the originals
    (s = per-(image,box) rowmax/127), half the bytes, pad slots zero."""
    feats, boxes = make_table(rng)
    cache = DeviceFeatureCache(feats, boxes, feat_dtype=jnp.int8)
    assert cache.feats.dtype == jnp.int8 and cache.scales is not None
    slots = jnp.asarray([0, 7, 19, -1], jnp.int32)
    f, b = cache.lookup(slots)
    for row, src in zip((0, 1, 2), (0, 7, 19)):
        atol = np.abs(feats[src]).max(axis=-1, keepdims=True) / 127.0 / 2 \
            + 1e-7
        assert (np.abs(np.asarray(f[row]) - feats[src]) <= atol).all()
    assert float(jnp.abs(f[3]).sum()) == 0.0
    np.testing.assert_allclose(np.asarray(b[1]), boxes[7], rtol=1e-6)


def test_int8_cache_from_store_and_sharded(rng):
    """from_store int8 fill == direct quantization; dp-row-sharded int8
    table (scales sharded alongside) gathers correctly."""
    store = MemoryFeatureStore()
    for i in range(5):
        store.put(f"img{i}", rng.normal(size=(4, 16)).astype(np.float32),
                  rng.uniform(0, 1, (4, 4)).astype(np.float32))
    ids = [f"img{i}" for i in range(5)]
    cache, slot_of = DeviceFeatureCache.from_store(store, ids,
                                                   feat_dtype=jnp.int8)
    feats = np.stack([store.get(i)[0] for i in ids])
    direct = DeviceFeatureCache(feats,
                                np.stack([store.get(i)[1] for i in ids]),
                                feat_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(cache.feats),
                                  np.asarray(direct.feats))
    np.testing.assert_allclose(np.asarray(cache.scales),
                               np.asarray(direct.scales), rtol=1e-7)

    ctx = make_mesh(dp=8, tp=1)
    feats21, boxes21 = make_table(rng, n=21)
    sharded = DeviceFeatureCache(feats21, boxes21, mesh_ctx=ctx,
                                 shard=True, feat_dtype=jnp.int8)
    f, _ = sharded.lookup(jnp.asarray([20, 3], jnp.int32))
    atol = np.abs(feats21[20]).max(axis=-1, keepdims=True) / 253.0 + 1e-7
    assert (np.abs(np.asarray(f[0]) - feats21[20]) <= atol).all()


def test_int8_cached_eval_runs(rng):
    """make_cached_eval_step over an int8 table decodes finite tokens
    of the right shape (answers may differ from f32 by design)."""
    from vqacl_tpu.data.synthetic import SyntheticVQA
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.utils.config import Config, tiny_model_config

    cfg = Config()
    cfg.model = tiny_model_config()
    m = cfg.model
    feats = rng.normal(size=(6, m.n_boxes, m.feat_dim)).astype(np.float32)
    boxes = rng.uniform(0, 1, (6, m.n_boxes, 4)).astype(np.float32)
    cache = DeviceFeatureCache(feats, boxes, feat_dtype=jnp.int8)
    step = make_cached_eval_step(cfg, cache, dtype=jnp.float32)
    params = init_vlt5_params(jax.random.PRNGKey(0), m)
    proto = ProtoState.create(m.n_ques_types, m.n_categories, m.d_model)
    pool = SyntheticVQA(4, seed=0, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                        text_len=m.max_text_length,
                        vocab_size=m.vocab_size, answer_vocab=8)
    from vqacl_tpu.data.collate import collate
    b = collate(pool.examples, feat_dim=m.feat_dim, n_boxes=m.n_boxes,
                max_text_length=m.max_text_length,
                target_max_length=m.target_max_length)["tensors"]
    b = {k: jnp.asarray(v) for k, v in b.items()
         if k not in ("vis_feats", "boxes")}
    b["slots"] = jnp.asarray([0, 1, 2, 3], jnp.int32)
    toks = np.asarray(step(params, proto, b))
    assert toks.shape == (4, m.gen_max_length - 1)
    assert (toks >= 0).all()
