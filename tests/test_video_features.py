"""NExT-QA video feature extraction (vision/video.py).

Validates the ``app_mot`` producer the reference lacks: sampling,
frame sources, appearance + RGB-diff motion halves, the h5 schema the
NExT-QA data layer consumes, and an end-to-end train step on
self-extracted features.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.vision import video

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def test_sample_indices_uniform():
    idx = video.sample_indices(160, 16)
    assert idx.shape == (16,)
    assert idx[0] == 5 and idx[-1] == 155        # clip centers
    assert np.all(np.diff(idx) == 10)
    # short video: indices clamp, never out of range
    idx = video.sample_indices(4, 16)
    assert idx.min() >= 0 and idx.max() <= 3


def test_load_frames_npy_and_dir(tmp_path):
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, size=(40, 24, 32, 3), dtype=np.uint8)
    np.save(tmp_path / "v1.npy", clip)
    frames = video.load_frames(str(tmp_path / "v1.npy"))
    assert frames.shape == (16, 24, 32, 3)
    np.testing.assert_array_equal(frames[0], clip[1])   # center of bin 0

    from PIL import Image
    fdir = tmp_path / "v2"
    os.makedirs(fdir)
    for i in range(20):
        Image.fromarray(clip[i]).save(fdir / f"f{i:03d}.png")
    frames2 = video.load_frames(str(fdir))
    assert frames2.shape == (16, 24, 32, 3)


@pytest.fixture(scope="module")
def backbone():
    from vqacl_tpu.vision import frcnn
    return frcnn.init_frcnn(jax.random.PRNGKey(0))


def test_extract_and_h5_roundtrip(tmp_path, backbone):
    rng = np.random.default_rng(1)
    moving = rng.integers(0, 255, size=(32, 40, 40, 3), dtype=np.uint8)
    static = np.tile(moving[:1], (32, 1, 1, 1))
    np.save(tmp_path / "vid_moving.npy", moving)
    np.save(tmp_path / "vid_static.npy", static)

    sources = video.enumerate_video_sources(str(tmp_path))
    assert set(sources) == {"vid_moving", "vid_static"}
    out = str(tmp_path / "app_mot_train.h5")
    table = video.extract_videos(backbone, sources, out_h5=out, side=32)

    feat = table["vid_moving"]
    assert feat.shape == (16, 4096)
    app, mot = feat[:, :2048], feat[:, 2048:]
    assert np.abs(app).max() > 0 and np.abs(mot).max() > 0
    assert not np.allclose(app, mot)
    # static clip: zero temporal difference → constant motion features
    smot = table["vid_static"][:, 2048:]
    np.testing.assert_allclose(smot, np.tile(smot[:1], (16, 1)),
                               rtol=1e-4, atol=1e-4)
    # moving clip: motion features vary across sample points
    assert np.abs(mot - mot[0]).max() > 1e-3

    # the NExT-QA data layer reads the file (motion half + dummy boxes)
    from vqacl_tpu.nextqa.data import VideoFeatureStore
    store = VideoFeatureStore(h5_path=out)
    f, boxes = store.get("vid_moving")
    assert f.shape == (16, 2048)
    np.testing.assert_allclose(f, mot, rtol=1e-6)
    assert boxes.shape == (16, 4)


def test_train_step_on_self_extracted_features(tmp_path, backbone):
    """End-to-end: self-extracted motion features drive a finite,
    decreasing NExT-QA-shaped train step (16 clip tokens, dummy boxes)."""
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.nextqa.data import dummy_boxes
    from vqacl_tpu.train.optim import make_transform
    from vqacl_tpu.train.state import TrainState
    from vqacl_tpu.train.step import make_train_step
    from vqacl_tpu.utils.config import Config, tiny_model_config

    rng = np.random.default_rng(2)
    clips = {f"v{i}": rng.integers(0, 255, size=(24, 32, 32, 3),
                                   dtype=np.uint8) for i in range(4)}
    for k, v in clips.items():
        np.save(tmp_path / f"{k}.npy", v)
    table = video.extract_videos(
        backbone, video.enumerate_video_sources(str(tmp_path)), side=32)

    cfg = Config()
    cfg.model = tiny_model_config(feat_dim=2048, n_boxes=16)
    cfg.train.lr = 1e-2
    B = 4
    vis = np.stack([table[f"v{i}"][:, 2048:] for i in range(B)])
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 200, size=(B, 6))),
        "vis_feats": jnp.asarray(vis, jnp.float32),
        "boxes": jnp.asarray(np.tile(dummy_boxes()[None], (B, 1, 1))),
        "target_ids": jnp.asarray(rng.integers(2, 200, size=(B, 5))),
        "scores": jnp.ones((B,), jnp.float32),
        "ques_labels": jnp.eye(10)[rng.integers(0, 10, B)],
        "cate_labels": jnp.eye(80)[rng.integers(0, 80, B)],
    }
    tx = make_transform(cfg.train)
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    proto = ProtoState.create(10, 80, cfg.model.d_model)
    state = TrainState.create(params, tx, proto, jax.random.PRNGKey(1),
                              warmup_iters=0.0, t_total=20.0)
    step = make_train_step(cfg, tx, dtype=jnp.float32)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
