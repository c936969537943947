"""Vision pipeline: shapes, invariants, and end-to-end extraction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.vision import frcnn, resnet, rpn

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def test_caffe_maxpool_ceil_mode():
    # H=W=7: caffe ceil mode → out = ceil((7-3)/2)+1 = 3
    x = jnp.arange(49, dtype=jnp.float32).reshape(1, 7, 7, 1)
    y = resnet.caffe_maxpool(x)
    assert y.shape == (1, 3, 3, 1)
    # top-left window max = x[2,2] = 16
    assert float(y[0, 0, 0, 0]) == 16.0


def test_backbone_stride16():
    params = resnet.init_resnet101_c4(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 224, 224, 3))
    feat = resnet.backbone_c4(params, x)
    assert feat.shape == (1, 14, 14, 1024)
    r5_in = jnp.zeros((2, 14, 14, 1024))
    out = resnet.res5_head(params, r5_in)
    assert out.shape == (2, 7, 7, 2048)


def test_anchor_grid_layout():
    a = rpn.anchor_grid(2, 3)
    assert a.shape == (2 * 3 * rpn.num_anchors(), 4)
    # first anchor centered at (0,0): size 32, aspect 0.5 → w≈45.25, h≈22.6
    w = float(a[0, 2] - a[0, 0])
    h = float(a[0, 3] - a[0, 1])
    assert abs(w * h - 32 * 32) < 1e-2
    assert abs(h / w - 0.5) < 1e-4


def test_decode_deltas_identity_and_clip():
    anchors = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    # zero deltas → identity
    out = rpn.decode_deltas(anchors, jnp.zeros((1, 4)))
    np.testing.assert_allclose(np.asarray(out), anchors, atol=1e-5)
    # huge dw is clamped at log(1000/16)
    out = rpn.decode_deltas(anchors, jnp.asarray([[0.0, 0.0, 50.0, 0.0]]))
    assert float(out[0, 2] - out[0, 0]) <= 16 * 1000 / 16 + 1e-3


def test_select_proposals_static_shape():
    rng = np.random.default_rng(0)
    n = 500
    boxes = rng.uniform(0, 200, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 60, (n, 2))
    logits = rng.normal(size=n).astype(np.float32)
    props, valid = rpn.select_proposals(
        jnp.asarray(logits), jnp.asarray(boxes),
        jnp.asarray([220.0, 220.0]), pre_nms_topk=200, post_nms_topk=50)
    assert props.shape == (50, 4)
    assert valid.shape == (50,)
    assert bool(valid[0])
    p = np.asarray(props)
    assert (p[:, 0] <= p[:, 2] + 1e-5).all()
    assert p.min() >= -1e-5 and p.max() <= 220.0 + 1e-4


@pytest.mark.slow
def test_extract_image_end_to_end():
    """Random-weight FRCNN over a small synthetic image → 36 records in
    the reference h5 schema."""
    params = frcnn.init_frcnn(jax.random.PRNGKey(0))
    img = (np.random.default_rng(0).uniform(0, 255, (240, 320, 3))
           .astype(np.uint8))
    # shrink pad buckets for test speed
    rec = frcnn.extract_image(params, img, n_boxes=36)
    assert rec["features"].shape == (36, 2048)
    assert rec["boxes"].shape == (36, 4)
    assert rec["img_h"] == 240 and rec["img_w"] == 320
    b = rec["boxes"]
    assert (b[:, 0] <= b[:, 2] + 1e-4).all()
    assert b[:, (0, 2)].max() <= 320 + 1e-3
    assert b[:, (1, 3)].max() <= 240 + 1e-3


def test_h5_roundtrip(tmp_path):
    from vqacl_tpu.data.features import H5FeatureStore, write_h5
    rng = np.random.default_rng(0)
    rec = {
        "features": rng.normal(size=(36, 2048)).astype(np.float32),
        "boxes": np.abs(rng.normal(size=(36, 4))).astype(np.float32) * 50,
        "img_h": 100, "img_w": 200,
    }
    rec["boxes"][:, 2:] += rec["boxes"][:, :2]
    rec["boxes"] = rec["boxes"].clip(0, 100)
    path = str(tmp_path / "test_obj36.h5")
    write_h5(path, [("img_1", rec)])
    store = H5FeatureStore({"img": path})
    feats, boxes = store.get("img_1")
    np.testing.assert_allclose(feats, rec["features"])
    assert boxes.min() >= 0 and boxes.max() <= 1.0


@pytest.mark.slow
def test_extract_regions_batch_shapes():
    """Batched extraction (vmap of the single-image impl) — structure
    check; numerics are the single-image path's, already oracle-tested."""
    params = frcnn.init_frcnn(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (2, 96, 112, 3)).astype(np.float32)
    hws = np.asarray([[96.0, 112.0], [80.0, 100.0]], np.float32)
    rb = frcnn.extract_regions_batch(params, jnp.asarray(imgs),
                                     jnp.asarray(hws), n_boxes=8,
                                     n_proposals=50)
    assert rb.features.shape == (2, 8, 2048)
    assert rb.boxes.shape == (2, 8, 4)
    assert np.isfinite(np.asarray(rb.features)).all()


def test_validate_features_matching():
    """match_and_score: identical records → perfect match."""
    from vqacl_tpu.cli.validate_features import match_and_score
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(8, 32)).astype(np.float32)
    boxes = rng.uniform(0, 50, (8, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2] + 5
    s = match_and_score({"features": feats, "boxes": boxes}, feats, boxes)
    assert s["n_matched"] == 8
    assert s["mean_iou"] > 0.999
    assert s["mean_feature_cosine"] > 0.999


def test_draw_boxes(tmp_path):
    from vqacl_tpu.vision.visualize import draw_boxes
    img = np.zeros((60, 80, 3), np.uint8)
    boxes = np.array([[5, 5, 30, 30], [40, 10, 70, 50]], np.float32)
    out = str(tmp_path / "viz.png")
    draw_boxes(img, boxes, labels=["cat", "dog"],
               scores=np.array([0.9, 0.5]), out_path=out)
    import os
    assert os.path.getsize(out) > 0
