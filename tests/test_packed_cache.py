"""Native mmap feature pack: build, roundtrip, h5 conversion, batch gather."""

import numpy as np
import pytest

from vqacl_tpu.data.features import write_h5
from vqacl_tpu.data.packed_cache import (
    PackedFeatureStore, fnv1a, pack_from_h5, write_pack,
)


def make_records(n, rng, n_boxes=36, feat_dim=64):
    recs = []
    for i in range(n):
        feats = rng.normal(size=(n_boxes, feat_dim)).astype(np.float32)
        boxes = rng.uniform(0, 50, size=(n_boxes, 4)).astype(np.float32)
        boxes[:, 2:] += boxes[:, :2]
        recs.append((f"img_{i}", feats, boxes.clip(0, 100), 100.0, 100.0))
    return recs


def test_pack_roundtrip(tmp_path, rng):
    recs = make_records(10, rng)
    path = str(tmp_path / "t.vfpack")
    write_pack(path, recs, n_boxes=36, feat_dim=64)
    store = PackedFeatureStore(path)
    assert store.n_images == 10
    assert store.feat_dim == 64
    for img_id, feats, boxes, h, w in recs:
        f, b = store.get(img_id)
        np.testing.assert_allclose(f, feats)
        np.testing.assert_allclose(b, (boxes / 100.0).clip(0, 1), rtol=1e-6)
    assert "img_3" in store
    assert "nope" not in store
    with pytest.raises(KeyError):
        store.get("missing")


def test_batch_gather_threads(tmp_path, rng):
    recs = make_records(64, rng)
    path = str(tmp_path / "t.vfpack")
    write_pack(path, recs, n_boxes=36, feat_dim=64)
    store = PackedFeatureStore(path, n_threads=4)
    ids = [f"img_{i}" for i in (5, 3, 60, 0, 5)]
    feats, boxes = store.get_batch(ids)
    assert feats.shape == (5, 36, 64)
    np.testing.assert_allclose(feats[0], recs[5][1])
    np.testing.assert_allclose(feats[4], recs[5][1])
    np.testing.assert_allclose(feats[2], recs[60][1])


def test_pack_from_h5(tmp_path, rng):
    h5p = str(tmp_path / "ref_obj36.h5")
    rec = {
        "features": rng.normal(size=(36, 2048)).astype(np.float32),
        "boxes": rng.uniform(0, 80, size=(36, 4)).astype(np.float32),
        "img_h": 90, "img_w": 120,
    }
    write_h5(h5p, [("COCO_x_1", rec)])
    packp = str(tmp_path / "ref.vfpack")
    n = pack_from_h5([h5p], packp)
    assert n == 1
    store = PackedFeatureStore(packp)
    f, b = store.get("COCO_x_1")
    np.testing.assert_allclose(f, rec["features"])
    expect = rec["boxes"].copy()
    expect[:, (0, 2)] /= 120
    expect[:, (1, 3)] /= 90
    np.testing.assert_allclose(b, expect.clip(0, 1), rtol=1e-6)


def test_fnv1a_stability():
    assert fnv1a("") == 1469598103934665603
    assert fnv1a("COCO_val2014_000000001") != fnv1a("COCO_val2014_000000002")
