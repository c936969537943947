"""Arrow extraction format (reference inference/extracting_data.py schema)."""

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow")

from vqacl_tpu.data.arrow_store import (ArrowFeatureStore, arrow_schema,
                                        parse_img_id, write_arrow)


def _records(n, n_boxes=6, feat_dim=8, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        yield f"COCO_val2014_{i:012d}.jpg", {
            "features": rng.normal(size=(n_boxes, feat_dim)).astype(np.float32),
            "boxes": rng.uniform(0, 64, (n_boxes, 4)).astype(np.float32),
            "img_h": 64, "img_w": 48,
            "obj_id": rng.integers(0, 10, n_boxes).astype(np.float32),
            "obj_conf": rng.uniform(size=n_boxes).astype(np.float32),
            "attr_id": rng.integers(0, 4, n_boxes).astype(np.float32),
            "attr_conf": rng.uniform(size=n_boxes).astype(np.float32),
        }


def test_roundtrip(tmp_path):
    path = str(tmp_path / "feats.arrow")
    recs = list(_records(5))
    n = write_arrow(path, iter(recs), n_boxes=6, feat_dim=8)
    assert n == 5
    store = ArrowFeatureStore(path)
    assert len(store) == 5
    f, b = store.get("COCO_val2014_000000000003.jpg")
    np.testing.assert_allclose(f, recs[3][1]["features"], rtol=1e-6)
    np.testing.assert_allclose(b, recs[3][1]["boxes"], rtol=1e-6)
    # integer key also works (reference stores int32 img_id)
    f2, _ = store.get(3)
    np.testing.assert_allclose(f2, f)
    _, _, sizes = store.get_with_size(3)
    assert sizes == [64.0, 48.0]


def test_schema_matches_reference_layout(tmp_path):
    """Field names/types of extracting_data.py:27-41 (DEFAULT_SCHEMA)."""
    sch = arrow_schema(36, 2048)
    assert sch.names == ["attr_ids", "attr_probs", "boxes", "img_id",
                         "obj_ids", "obj_probs", "roi_features", "sizes",
                         "preds_per_image"]
    assert sch.field("img_id").type == pa.int32()
    assert sch.field("roi_features").type == pa.list_(
        pa.list_(pa.float32(), 2048), 36)
    assert sch.field("boxes").type == pa.list_(pa.list_(pa.float32(), 4), 36)


def test_padding_short_detections(tmp_path):
    path = str(tmp_path / "short.arrow")
    rec = {"features": np.ones((3, 8), np.float32),
           "boxes": np.ones((3, 4), np.float32), "img_h": 10, "img_w": 10}
    write_arrow(path, [("img_7", rec)], n_boxes=6, feat_dim=8)
    store = ArrowFeatureStore(path)
    f, b = store.get(7)
    assert f.shape == (6, 8) and b.shape == (6, 4)
    assert (f[3:] == 0).all() and (b[3:] == 0).all()
    # readable by generic pyarrow too, with preds_per_image preserved
    with pa.OSFile(path, "rb") as fh:
        t = pa.ipc.open_file(fh).read_all()
    assert t.column("preds_per_image").to_pylist() == [3]


def test_parse_img_id():
    assert parse_img_id("COCO_val2014_000000000042.jpg") == 42
    assert parse_img_id("12") == 12
    assert parse_img_id(9) == 9
    assert parse_img_id("no_digits_here") == parse_img_id("no_digits_here")
