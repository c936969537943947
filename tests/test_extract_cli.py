"""Extraction CLI drivers + small util modules.

The compute inside (vision/frcnn.py, vision/video.py) is oracle-tested
elsewhere (test_vision.py, test_video_features.py); these tests cover
the DRIVER glue the reference implements in its per-dataset scripts
(feature_extraction/coco_proposal.py etc.): directory enumeration,
given-box padding (detectron2_given_box_maxnms.py semantics), output
format selection (h5 / native pack), and argument plumbing — with the
heavy model calls stubbed so the suite stays fast.
"""

import json
import os

import numpy as np
import pytest

from vqacl_tpu.cli import extract_features, extract_video_features


def _fake_record(img_id: str, h: int, w: int, n_boxes: int = 36) -> dict:
    rng = np.random.default_rng(abs(hash(img_id)) % (2**32))
    boxes = rng.uniform(0, min(h, w) / 2, (n_boxes, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    return {"features": rng.normal(size=(n_boxes, 2048)).astype(np.float32),
            "boxes": boxes, "img_h": h, "img_w": w,
            "obj_id": np.arange(n_boxes, dtype=np.int64),
            "obj_conf": np.linspace(1, 0, n_boxes, dtype=np.float32)}


@pytest.fixture
def image_dir(tmp_path):
    from PIL import Image
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for name in ("COCO_val2014_000000000001.jpg", "im2.png"):
        arr = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / name)
    (d / "notes.txt").write_text("ignored: not an image")
    return str(d)


@pytest.fixture
def stub_frcnn(monkeypatch):
    """Stub the jit-compiled model entry points; keep host-side resize/
    pad/NMS-free plumbing real."""
    from vqacl_tpu.vision import frcnn
    calls = {"extract_image": [], "given_boxes": []}
    monkeypatch.setattr(frcnn, "init_frcnn", lambda rng: {"stub": True})

    def fake_extract_image(params, bgr, n_boxes=36):
        assert params == {"stub": True}
        calls["extract_image"].append(bgr.shape)
        return _fake_record(str(bgr.shape), *bgr.shape[:2], n_boxes)

    def fake_given_boxes(params, img, boxes):
        calls["given_boxes"].append(np.asarray(boxes))
        n = len(boxes)
        return (np.zeros((n, 2048), np.float32),
                np.zeros((n,), np.int64), np.ones((n,), np.float32))

    monkeypatch.setattr(frcnn, "extract_image", fake_extract_image)
    monkeypatch.setattr(frcnn, "extract_given_boxes", fake_given_boxes)
    return calls


def test_extract_cli_h5(image_dir, stub_frcnn, tmp_path):
    """Directory driver → reference h5 schema, non-images skipped,
    readable through the data layer's H5FeatureStore."""
    out = str(tmp_path / "val2014_obj36.h5")
    extract_features.main(["--images", image_dir, "--out", out])
    assert len(stub_frcnn["extract_image"]) == 2

    from vqacl_tpu.data.features import H5FeatureStore
    store = H5FeatureStore({"img": out})
    feats, boxes = store.get("COCO_val2014_000000000001")
    assert feats.shape == (36, 2048)
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0   # normalized
    assert "im2" in store and "notes" not in store


def test_extract_cli_given_boxes(image_dir, stub_frcnn, tmp_path):
    """--boxes_json (the *_gt.py drivers): images absent from the json
    are skipped; short box lists pad to n_boxes by repeating the last
    row; boxes reach the model scaled by the resize factor."""
    boxes_json = str(tmp_path / "boxes.json")
    gt = [[0.0, 0.0, 16.0, 12.0], [4.0, 4.0, 20.0, 20.0]]
    with open(boxes_json, "w") as f:
        json.dump({"im2": gt}, f)
    out = str(tmp_path / "gt_obj36.h5")
    extract_features.main(["--images", image_dir, "--out", out,
                           "--boxes_json", boxes_json])
    # only im2 is listed → one model call
    assert len(stub_frcnn["given_boxes"]) == 1
    sent = stub_frcnn["given_boxes"][0]
    assert sent.shape == (36, 4)
    # 24x32 image, shortest edge 24 → scale 800/24
    scale = 800.0 / 24.0
    np.testing.assert_allclose(sent[0], np.asarray(gt[0]) * scale,
                               rtol=1e-5)
    np.testing.assert_allclose(sent[1], np.asarray(gt[1]) * scale,
                               rtol=1e-5)
    # padding repeats the final row
    np.testing.assert_allclose(sent[2:], np.tile(sent[1], (34, 1)),
                               rtol=1e-5)

    import h5py
    with h5py.File(out) as f:
        assert list(f) == ["im2"]
        assert f["im2"]["features"].shape == (36, 2048)
        # stored boxes are the UNSCALED originals (original pixel coords)
        np.testing.assert_allclose(np.asarray(f["im2"]["boxes"])[0], gt[0])


def test_extract_cli_pack(image_dir, stub_frcnn, tmp_path):
    """--pack → native mmap pack, readable by PackedFeatureStore."""
    out = str(tmp_path / "val2014.vfpack")
    extract_features.main(["--images", image_dir, "--out", out, "--pack"])

    from vqacl_tpu.data.packed_cache import PackedFeatureStore
    store = PackedFeatureStore(out)
    try:
        assert store.n_images == 2 and store.n_boxes == 36
        feats, boxes = store.get("im2")
        assert feats.shape == (36, 2048)
        assert boxes.min() >= 0.0 and boxes.max() <= 1.0
        assert "missing" not in store
    finally:
        store.close()


def test_extract_video_cli_plumbing(tmp_path, monkeypatch):
    """Video CLI: source enumeration is real, the extractor call is
    recorded (vision/video.py itself is tested in
    test_video_features.py)."""
    from vqacl_tpu.vision import frcnn, video
    vids = tmp_path / "vids"
    vids.mkdir()
    clip = np.zeros((8, 16, 16, 3), np.uint8)
    np.save(vids / "vid001.npy", clip)
    (vids / "frames002").mkdir()
    (vids / "README").write_text("not a video")

    monkeypatch.setattr(frcnn, "init_frcnn", lambda rng: {"stub": True})
    rec = {}

    def fake_extract(params, sources, out_h5, side, verbose,
                     motion_params, motion_side):
        rec.update(params=params, sources=sources, out=out_h5, side=side,
                   motion_params=motion_params, motion_side=motion_side)

    monkeypatch.setattr(video, "extract_videos", fake_extract)
    out = str(tmp_path / "app_mot_train.h5")
    extract_video_features.main(["--videos", str(vids), "--out", out,
                                 "--side", "64"])
    assert rec["params"] == {"stub": True}
    assert sorted(rec["sources"]) == ["frames002", "vid001"]
    assert rec["out"] == out and rec["side"] == 64
    assert rec["motion_params"] is None and rec["motion_side"] == 112


def test_download_backbones_offline(monkeypatch, tmp_path):
    """Air-gapped behavior: a missing backbone reports an actionable
    status instead of raising (utils/backbones.py; the reference's
    download_backbones.py would crash)."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("TRANSFORMERS_OFFLINE", "1")
    from vqacl_tpu.utils.backbones import download_backbones
    status = download_backbones(("definitely-not-a-model-xyz",),
                                cache_dir=str(tmp_path))
    assert set(status) == {"definitely-not-a-model-xyz"}
    assert status["definitely-not-a-model-xyz"].startswith("unavailable")


def test_step_timer():
    from vqacl_tpu.utils.profiling import StepTimer
    t = StepTimer(sync_every=2)
    for _ in range(6):
        t.step(sync_value=np.float32(1.0))
    s = t.summary()
    assert s["steps"] == 6
    assert len(t.times) == 3
    assert s["ms_per_step"] > 0.0
    # no samples yet → 0.0, not a crash
    assert StepTimer().summary()["ms_per_step"] == 0.0
