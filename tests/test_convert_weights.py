"""Detector weight conversion: caffe2 VG naming → vqacl_tpu FRCNN pytree.

Proves the converter on a synthetic checkpoint with real detectron2
caffe2 blob naming (``res4_22_branch2c_w``, ``conv1_bn_s``, ``rpn_*``,
``cls_score_*``, attr head — the weight source of
/root/reference/feature_extraction/detectron2_proposal_maxnms.py:146-163):

  (a) every blob is consumed and the resulting pytree is structurally
      identical (keys + shapes) to ``init_frcnn``'s;
  (b) a conv forward through the HWIO transpose + frozen-BN affine
      matches a numpy oracle computed in the caffe2 NCHW convention;
  (c) npz round-trip is bit-exact;
  (d) the full validate-features harness runs end-to-end on converted
      weights (slow).
"""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqacl_tpu.vision import frcnn, resnet, rpn
from vqacl_tpu.vision.convert_weights import (fold_bn, from_caffe2_dict,
                                              load_caffe2_pkl,
                                              load_npz_params,
                                              save_npz_params)

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)

_STAGE_GEOM = {  # (n_blocks, cin, cmid, cout)
    "res2": (3, 64, 64, 256),
    "res3": (4, 256, 128, 512),
    "res4": (23, 512, 256, 1024),
    "res5": (3, 1024, 512, 2048),
}


def synthetic_caffe2_sd(unique_fill: bool = False) -> dict:
    """Full VG R-101-C4+attr checkpoint in caffe2 naming/shapes (NCHW
    convs, folded-BN s/b pairs). With unique_fill, every blob is a
    distinct constant so consumption can be asserted value-wise."""
    rng = np.random.default_rng(0)
    sd = {}
    counter = [0]

    def blob(name, shape):
        counter[0] += 1
        if unique_fill:
            sd[name] = np.full(shape, float(counter[0]), np.float32)
        else:
            sd[name] = rng.normal(scale=0.05, size=shape).astype(np.float32)

    def conv_bn_blobs(name, cin, cout, k):
        blob(f"{name}_w", (cout, cin, k, k))
        blob(f"{name}_bn_s", (cout,))
        blob(f"{name}_bn_b", (cout,))

    conv_bn_blobs("conv1", 3, 64, 7)
    for stage, (n, cin, cmid, cout) in _STAGE_GEOM.items():
        for i in range(n):
            bin_ = cin if i == 0 else cout
            conv_bn_blobs(f"{stage}_{i}_branch2a", bin_, cmid, 1)
            conv_bn_blobs(f"{stage}_{i}_branch2b", cmid, cmid, 3)
            conv_bn_blobs(f"{stage}_{i}_branch2c", cmid, cout, 1)
            if i == 0:
                conv_bn_blobs(f"{stage}_{i}_branch1", bin_, cout, 1)
    A = rpn.num_anchors()
    blob("conv_rpn_w", (1024, 1024, 3, 3))
    blob("conv_rpn_b", (1024,))
    blob("rpn_cls_logits_w", (A, 1024, 1, 1))
    blob("rpn_cls_logits_b", (A,))
    blob("rpn_bbox_pred_w", (4 * A, 1024, 1, 1))
    blob("rpn_bbox_pred_b", (4 * A,))
    blob("cls_score_w", (frcnn.N_CLASSES + 1, 2048))
    blob("cls_score_b", (frcnn.N_CLASSES + 1,))
    blob("bbox_pred_w", (4, 2048))
    blob("bbox_pred_b", (4,))
    blob("cls_embedding_w", (frcnn.N_CLASSES + 1, 256))
    blob("attr_fc_w", (512, 2048 + 256))
    blob("attr_fc_b", (512,))
    blob("attr_score_w", (frcnn.N_ATTRS + 1, 512))
    blob("attr_score_b", (frcnn.N_ATTRS + 1,))
    return sd


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = v
    return out


def test_structure_matches_init_and_all_blobs_consumed():
    sd = synthetic_caffe2_sd(unique_fill=True)
    params = from_caffe2_dict(sd)
    ref = frcnn.init_frcnn(jax.random.PRNGKey(0))
    got, want = _flat(params), _flat(ref)
    assert set(got) == set(want), (
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}")
    for k in want:
        assert got[k].shape == want[k].shape, \
            f"{k}: {got[k].shape} != {want[k].shape}"
    # every blob consumed: each unique fill constant must appear in some
    # converted leaf (transposes preserve values; no silent defaulting)
    leaf_values = set()
    for v in got.values():
        leaf_values.update(np.unique(v).tolist())
    for name, blob in sd.items():
        c = float(blob.flat[0])
        assert c in leaf_values, f"blob {name} (fill {c}) never consumed"


def test_conv_bn_forward_matches_numpy_oracle():
    """caffe2 NCHW blob → HWIO transpose + frozen-BN affine, checked
    against a direct numpy convolution in the caffe2 convention."""
    rng = np.random.default_rng(1)
    cin, cout, k, H, W = 3, 4, 3, 6, 5
    sd = {
        "conv1_w": rng.normal(size=(cout, cin, k, k)).astype(np.float32),
        "conv1_bn_s": rng.normal(size=(cout,)).astype(np.float32),
        "conv1_bn_b": rng.normal(size=(cout,)).astype(np.float32),
    }
    from vqacl_tpu.vision.convert_weights import _conv_bn
    p = _conv_bn(sd, "conv1")
    x = rng.normal(size=(1, H, W, cin)).astype(np.float32)

    # numpy oracle: SAME padding, NCHW weights as caffe2 stores them
    xp = np.zeros((cin, H + 2, W + 2), np.float32)
    xp[:, 1:-1, 1:-1] = x[0].transpose(2, 0, 1)
    want = np.zeros((cout, H, W), np.float32)
    for o in range(cout):
        for i in range(cin):
            for dy in range(k):
                for dx in range(k):
                    want[o] += sd["conv1_w"][o, i, dy, dx] * \
                        xp[i, dy:dy + H, dx:dx + W]
        want[o] = want[o] * sd["conv1_bn_s"][o] + sd["conv1_bn_b"][o]
    want = np.maximum(want, 0.0).transpose(1, 2, 0)[None]

    got = np.asarray(resnet.conv_bn(
        jax.tree.map(jnp.asarray, p), jnp.asarray(x), stride=1))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fold_bn_matches_batchnorm_eval():
    rng = np.random.default_rng(2)
    g, b = rng.normal(size=8), rng.normal(size=8)
    mu, var = rng.normal(size=8), rng.uniform(0.5, 2.0, 8)
    scale, bias = fold_bn(g, b, mu, var, eps=1e-5)
    x = rng.normal(size=(4, 8))
    want = g * (x - mu) / np.sqrt(var + 1e-5) + b
    np.testing.assert_allclose(x * scale + bias, want, atol=1e-5)
    # raw-BN-stat checkpoints route through fold_bn inside _conv_bn
    sd = {"c_w": rng.normal(size=(8, 2, 1, 1)).astype(np.float32),
          "c_bn_gamma": g, "c_bn_beta": b,
          "c_bn_running_mean": mu, "c_bn_running_var": var}
    from vqacl_tpu.vision.convert_weights import _conv_bn
    p = _conv_bn(sd, "c")
    np.testing.assert_allclose(p["scale"], scale, atol=1e-6)
    np.testing.assert_allclose(p["bias"], bias, atol=1e-6)


def test_npz_roundtrip_exact(tmp_path):
    sd = synthetic_caffe2_sd()
    params = from_caffe2_dict(sd)
    path = str(tmp_path / "frcnn_vg.npz")
    save_npz_params(path, params)
    back = load_npz_params(path)
    got, want = _flat(back), _flat(params)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_load_caffe2_pkl(tmp_path):
    """The detectron2 pkl container shape: {'blobs': {...}} with
    non-array entries to skip."""
    sd = synthetic_caffe2_sd()
    path = str(tmp_path / "vg.pkl")
    with open(path, "wb") as f:
        pickle.dump({"blobs": {**sd, "__meta__": "caffe2",
                               "lr": 0.01}}, f)
    params = load_caffe2_pkl(path)
    want = from_caffe2_dict(sd)
    got, ref = _flat(params), _flat(want)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])


@pytest.mark.slow
def test_validate_features_end_to_end(tmp_path, capsys, monkeypatch):
    """SURVEY §7.2 step 7 harness, self-consistent: extract with
    converted-weight npz, compare against an h5 produced by the same
    weights → near-perfect IoU/cosine. Exercises npz load, the full
    extraction pipeline, and the matching/scoring code as one system.

    The resize target is patched 800→64 (and pad buckets shrunk to
    match): a full ResNet-101 over 800×1040 on the CPU test platform is
    ~5 min per extraction and the harness runs four — the code paths are
    identical at 64px, the wall-clock is ~100× lower."""
    from PIL import Image

    orig_resize = frcnn.resize_shortest_edge
    monkeypatch.setattr(
        frcnn, "resize_shortest_edge",
        lambda img, short=64, max_size=128: orig_resize(img, short, max_size))
    monkeypatch.setattr(frcnn, "PAD_BUCKETS", (64, 96, 128))

    from vqacl_tpu.cli import validate_features
    from vqacl_tpu.data.features import write_h5

    params = from_caffe2_dict(synthetic_caffe2_sd())
    npz = str(tmp_path / "w.npz")
    save_npz_params(npz, params)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    recs = []
    for i in range(2):
        rgb = rng.integers(0, 255, (200, 260, 3), np.uint8)
        Image.fromarray(rgb).save(img_dir / f"img_{i}.png")
        recs.append((f"img_{i}",
                     frcnn.extract_image(params, rgb[:, :, ::-1])))
    h5 = str(tmp_path / "ref_obj36.h5")
    write_h5(h5, recs)

    validate_features.main(["--images", str(img_dir), "--h5", h5,
                            "--weights", npz])
    out = capsys.readouterr().out
    assert "OVERALL over 2 images" in out
    import re
    m = re.search(r"matched ([\d.]+)/36, iou ([\d.]+), cosine ([\d.]+)", out)
    assert m, out
    matched, iou, cos = float(m.group(1)), float(m.group(2)), float(m.group(3))
    assert matched >= 30
    assert iou > 0.99
    assert cos > 0.999
