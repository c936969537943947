"""NMS / RoIAlign / RoIPool parity vs direct numpy oracles.

torchvision isn't in this image, so the references here are
line-by-line numpy transcriptions of the published algorithms
(greedy NMS as in torchvision docs; RoIAlign per the Mask R-CNN paper /
torchvision semantics; RoIPool per Fast R-CNN) — an independent code
path from the vectorized XLA implementations under test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.ops.nms import box_iou, max_nms_fixed, nms_mask
from vqacl_tpu.ops.roi_align import roi_align, roi_pool


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def iou_np(a, b):
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def nms_np(boxes, scores, thresh):
    """Greedy NMS, score-descending, returns kept indices in that order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = iou_np(boxes[i:i + 1], boxes)[0]
        suppressed |= ious > thresh
        suppressed[i] = False
    return np.asarray(keep)


def roi_align_np(feat, rois, spatial_scale, out, sr, aligned):
    C, H, W = feat.shape
    oh, ow = out
    off = 0.5 if aligned else 0.0
    res = np.zeros((len(rois), C, oh, ow), np.float32)

    def bilinear(c, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return 0.0
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (feat[c, y0, x0] * (1 - ly) * (1 - lx)
                + feat[c, y0, x1] * (1 - ly) * lx
                + feat[c, y1, x0] * ly * (1 - lx)
                + feat[c, y1, x1] * ly * lx)

    for r, roi in enumerate(rois):
        x1 = roi[0] * spatial_scale - off
        y1 = roi[1] * spatial_scale - off
        x2 = roi[2] * spatial_scale - off
        y2 = roi[3] * spatial_scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / ow, rh / oh
        for c in range(C):
            for ph in range(oh):
                for pw in range(ow):
                    acc = 0.0
                    for iy in range(sr):
                        for ix in range(sr):
                            y = y1 + ph * bh + (iy + 0.5) * bh / sr
                            x = x1 + pw * bw + (ix + 0.5) * bw / sr
                            acc += bilinear(c, y, x)
                    res[r, c, ph, pw] = acc / (sr * sr)
    return res


def roi_pool_np(feat, rois, spatial_scale, out):
    C, H, W = feat.shape
    oh, ow = out
    res = np.zeros((len(rois), C, oh, ow), np.float32)
    for r, roi in enumerate(rois):
        x1 = int(round(roi[0] * spatial_scale))
        y1 = int(round(roi[1] * spatial_scale))
        x2 = int(round(roi[2] * spatial_scale))
        y2 = int(round(roi[3] * spatial_scale))
        rw, rh = max(x2 - x1, 1), max(y2 - y1, 1)
        for ph in range(oh):
            for pw in range(ow):
                h0 = min(max(y1 + int(np.floor(ph * rh / oh)), 0), H)
                h1 = min(max(y1 + int(np.ceil((ph + 1) * rh / oh)), 0), H)
                w0 = min(max(x1 + int(np.floor(pw * rw / ow)), 0), W)
                w1 = min(max(x1 + int(np.ceil((pw + 1) * rw / ow)), 0), W)
                if h1 > h0 and w1 > w0:
                    res[r, :, ph, pw] = feat[:, h0:h1, w0:w1].max(axis=(1, 2))
    return res


def random_boxes(rng, n, size=100.0):
    x1y1 = rng.uniform(0, size * 0.7, size=(n, 2))
    wh = rng.uniform(1, size * 0.3, size=(n, 2))
    return np.concatenate([x1y1, x1y1 + wh], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_box_iou_matches_oracle(rng):
    a, b = random_boxes(rng, 40), random_boxes(rng, 25)
    ours = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, iou_np(a, b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_oracle(rng, thresh):
    boxes = random_boxes(rng, 120)
    scores = rng.uniform(0, 1, 120).astype(np.float32)
    ref = set(nms_np(boxes, scores, thresh))
    mask = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                               thresh))
    assert set(np.where(mask)[0]) == ref


def test_max_nms_fixed_sweep_semantics(rng):
    """Reference sweep (detectron2_proposal_maxnms.py:126-132): first
    thresh in 0.5..0.9 with ≥36 survivors, then top-36 by score."""
    boxes = random_boxes(rng, 300)
    scores = rng.uniform(0, 1, 300).astype(np.float32)
    ref_keep = None
    for thresh in (0.5, 0.6, 0.7, 0.8, 0.9):
        keep = nms_np(boxes, scores, thresh)
        if len(keep) >= 36:
            ref_keep = keep[:36]
            break
    assert ref_keep is not None
    idx, valid = max_nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                               n_keep=36)
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_array_equal(np.asarray(idx), ref_keep)


def test_max_nms_pads_when_scarce():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (10, 1))
    scores = np.linspace(0.1, 1.0, 10).astype(np.float32)
    idx, valid = max_nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                               n_keep=4)
    assert int(np.asarray(valid).sum()) == 1
    assert int(np.asarray(idx)[0]) == 9


@pytest.mark.parametrize("aligned", [True, False])
def test_roi_align_matches_oracle(rng, aligned):
    feat = rng.normal(size=(3, 16, 20)).astype(np.float32)
    rois = np.array([[1.0, 2.0, 15.0, 12.0],
                     [0.0, 0.0, 19.9, 15.9],
                     [5.5, 3.2, 9.7, 8.8]], np.float32)
    ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                spatial_scale=0.5, output_size=(7, 7),
                                sampling_ratio=2, aligned=aligned))
    ref = roi_align_np(feat, rois, 0.5, (7, 7), 2, aligned)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_roi_pool_matches_oracle(rng):
    feat = rng.normal(size=(4, 12, 14)).astype(np.float32)
    rois = np.array([[0.0, 0.0, 13.0, 11.0],
                     [2.0, 3.0, 10.0, 9.0]], np.float32)
    ours = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                               spatial_scale=1.0, output_size=(7, 7)))
    ref = roi_pool_np(feat, rois, 1.0, (7, 7))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_nms_score_ties_stable_order(rng):
    """Equal scores: suppression follows stable sort order (ascending
    index), matching torchvision's stable sort convention."""
    boxes = random_boxes(rng, 40)
    scores = np.full(40, 0.5, np.float32)   # all tied
    ref = set(nms_np(boxes, scores, 0.5))
    mask = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert set(np.where(mask)[0]) == ref


def test_max_nms_all_invalid_scores():
    """All proposals masked (score -1, e.g. zero valid RPN proposals):
    still returns exactly n_keep indices without error."""
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (20, 1))
    scores = np.full(20, -1.0, np.float32)
    idx, valid = max_nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                               n_keep=6)
    assert idx.shape == (6,)
    assert np.asarray(idx).min() >= 0 and np.asarray(idx).max() < 20
