"""Fixed-shape NMS for TPU: class-agnostic max-score suppression with the
reference's exactly-36-boxes threshold-sweep semantics.

The reference pipeline (/root/reference/feature_extraction/
detectron2_proposal_maxnms.py:43-132) does, per image:
  1. per-box class score = max over 1600 classes (background dropped);
  2. torchvision ``nms(boxes, max_scores, thresh)``;
  3. sweep thresh 0.5→0.9 in 0.1 steps until ≥36 boxes survive, then
     keep the top-36 by score (suppression ordering = score order).

Data-dependent loop + variable box counts don't map to XLA, so here the
whole sweep is ONE static-shape program (SURVEY.md §7.3):

- IoU matrix [N,N] once (N=300 proposals — tiny for the VPU);
- sequential greedy suppression as a ``lax.scan`` over score-sorted
  boxes, VECTORIZED over all 5 thresholds at once (the scan carries a
  [T,N] suppression mask);
- select the first threshold with ≥36 survivors, emit the top-36 kept
  indices (score order), padding with the best suppressed boxes if even
  thresh=0.9 keeps <36 (the reference would IndexError there; we pad —
  deliberate, documented delta).

Greedy NMS matches torchvision exactly for distinct scores; ties follow
sort order (stable, index-ascending — same as torchvision's sort).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. a [N,4], b [M,4] in (x1,y1,x2,y2) → [N,M].
    Areas use (x2-x1)*(y2-y1) (torchvision convention, no +1)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS keep-mask (original box order). Single threshold."""
    keep_sorted = _nms_sweep_masks(boxes, scores,
                                   jnp.asarray([iou_threshold]))[0]
    order = jnp.argsort(-scores, stable=True)
    # scatter back to original order
    mask = jnp.zeros(boxes.shape[0], bool).at[order].set(keep_sorted)
    return mask


def _nms_sweep_masks(boxes: jnp.ndarray, scores: jnp.ndarray,
                     thresholds: jnp.ndarray) -> jnp.ndarray:
    """[T, N] keep-masks in SCORE-SORTED order, all thresholds at once."""
    N = boxes.shape[0]
    T = thresholds.shape[0]
    order = jnp.argsort(-scores, stable=True)
    b = boxes[order]
    iou = box_iou(b, b)                       # [N, N]
    # over[t, i, j] = sorted box j would be suppressed by kept box i
    over = iou[None] > thresholds[:, None, None]

    def body(kept: jnp.ndarray, i: jnp.ndarray):
        # kept: [T, N] mask of already-kept boxes (sorted order)
        # box i survives iff no kept earlier box overlaps > thresh
        suppressed = jnp.einsum("tn,tn->t", kept.astype(jnp.float32),
                                over[:, :, i].astype(jnp.float32)) > 0
        keep_i = ~suppressed
        kept = kept.at[:, i].set(keep_i)
        return kept, keep_i

    kept0 = jnp.zeros((T, N), bool)
    kept, _ = jax.lax.scan(body, kept0, jnp.arange(N))
    return kept


@functools.partial(jax.jit, static_argnames=("n_keep", "thresholds"))
def max_nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray,
                  n_keep: int = 36,
                  thresholds: Tuple[float, ...] = DEFAULT_THRESHOLDS
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The full reference sweep → exactly ``n_keep`` box indices.

    boxes [N,4], scores [N] (already class-maxed). Returns
    (indices [n_keep] into the input arrays, valid [n_keep] bool — False
    only on pad rows when even the loosest threshold keeps < n_keep).
    """
    thr = jnp.asarray(thresholds, jnp.float32)
    kept = _nms_sweep_masks(boxes, scores, thr)          # [T, N] sorted order
    counts = kept.sum(axis=1)                            # [T]
    enough = counts >= n_keep
    # first threshold with ≥ n_keep survivors; fall back to the last
    t_idx = jnp.where(enough.any(),
                      jnp.argmax(enough),
                      thr.shape[0] - 1)
    mask = kept[t_idx]                                   # [N] sorted order
    # rank kept boxes first (stable: score order preserved), then pad
    # with the highest-scoring suppressed boxes
    order = jnp.argsort(-scores, stable=True)
    rank = jnp.argsort(~mask, stable=True)               # kept first
    sel_sorted = rank[:n_keep]
    indices = order[sel_sorted]
    valid = mask[sel_sorted]
    return indices, valid
