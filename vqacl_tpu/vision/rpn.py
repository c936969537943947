"""Region Proposal Network + proposal selection, static shapes.

Rebuild of the RPN the reference drives through Detectron2
(/root/reference/feature_extraction/detectron2_proposal_maxnms.py:91,
RPN_POST_NMS 300) and its torch port (modeling_frcnn.py:1351-1588:
``AnchorGenerator``, ``RPNHead``, ``find_top_rpn_proposals``,
``Box2BoxTransform``):

- 15 anchors/cell (sizes 32..512 × aspects 0.5/1/2) on the stride-16 map;
- 3×3 conv → objectness [A] + deltas [4A];
- decode deltas (dw/dh clamped at log(1000/16)), clip to image, drop
  tiny boxes, top-K pre-NMS, IoU-0.7 NMS, top-300 post-NMS.

TPU deltas: "variable number of proposals" becomes a fixed [300] set
with a validity mask — masked boxes get score -inf and collapse to
duplicates of the best box, which downstream class-agnostic NMS then
drops (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vqacl_tpu.ops.nms import box_iou
from vqacl_tpu.vision.resnet import _conv_init

Params = Dict[str, Any]

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_ASPECTS = (0.5, 1.0, 2.0)
STRIDE = 16
BBOX_XFORM_CLIP = jnp.log(1000.0 / 16)


def num_anchors() -> int:
    return len(ANCHOR_SIZES) * len(ANCHOR_ASPECTS)


def init_rpn(rng, cin: int = 1024) -> Params:
    k = jax.random.split(rng, 3)
    A = num_anchors()
    return {
        "conv_w": _conv_init(k[0], 3, 3, cin, cin),
        "conv_b": jnp.zeros((cin,), jnp.float32),
        "obj_w": 0.01 * jax.random.normal(k[1], (1, 1, cin, A)),
        "obj_b": jnp.zeros((A,), jnp.float32),
        "delta_w": 0.01 * jax.random.normal(k[2], (1, 1, cin, 4 * A)),
        "delta_b": jnp.zeros((4 * A,), jnp.float32),
    }


def anchor_grid(feat_h: int, feat_w: int) -> jnp.ndarray:
    """[H*W*A, 4] anchors in input-pixel coords (x1,y1,x2,y2), detectron2
    convention: centered on (x+0.5)*stride? — D2 uses grid offsets of
    stride/2? The torch port (modeling_frcnn.py:1351-1440) places anchor
    centers at (x*stride, y*stride) + base anchor centered at 0 →
    replicate that."""
    base = []
    for size in ANCHOR_SIZES:
        area = float(size * size)
        for aspect in ANCHOR_ASPECTS:
            w = (area / aspect) ** 0.5
            h = aspect * w
            base.append([-w / 2, -h / 2, w / 2, h / 2])
    base_a = jnp.asarray(base, jnp.float32)                 # [A, 4]
    ys = jnp.arange(feat_h, dtype=jnp.float32) * STRIDE
    xs = jnp.arange(feat_w, dtype=jnp.float32) * STRIDE
    shift_x, shift_y = jnp.meshgrid(xs, ys)                 # [H, W]
    shifts = jnp.stack([shift_x, shift_y, shift_x, shift_y], -1)  # [H,W,4]
    anchors = shifts[:, :, None, :] + base_a[None, None]    # [H,W,A,4]
    return anchors.reshape(-1, 4)


def decode_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas (modeling_frcnn.py:421-520)."""
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.minimum(deltas[:, 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[:, 3] / wh, BBOX_XFORM_CLIP)
    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=1)


def rpn_head(p: Params, feat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feat [B,H,W,C] → (logits [B,H*W*A], deltas [B,H*W*A,4])."""
    x = jax.lax.conv_general_dilated(
        feat, p["conv_w"].astype(feat.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(feat.dtype)
    x = jax.nn.relu(x + p["conv_b"].astype(feat.dtype))
    obj = jax.lax.conv_general_dilated(
        x, p["obj_w"].astype(feat.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["obj_b"]
    dl = jax.lax.conv_general_dilated(
        x, p["delta_w"].astype(feat.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["delta_b"]
    B, H, W, A = obj.shape
    # delta channels grouped per-anchor (a0:[x,y,w,h], a1:[...], …)
    return (obj.reshape(B, H * W * A),
            dl.reshape(B, H * W * A, 4))


@functools.partial(jax.jit,
                   static_argnames=("pre_nms_topk", "post_nms_topk",
                                    "min_size"))
def select_proposals(logits: jnp.ndarray, boxes: jnp.ndarray,
                     image_hw: jnp.ndarray,
                     pre_nms_topk: int = 6000,
                     post_nms_topk: int = 300,
                     nms_thresh: float = 0.7,
                     min_size: int = 0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per image: decoded boxes [N,4] + logits [N] →
    (proposals [post_nms_topk,4], valid mask). Masked NMS, static shape.
    """
    h, w = image_hw[0], image_hw[1]
    boxes = jnp.stack([
        jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
        jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], axis=1)
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    keepable = (bw > min_size) & (bh > min_size)
    scores = jnp.where(keepable, logits, -jnp.inf)

    k = min(pre_nms_topk, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]

    # greedy NMS over the top-k (score-sorted already)
    iou = box_iou(top_boxes, top_boxes)
    over = iou > nms_thresh

    def body(kept, i):
        suppressed = jnp.any(kept & over[:, i])
        keep_i = ~suppressed & jnp.isfinite(top_scores[i])
        return kept.at[i].set(keep_i), keep_i

    kept, _ = jax.lax.scan(body, jnp.zeros((k,), bool), jnp.arange(k))
    rank = jnp.argsort(~kept, stable=True)[:post_nms_topk]
    return top_boxes[rank], kept[rank]
