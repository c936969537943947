"""End-to-end 36-box region-feature extractor, one compiled program.

TPU rebuild of the reference's offline L0 pipeline
(/root/reference/feature_extraction/detectron2_proposal_maxnms.py:74-143
``doit``): backbone C4 → RPN (300 proposals) → RoIAlign+res5 →
mean-pool 2048-d → class/attr/box heads → class-agnostic max-NMS down
to exactly 36 boxes (threshold sweep 0.5→0.9) → features + boxes, the
exact record schema the h5 cache stores (:212-220).

Everything is static-shape and jit-compiled per padded image size:
images are resized shortest-edge-800 (cap 1333) then padded to a small
set of canonical shapes so XLA compiles a handful of programs, not one
per image.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqacl_tpu.ops.nms import max_nms_fixed
from vqacl_tpu.ops.roi_align import roi_align
from vqacl_tpu.vision import resnet, rpn

Params = Dict[str, Any]

# VG detector heads (detectron2_proposal_maxnms.py: 1600 classes + bg,
# 400 attributes)
N_CLASSES = 1600
N_ATTRS = 400
PIXEL_MEAN_BGR = np.array([102.9801, 115.9465, 122.7754], np.float32)


def init_heads(rng) -> Params:
    k = jax.random.split(rng, 5)
    d = 2048
    return {
        "cls_w": 0.01 * jax.random.normal(k[0], (d, N_CLASSES + 1)),
        "cls_b": jnp.zeros((N_CLASSES + 1,)),
        "bbox_w": 0.001 * jax.random.normal(k[1], (d, 4)),  # cls-agnostic
        "bbox_b": jnp.zeros((4,)),
        "attr_emb": 0.01 * jax.random.normal(k[2], (N_CLASSES + 1, 256)),
        "attr_fc_w": 0.01 * jax.random.normal(k[3], (d + 256, 512)),
        "attr_fc_b": jnp.zeros((512,)),
        "attr_w": 0.01 * jax.random.normal(k[4], (512, N_ATTRS + 1)),
        "attr_b": jnp.zeros((N_ATTRS + 1,)),
    }


def init_frcnn(rng) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "backbone": resnet.init_resnet101_c4(k1),
        "rpn": rpn.init_rpn(k2),
        "heads": init_heads(k3),
    }


class Regions(NamedTuple):
    features: jnp.ndarray   # [36, 2048]
    boxes: jnp.ndarray      # [36, 4] pixel xyxy (input-resolution frame)
    obj_id: jnp.ndarray     # [36]
    obj_conf: jnp.ndarray   # [36]
    attr_id: jnp.ndarray    # [36]
    attr_conf: jnp.ndarray  # [36]
    valid: jnp.ndarray      # [36]


def _extract_regions_impl(params: Params, image: jnp.ndarray,
                          image_hw: jnp.ndarray, n_boxes: int = 36,
                          n_proposals: int = 300) -> Regions:
    """image [H,W,3] BGR float (mean-subtracted outside or raw — caller
    normalizes), image_hw = true (unpadded) size. One image per call;
    use ``extract_regions_batch`` for vmapped batches."""
    x = (image - jnp.asarray(PIXEL_MEAN_BGR))[None]          # [1,H,W,3]
    feat = resnet.backbone_c4(params["backbone"], x)          # [1,h,w,1024]

    logits, deltas = rpn.rpn_head(params["rpn"], feat)
    anchors = rpn.anchor_grid(feat.shape[1], feat.shape[2])
    boxes_all = rpn.decode_deltas(anchors, deltas[0])
    proposals, prop_valid = rpn.select_proposals(
        logits[0], boxes_all, image_hw,
        post_nms_topk=n_proposals)                           # [300,4]

    # RoI features: RoIAlign 14×14 on C4 (stride 16) → res5 → mean pool
    roi = roi_align(jnp.transpose(feat[0], (2, 0, 1)), proposals,
                    spatial_scale=1.0 / rpn.STRIDE, output_size=(14, 14),
                    sampling_ratio=2, aligned=False)          # [300,1024,14,14]
    roi = jnp.transpose(roi, (0, 2, 3, 1))                    # NHWC
    r5 = resnet.res5_head(params["backbone"], roi)            # [300,7,7,2048]
    pooled = r5.mean(axis=(1, 2))                             # [300,2048]

    h = params["heads"]
    cls_logits = pooled @ h["cls_w"] + h["cls_b"]             # [300,1601]
    probs = jax.nn.softmax(cls_logits, axis=-1)
    # class-agnostic max score, background (col 0) dropped
    # (fast_rcnn_inference_single_image, detectron2_proposal_maxnms.py:43-71)
    max_conf = jnp.where(prop_valid, probs[:, 1:].max(axis=1), -1.0)
    cls_id = probs[:, 1:].argmax(axis=1) + 1

    idx, valid = max_nms_fixed(proposals, max_conf, n_keep=n_boxes)

    sel_pooled = pooled[idx]
    sel_boxes = proposals[idx]
    sel_cls = cls_id[idx]
    sel_conf = max_conf[idx]

    # attribute head (VG detector: class embedding ‖ pooled → fc → attr)
    emb = h["attr_emb"][sel_cls]
    a = jax.nn.relu(jnp.concatenate([sel_pooled, emb], axis=1)
                    @ h["attr_fc_w"] + h["attr_fc_b"])
    attr_logits = a @ h["attr_w"] + h["attr_b"]
    attr_probs = jax.nn.softmax(attr_logits, axis=-1)
    attr_conf = attr_probs[:, 1:].max(axis=1)
    attr_id = attr_probs[:, 1:].argmax(axis=1) + 1

    return Regions(features=sel_pooled, boxes=sel_boxes,
                   obj_id=sel_cls, obj_conf=sel_conf,
                   attr_id=attr_id, attr_conf=attr_conf,
                   valid=valid & prop_valid[idx])


extract_regions = jax.jit(_extract_regions_impl,
                          static_argnames=("n_boxes", "n_proposals"))

@functools.partial(jax.jit, static_argnames=("n_boxes", "n_proposals"))
def extract_regions_batch(params: Params, images: jnp.ndarray,
                          image_hw: jnp.ndarray, n_boxes: int = 36,
                          n_proposals: int = 300) -> Regions:
    """Batched extraction for offline throughput: images [B,H,W,3]
    padded to a shared bucket, per-image true sizes image_hw [B,2]."""
    return jax.vmap(
        lambda img, hw: _extract_regions_impl(params, img, hw, n_boxes,
                                              n_proposals)
    )(images, image_hw)


@functools.partial(jax.jit, static_argnames=())
def extract_given_boxes(params: Params, image: jnp.ndarray,
                        boxes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                     jnp.ndarray]:
    """Features at caller-provided boxes (reference
    feature_extraction/detectron2_given_box_maxnms.py: RoI features at
    GT boxes, no RPN/NMS). boxes [R,4] in image pixels →
    (features [R,2048], obj_id [R], obj_conf [R])."""
    x = (image - jnp.asarray(PIXEL_MEAN_BGR))[None]
    feat = resnet.backbone_c4(params["backbone"], x)
    roi = roi_align(jnp.transpose(feat[0], (2, 0, 1)), boxes,
                    spatial_scale=1.0 / rpn.STRIDE, output_size=(14, 14),
                    sampling_ratio=2, aligned=False)
    roi = jnp.transpose(roi, (0, 2, 3, 1))
    r5 = resnet.res5_head(params["backbone"], roi)
    pooled = r5.mean(axis=(1, 2))
    h = params["heads"]
    probs = jax.nn.softmax(pooled @ h["cls_w"] + h["cls_b"], axis=-1)
    return pooled, probs[:, 1:].argmax(axis=1) + 1, probs[:, 1:].max(axis=1)


# ---------------------------------------------------------------------------
# host-side driver (resize / pad / h5 write)
# ---------------------------------------------------------------------------

def resize_shortest_edge(img: np.ndarray, short: int = 800,
                         max_size: int = 1333) -> Tuple[np.ndarray, float]:
    """PIL-free bilinear resize (processing_image.py:29-73 semantics)."""
    h, w = img.shape[:2]
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    ys = (np.arange(nh) + 0.5) * (h / nh) - 0.5
    xs = (np.arange(nw) + 0.5) * (w / nw) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    out = (img[y0][:, x0] * (1 - fy) * (1 - fx)
           + img[y0][:, x1] * (1 - fy) * fx
           + img[y1][:, x0] * fy * (1 - fx)
           + img[y1][:, x1] * fy * fx)
    return out.astype(np.float32), scale


PAD_BUCKETS = (512, 640, 800, 1024, 1184, 1344)


def pad_to_bucket(img: np.ndarray) -> np.ndarray:
    """Pad H/W up to the nearest bucket so jit compiles O(buckets²)
    programs instead of one per image size."""
    h, w = img.shape[:2]
    ph = next((b for b in PAD_BUCKETS if b >= h), h)
    pw = next((b for b in PAD_BUCKETS if b >= w), w)
    out = np.zeros((ph, pw, 3), np.float32)
    out[:h, :w] = img
    return out


def extract_image(params: Params, img_bgr: np.ndarray,
                  n_boxes: int = 36) -> Dict[str, np.ndarray]:
    """Full host pipeline for one raw BGR uint8 image → reference h5
    record (boxes rescaled to ORIGINAL pixel coords,
    detectron2_proposal_maxnms.py:134 detector_postprocess)."""
    raw_h, raw_w = img_bgr.shape[:2]
    resized, scale = resize_shortest_edge(img_bgr.astype(np.float32))
    hw = np.asarray(resized.shape[:2], np.float32)
    padded = pad_to_bucket(resized)
    regions = extract_regions(params, jnp.asarray(padded),
                              jnp.asarray(hw), n_boxes=n_boxes)
    boxes = np.asarray(regions.boxes) / scale
    boxes[:, (0, 2)] = boxes[:, (0, 2)].clip(0, raw_w)
    boxes[:, (1, 3)] = boxes[:, (1, 3)].clip(0, raw_h)
    return {
        "features": np.asarray(regions.features, np.float32),
        "boxes": boxes.astype(np.float32),
        "img_h": raw_h, "img_w": raw_w,
        "obj_id": np.asarray(regions.obj_id),
        "obj_conf": np.asarray(regions.obj_conf),
        "attr_id": np.asarray(regions.attr_id),
        "attr_conf": np.asarray(regions.attr_conf),
    }
