"""Detector weight conversion: caffe2 VG checkpoint → vqacl_tpu pytree.

The reference downloads detectron2's
``faster_rcnn_R_101_C4_attr_caffemaxpool`` caffe2-format weights
(/root/reference/feature_extraction/detectron2_proposal_maxnms.py:152-156)
— a pickle of caffe2-named arrays (``res4_22_branch2c_w``,
``conv1_bn_s`` …, NCHW conv kernels, frozen-BN scale/bias pairs). This
module maps that naming onto the vqacl_tpu ResNet/RPN/head pytree:

- conv ``*_w`` [O,I,kh,kw] → HWIO;
- frozen BN ``*_bn_s``/``*_bn_b`` → the (scale, bias) affine of
  ``vision.resnet.conv_bn`` (already-folded caffe2 detection convention;
  for checkpoints with raw BN stats, ``fold_bn`` folds γ,β,μ,σ²);
- branch2a/2b/2c → conv1/2/3, branch1 → shortcut;
- RPN ``conv_rpn_*``, ``rpn_cls_logits_*``, ``rpn_bbox_pred_*``;
- box head ``cls_score_*``, ``bbox_pred_*``; attr head ``*attr*``.

Also provides npz round-trip so converted weights ship without pickle.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]

_STAGE_BLOCKS = {"res2": 3, "res3": 4, "res4": 23, "res5": 3}


def _hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(
        np.asarray(w, np.float32), (2, 3, 1, 0)))


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    bias = np.asarray(beta) - np.asarray(mean) * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _conv_bn(sd: Mapping[str, np.ndarray], name: str) -> Params:
    out = {"w": _hwio(sd[f"{name}_w"])}
    if f"{name}_bn_s" in sd:
        out["scale"] = np.asarray(sd[f"{name}_bn_s"], np.float32)
        out["bias"] = np.asarray(sd[f"{name}_bn_b"], np.float32)
    elif f"{name}_bn_gamma" in sd:
        out["scale"], out["bias"] = fold_bn(
            sd[f"{name}_bn_gamma"], sd[f"{name}_bn_beta"],
            sd[f"{name}_bn_running_mean"], sd[f"{name}_bn_running_var"])
    else:
        cout = out["w"].shape[-1]
        out["scale"] = np.ones((cout,), np.float32)
        out["bias"] = np.asarray(sd.get(f"{name}_b",
                                        np.zeros((cout,))), np.float32)
    return out


def from_caffe2_dict(sd: Mapping[str, np.ndarray]) -> Params:
    """caffe2 name→array dict → vqacl_tpu FRCNN pytree (backbone + rpn
    + heads; missing heads are left absent for the caller to init)."""
    backbone: Params = {"stem": _conv_bn(sd, "conv1")}
    for stage, n_blocks in _STAGE_BLOCKS.items():
        sp: Params = {}
        for i in range(n_blocks):
            blk: Params = {
                "conv1": _conv_bn(sd, f"{stage}_{i}_branch2a"),
                "conv2": _conv_bn(sd, f"{stage}_{i}_branch2b"),
                "conv3": _conv_bn(sd, f"{stage}_{i}_branch2c"),
            }
            if f"{stage}_{i}_branch1_w" in sd:
                blk["shortcut"] = _conv_bn(sd, f"{stage}_{i}_branch1")
            sp[f"block_{i}"] = blk
        backbone[stage] = sp

    params: Params = {"backbone": backbone}

    if "conv_rpn_w" in sd:
        params["rpn"] = {
            "conv_w": _hwio(sd["conv_rpn_w"]),
            "conv_b": np.asarray(sd["conv_rpn_b"], np.float32),
            "obj_w": _hwio(sd["rpn_cls_logits_w"]),
            "obj_b": np.asarray(sd["rpn_cls_logits_b"], np.float32),
            "delta_w": _hwio(sd["rpn_bbox_pred_w"]),
            "delta_b": np.asarray(sd["rpn_bbox_pred_b"], np.float32),
        }

    heads: Params = {}
    if "cls_score_w" in sd:
        heads["cls_w"] = np.asarray(sd["cls_score_w"], np.float32).T
        heads["cls_b"] = np.asarray(sd["cls_score_b"], np.float32)
    if "bbox_pred_w" in sd:
        heads["bbox_w"] = np.asarray(sd["bbox_pred_w"], np.float32).T
        heads["bbox_b"] = np.asarray(sd["bbox_pred_b"], np.float32)
    for key in sd:
        if "cls_embedding" in key and key.endswith("_w"):
            heads["attr_emb"] = np.asarray(sd[key], np.float32)
        if "attr_fc" in key and key.endswith("_w"):
            heads["attr_fc_w"] = np.asarray(sd[key], np.float32).T
        if "attr_fc" in key and key.endswith("_b"):
            heads["attr_fc_b"] = np.asarray(sd[key], np.float32)
        if key in ("attr_score_w", "attr_logits_w"):
            heads["attr_w"] = np.asarray(sd[key], np.float32).T
        if key in ("attr_score_b", "attr_logits_b"):
            heads["attr_b"] = np.asarray(sd[key], np.float32)
    if heads:
        params["heads"] = heads
    return params


def load_caffe2_pkl(path: str) -> Params:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data) if isinstance(data, dict) else data
    blobs = {k: v for k, v in blobs.items()
             if isinstance(v, np.ndarray)}
    return from_caffe2_dict(blobs)


# ---- npz roundtrip (pickle-free distribution of converted weights) ----

def save_npz_params(path: str, params: Params) -> None:
    from vqacl_tpu.train.checkpoint import _flatten
    np.savez(path, **_flatten(params))


def load_npz_params(path: str) -> Params:
    from vqacl_tpu.train.checkpoint import _unflatten
    z = np.load(path, allow_pickle=False)
    return _unflatten({k: z[k] for k in z.files})
