"""ResNet-101-C4 backbone (caffe-style) in pure JAX, NHWC.

TPU-native rebuild of the Detectron2 backbone the reference uses for
region-feature extraction (/root/reference/feature_extraction/
detectron2_proposal_maxnms.py:146-163, config
``faster_rcnn_R_101_C4_attr_caffemaxpool``) and of its torch port
(/root/reference/VL-T5/inference/modeling_frcnn.py:775-1021):

- caffe-style stem: 7×7/2 conv → frozen BN (affine scale/bias) → ReLU →
  3×3/2 max-pool with ceil-mode padding (modeling_frcnn.py:776-800);
- bottleneck stages res2(3)/res3(4)/res4(23) → stride-16 C4 map;
- res5(3) lives in the RoI head (applied per-region after RoIAlign,
  detectron2 ``_shared_roi_transform``), stride 2 in its first block;
- BatchNorm is frozen in caffe detection checkpoints → folded to a
  per-channel (scale, bias) affine pair at conversion time.

Layout: NHWC activations, HWIO conv kernels — XLA's native TPU layout,
convs land on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# (name, n_blocks, out_channels, bottleneck_channels, stride)
R101_STAGES = [
    ("res2", 3, 256, 64, 1),
    ("res3", 4, 512, 128, 2),
    ("res4", 23, 1024, 256, 2),
]
RES5 = ("res5", 3, 2048, 512, 2)


def _conv_init(rng, kh, kw, cin, cout):
    # MSRA/caffe init; converted checkpoints overwrite this anyway
    fan = kh * kw * cin
    std = (2.0 / fan) ** 0.5
    return std * jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32)


def init_conv_bn(rng, kh, kw, cin, cout) -> Params:
    return {
        "w": _conv_init(rng, kh, kw, cin, cout),
        "scale": jnp.ones((cout,), jnp.float32),   # folded frozen-BN γ/√var
        "bias": jnp.zeros((cout,), jnp.float32),   # folded β - μγ/√var
    }


def conv_bn(p: Params, x: jnp.ndarray, stride: int = 1,
            padding="SAME", relu: bool = True) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def init_bottleneck(rng, cin, cout, cmid) -> Params:
    k = jax.random.split(rng, 4)
    p: Params = {
        "conv1": init_conv_bn(k[0], 1, 1, cin, cmid),
        "conv2": init_conv_bn(k[1], 3, 3, cmid, cmid),
        "conv3": init_conv_bn(k[2], 1, 1, cmid, cout),
    }
    if cin != cout:
        p["shortcut"] = init_conv_bn(k[3], 1, 1, cin, cout)
    return p


def bottleneck(p: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Caffe ResNet bottleneck: stride sits on conv1 (1×1), matching the
    original caffe R-101 models detectron2's VG detector converts from
    (``stride_in_1x1=True``)."""
    sc = conv_bn(p["shortcut"], x, stride, relu=False) if "shortcut" in p \
        else (x[:, ::stride, ::stride] if stride > 1 else x)
    y = conv_bn(p["conv1"], x, stride)
    y = conv_bn(p["conv2"], y, 1)
    y = conv_bn(p["conv3"], y, 1, relu=False)
    return jax.nn.relu(y + sc)


def init_stage(rng, n_blocks, cin, cout, cmid) -> Params:
    keys = jax.random.split(rng, n_blocks)
    p: Params = {}
    for i in range(n_blocks):
        p[f"block_{i}"] = init_bottleneck(keys[i], cin if i == 0 else cout,
                                          cout, cmid)
    return p


def stage(p: Params, x: jnp.ndarray, n_blocks: int, stride: int
          ) -> jnp.ndarray:
    for i in range(n_blocks):
        x = bottleneck(p[f"block_{i}"], x, stride if i == 0 else 1)
    return x


def init_resnet101_c4(rng) -> Params:
    keys = jax.random.split(rng, 2 + len(R101_STAGES))
    p: Params = {"stem": init_conv_bn(keys[0], 7, 7, 3, 64)}
    cin = 64
    for i, (name, n, cout, cmid, _) in enumerate(R101_STAGES):
        p[name] = init_stage(keys[i + 1], n, cin, cout, cmid)
        cin = cout
    name, n, cout, cmid, _ = RES5
    p[name] = init_stage(keys[-1], n, 1024, cout, cmid)
    return p


def caffe_maxpool(x: jnp.ndarray) -> jnp.ndarray:
    """3×3/2 max pool, caffe ceil-mode (pad bottom/right so the output is
    ceil((H-3)/2)+1 — modeling_frcnn.py:776 'caffe_maxpool')."""
    H, W = x.shape[1], x.shape[2]
    out_h = -(-(H - 3) // 2) + 1
    out_w = -(-(W - 3) // 2) + 1
    pad_h = max(0, (out_h - 1) * 2 + 3 - H)
    pad_w = max(0, (out_w - 1) * 2 + 3 - W)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))


def backbone_c4(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """images NHWC (BGR, caffe-normalized) → stride-16 C4 map
    [B, H/16, W/16, 1024]."""
    x = conv_bn(p["stem"], images, stride=2)
    x = caffe_maxpool(x)
    for name, n, cout, cmid, s in R101_STAGES:
        x = stage(p[name], x, n, s)
    return x


def res5_head(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Per-RoI res5: [R, 14, 14, 1024] → [R, 7, 7, 2048] (stride 2)."""
    name, n, cout, cmid, s = RES5
    return stage(p[name], x, n, s)
