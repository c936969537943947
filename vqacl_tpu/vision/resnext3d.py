"""Kinetics 3D-ResNeXt-101 (motion backbone) in pure JAX, NDHWC.

NExT-QA's ``app_mot_{mode}.h5`` motion half comes from a
Kinetics-pretrained 3D ResNeXt-101 (Hara et al., CVPR 2018 — the
``resnext-101-kinetics.pth`` checkpoint of 3D-ResNets-PyTorch, applied
by NExT-QA/HCRN's preprocessing at 16 clips x 16 frames x 112x112 per
video). The reference only *consumes* those features
(/root/reference/VL-T5/nextqa/nextqa_data.py:127-149); this module lets
the framework *produce* them: the exact architecture, evaluated on TPU
(3D convs on the MXU via ``lax.conv_general_dilated``), plus a
converter from the published torch checkpoint's state dict.

Architecture (transcribed from the 3D-ResNets-PyTorch ResNeXt semantics,
not its code):

- stem: 7x7x7 conv, stride (1,2,2), pad 3, 64ch -> BN -> ReLU ->
  3x3x3 max-pool stride 2 pad 1;
- 4 stages of ResNeXt bottlenecks (expansion 2, cardinality 32,
  ``mid = cardinality * planes//32``): layers (3, 4, 23, 3), planes
  (128, 256, 512, 1024), stride 2 on stages 2-4 (on the grouped 3x3x3
  conv, torchvision-style); type-B shortcut (1x1x1 conv + BN) whenever
  shape changes;
- global average pool over (D, H, W) -> 2048-d clip feature (the fc
  classifier head is dropped — feature extraction only).

BatchNorm is inference-mode here and folded to per-channel
(scale, bias) at conversion, like the FRCNN backbone
(vision/convert_weights.py). Padding is explicit (torch's symmetric
pad, NOT "SAME") so activations are bit-comparable to torch.

Input: ``[B, 16, 112, 112, 3]`` RGB float32 in [0, 255] minus the
Kinetics activity mean — see ``preprocess_clip``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

CARDINALITY = 32
EXPANSION = 2
# (n_blocks, planes, stride)
R3D101_STAGES = [(3, 128, 1), (4, 256, 2), (23, 512, 2), (3, 1024, 2)]
FEAT_DIM = 2048
CLIP_LEN = 16
SAMPLE_SIZE = 112
# ActivityNet mean of 3D-ResNets-PyTorch (its published Kinetics
# checkpoints were trained with this mean, RGB order, [0,255] scale)
KINETICS_MEAN_RGB = (114.7748, 107.7354, 99.4750)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def conv_bn3d(p: Params, x: jnp.ndarray, stride=(1, 1, 1), pad=0,
              groups: int = 1, relu: bool = True) -> jnp.ndarray:
    """3D conv (DHWIO kernel) + folded-BN affine + optional ReLU."""
    if isinstance(pad, int):
        pad = [(pad, pad)] * 3
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def bottleneck3d(p: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """ResNeXt bottleneck: 1x1x1 -> grouped 3x3x3 (stride here) -> 1x1x1;
    identity or type-B projection shortcut. Cardinality is recovered
    from the grouped kernel's stored [3,3,3, mid/g, mid] shape."""
    s3 = (stride, stride, stride)
    sc = conv_bn3d(p["shortcut"], x, s3, 0, relu=False) \
        if "shortcut" in p else x
    kw = p["conv2"]["w"]
    y = conv_bn3d(p["conv1"], x)
    y = conv_bn3d(p["conv2"], y, s3, 1, groups=kw.shape[4] // kw.shape[3])
    y = conv_bn3d(p["conv3"], y, relu=False)
    return jax.nn.relu(y + sc)


def maxpool3d(x: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 / stride 2 / pad 1 max pool (torch floor mode)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))


def resnext3d_features(p: Params, clips: jnp.ndarray, stages=None
                       ) -> jnp.ndarray:
    """[B, T, S, S, 3] preprocessed RGB clips -> [B, 2048] pooled
    stage-4 features (global D,H,W mean == the canonical-geometry
    AvgPool3d of the classifier checkpoint)."""
    x = conv_bn3d(p["stem"], clips, (1, 2, 2), 3)
    x = maxpool3d(x)
    for si, (n, planes, stride) in enumerate(stages or R3D101_STAGES):
        st = p[f"stage_{si}"]
        for b in range(n):
            x = bottleneck3d(st[f"block_{b}"], x, stride if b == 0 else 1)
    return x.mean(axis=(1, 2, 3))


def preprocess_clip(frames_rgb: np.ndarray) -> np.ndarray:
    """uint8/float RGB [T, S, S, 3] in [0,255] -> mean-subtracted f32
    (the 3D-ResNets-PyTorch eval normalization: mean only, no std)."""
    return np.asarray(frames_rgb, np.float32) - np.asarray(
        KINETICS_MEAN_RGB, np.float32)


# ---------------------------------------------------------------------------
# init (random weights — converted checkpoints overwrite these)
# ---------------------------------------------------------------------------

def _init_conv_bn3d(rng, kd, kh, kw, cin, cout, groups: int = 1) -> Params:
    fan = kd * kh * kw * (cin // groups)
    w = (2.0 / fan) ** 0.5 * jax.random.normal(
        rng, (kd, kh, kw, cin // groups, cout), jnp.float32)
    return {"w": w, "scale": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32)}


def init_resnext3d(rng, stages=None, cardinality: int = CARDINALITY
                   ) -> Params:
    stages = stages or R3D101_STAGES
    rngs = iter(jax.random.split(rng, 1 + sum(4 * n for n, _, _ in stages)))
    p: Params = {"stem": _init_conv_bn3d(next(rngs), 7, 7, 7, 3, 64)}
    cin = 64
    for si, (n, planes, _) in enumerate(stages):
        mid = cardinality * (planes // 32)
        cout = planes * EXPANSION
        st: Params = {}
        for b in range(n):
            blk: Params = {
                "conv1": _init_conv_bn3d(next(rngs), 1, 1, 1,
                                         cin if b == 0 else cout, mid),
                "conv2": _init_conv_bn3d(next(rngs), 3, 3, 3, mid, mid,
                                         groups=cardinality),
                "conv3": _init_conv_bn3d(next(rngs), 1, 1, 1, mid, cout),
            }
            if b == 0 and cin != cout:
                blk["shortcut"] = _init_conv_bn3d(next(rngs), 1, 1, 1,
                                                  cin, cout)
            st[f"block_{b}"] = blk
        p[f"stage_{si}"] = st
        cin = cout
    return p


# ---------------------------------------------------------------------------
# torch-checkpoint converter
# ---------------------------------------------------------------------------

def _dhwio(w: np.ndarray) -> np.ndarray:
    """torch Conv3d weight [O, I/g, D, H, W] -> DHWIO [D, H, W, I/g, O]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def _fold(sd: Mapping[str, np.ndarray], conv_key: str, bn_key: str,
          used: set) -> Params:
    from vqacl_tpu.vision.convert_weights import fold_bn
    scale, bias = fold_bn(sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"],
                          sd[f"{bn_key}.running_mean"],
                          sd[f"{bn_key}.running_var"])
    used.update({f"{conv_key}.weight", f"{bn_key}.weight", f"{bn_key}.bias",
                 f"{bn_key}.running_mean", f"{bn_key}.running_var"})
    return {"w": jnp.asarray(_dhwio(sd[f"{conv_key}.weight"])),
            "scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}


def from_torch_state_dict(sd: Mapping[str, np.ndarray], stages=None
                          ) -> Params:
    """3D-ResNets-PyTorch ``resnext-101-kinetics.pth`` state dict (the
    ``state_dict`` entry; ``module.`` DataParallel prefixes accepted) ->
    this module's pytree. The classifier ``fc.*`` is dropped; every
    other entry must be consumed (layout drift fails loudly)."""
    sd = {(k[7:] if k.startswith("module.") else k): np.asarray(v)
          for k, v in sd.items()}
    # fc.* (classifier, dropped) and BN bookkeeping counters are ignored
    used: set = set(k for k in sd if k.startswith("fc.")
                    or k.endswith(".num_batches_tracked"))
    p: Params = {"stem": _fold(sd, "conv1", "bn1", used)}
    for si, (n, _, _) in enumerate(stages or R3D101_STAGES):
        st: Params = {}
        for b in range(n):
            pre = f"layer{si + 1}.{b}"
            blk: Params = {
                f"conv{i}": _fold(sd, f"{pre}.conv{i}", f"{pre}.bn{i}", used)
                for i in (1, 2, 3)}
            if f"{pre}.downsample.0.weight" in sd:
                blk["shortcut"] = _fold(sd, f"{pre}.downsample.0",
                                        f"{pre}.downsample.1", used)
            st[f"block_{b}"] = blk
        p[f"stage_{si}"] = st
    leftover = set(sd) - used
    if leftover:
        raise ValueError(f"unconsumed checkpoint entries: {sorted(leftover)}")
    return p


def load_torch_checkpoint(path: str, stages=None) -> Params:
    """Load ``resnext-101-kinetics.pth`` (a torch.save dict with a
    ``state_dict`` entry, or a bare state dict) without torch on the
    import path unless needed."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return from_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, stages=stages)
