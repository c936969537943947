"""RoIAlign / RoIPool as pure XLA gather + interpolation.

TPU-native replacement for the torchvision C++/CUDA ops the reference
leans on (``RoIPool`` at /root/reference/VL-T5/inference/modeling_frcnn.py:1088,
Detectron2 ``_shared_roi_transform`` RoIAlign at
feature_extraction/detectron2_proposal_maxnms.py:99). Static shapes:
fixed number of rois per image, fixed output resolution → one fused
gather/weighted-sum program the MXU/VPU chews through.

Semantics match torchvision:
- ``roi_align``: continuous coordinates, ``aligned`` flag for the
  half-pixel shift, ``sampling_ratio`` bilinear samples per output cell
  averaged (sampling_ratio=-1 → adaptive ceil(roi_size/out_size), which
  is data-dependent; we require an explicit ratio for static shapes);
- ``roi_pool``: integer-quantized bins, max over each bin.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray
                     ) -> jnp.ndarray:
    """feat [C,H,W]; y/x arbitrary same-shaped sample grids → [C, *y.shape].
    Out-of-bounds samples → 0 (torchvision semantics)."""
    C, H, W = feat.shape
    oob = (y < -1.0) | (y > H) | (x < -1.0) | (x > W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    flat = feat.reshape(C, H * W)

    def g(yy, xx):
        return flat[:, (yy * W + xx).reshape(-1)].reshape((C,) + y.shape)

    val = (g(y0, x0) * (hy * hx) + g(y0, x1) * (hy * lx)
           + g(y1, x0) * (ly * hx) + g(y1, x1) * (ly * lx))
    return jnp.where(oob[None], 0.0, val)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                             "aligned"))
def roi_align(feat: jnp.ndarray, rois: jnp.ndarray,
              spatial_scale: float = 1.0,
              output_size: Tuple[int, int] = (14, 14),
              sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """feat [C,H,W]; rois [R,4] (x1,y1,x2,y2) in input coords →
    [R, C, out_h, out_w]."""
    out_h, out_w = output_size
    sr = sampling_ratio
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out_w
    bin_h = roi_h / out_h

    # sample grid per roi: [out_h*sr, out_w*sr]
    iy = (jnp.arange(out_h * sr) // sr)
    fy = (jnp.arange(out_h * sr) % sr + 0.5) / sr
    ix = (jnp.arange(out_w * sr) // sr)
    fx = (jnp.arange(out_w * sr) % sr + 0.5) / sr

    def per_roi(x1_, y1_, bw, bh):
        ys = y1_ + (iy + fy) * bh           # [out_h*sr]
        xs = x1_ + (ix + fx) * bw           # [out_w*sr]
        grid_y = jnp.broadcast_to(ys[:, None], (out_h * sr, out_w * sr))
        grid_x = jnp.broadcast_to(xs[None, :], (out_h * sr, out_w * sr))
        v = _bilinear_gather(feat, grid_y, grid_x)   # [C, oh*sr, ow*sr]
        C = v.shape[0]
        v = v.reshape(C, out_h, sr, out_w, sr)
        return v.mean(axis=(2, 4))

    return jax.vmap(per_roi)(x1, y1, bin_w, bin_h)


@functools.partial(jax.jit, static_argnames=("output_size",))
def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray,
             spatial_scale: float = 1.0,
             output_size: Tuple[int, int] = (7, 7)) -> jnp.ndarray:
    """torchvision RoIPool: quantized bins, max-pool each bin.
    feat [C,H,W]; rois [R,4] → [R,C,out_h,out_w].

    Max over a data-dependent bin is computed as a masked max over the
    full H×W map — static shape, and at FRCNN's 14×14-ish maps the
    redundancy is cheap on the VPU.
    """
    C, H, W = feat.shape
    out_h, out_w = output_size
    x1 = jnp.round(rois[:, 0] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(x2 - x1, 1)
    roi_h = jnp.maximum(y2 - y1, 1)

    ys = jnp.arange(H)
    xs = jnp.arange(W)

    def per_roi(x1_, y1_, rw, rh):
        def per_bin(ph, pw):
            # exact integer floor/ceil — float division would be
            # rewritten by XLA as multiply-by-reciprocal and misround
            # exact boundaries (e.g. 77/7 → 11.0000005 → ceil 12)
            h0 = y1_ + (ph * rh) // out_h
            h1 = y1_ + ((ph + 1) * rh + out_h - 1) // out_h
            w0 = x1_ + (pw * rw) // out_w
            w1 = x1_ + ((pw + 1) * rw + out_w - 1) // out_w
            h0 = jnp.clip(h0, 0, H)
            h1 = jnp.clip(h1, 0, H)
            w0 = jnp.clip(w0, 0, W)
            w1 = jnp.clip(w1, 0, W)
            m = ((ys[:, None] >= h0) & (ys[:, None] < h1)
                 & (xs[None, :] >= w0) & (xs[None, :] < w1))
            empty = ~m.any()
            v = jnp.where(m[None], feat, -jnp.inf).max(axis=(1, 2))
            return jnp.where(empty, 0.0, v)

        ph = jnp.arange(out_h)
        pw = jnp.arange(out_w)
        grid = jax.vmap(lambda a: jax.vmap(lambda b: per_bin(a, b))(pw))(ph)
        return jnp.transpose(grid, (2, 0, 1))   # [C, out_h, out_w]

    return jax.vmap(per_roi)(x1, y1, roi_w, roi_h)
