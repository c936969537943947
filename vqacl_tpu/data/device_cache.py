"""HBM-resident feature cache: the top tier of the feature hierarchy.

BASELINE.json's north star names an "HBM/host-tiered feature cache" as a
first-class component. The tiers here:

  HBM   — this module: the whole region-feature table lives on device
          (bf16), batches carry int32 SLOT indices, and the gather
          happens inside the compiled train/eval step. Host→device
          traffic per step drops from 23.6 MB (vis_feats+boxes at bs 80)
          to 320 bytes of indices — the tunnel/PCIe cost disappears and
          input pipelines can never starve the TPU.
  host  — data/packed_cache.py (native mmap pack, threaded gather)
  disk  — h5 / pack files.

Scaling: with ``shard=True`` the table is row-sharded over the ``dp``
mesh axis, so an 8-chip v5e holds 8× the features (GSPMD turns the
gather into collective lookups over ICI). VQA v2 train2014 at bf16 is
~12 GB — replicated is tight on one chip, trivial sharded on a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _to_bf16_fast(x: np.ndarray) -> np.ndarray:
    """f32 → bf16 with round-to-nearest-even as pure integer numpy
    (bf16 is the top 16 bits of f32; add 0x7FFF + lsb-of-kept-half
    before truncating). ml_dtypes' astype is a software cast orders of
    magnitude slower at GB scale; this runs at memory bandwidth.
    NaNs keep a set mantissa bit through the carry, infs/overflow match
    IEEE truncation semantics for finite feature data."""
    import ml_dtypes

    u = np.ascontiguousarray(x).view(np.uint32)
    r = ((u >> np.uint32(16)) & np.uint32(1)) + np.uint32(0x7FFF)
    return ((u + r) >> np.uint32(16)).astype(np.uint16).view(
        ml_dtypes.bfloat16)


def _quant_rows(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-(image,box)-row int8 quantization: q = round(x/s),
    s = rowmax(|x|)/127. Returns (int8 values, f32 scales [..., boxes]).
    Max dequant error = s/2 ≈ 0.4 % of the row's peak activation."""
    x = np.asarray(x, np.float32)
    scale = np.abs(x).max(axis=-1) / 127.0
    scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
    q = np.clip(np.rint(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale


class DeviceFeatureCache:
    """feats [N, n_boxes, feat_dim] + boxes [N, n_boxes, 4] on device.

    ``lookup(slots)`` is jit-traceable; slot -1 (or any OOB) returns
    zeros via clipping + masking, matching the host collator's padding
    semantics.

    ``feat_dtype=jnp.int8`` stores the table symmetrically quantized
    per (image, box) row — HALF the HBM of bf16 (VQA v2 train2014:
    ~6 GB vs ~12 GB), dequantized inside the compiled step's gather at
    ≤0.4 %-of-row-peak error. Opt-in (``--device_cache_dtype int8``):
    bf16 is bit-exact vs the host pipeline, int8 is not.
    """

    def __init__(self, feats: np.ndarray, boxes: np.ndarray,
                 mesh_ctx=None, shard: bool = False,
                 feat_dtype=jnp.bfloat16,
                 scales: Optional[np.ndarray] = None):
        n = feats.shape[0]
        self.n = n
        quantize = np.dtype(feat_dtype) == np.dtype(np.int8)
        if quantize and np.asarray(feats).dtype == np.int8:
            assert scales is not None, "pre-quantized feats need scales"
        if quantize and np.asarray(feats).dtype != np.int8:
            # chunked so the f32 temporaries stay small on the
            # slow-demand-paging host (see _to_bf16_fast note below)
            src = np.asarray(feats)
            q = np.empty(src.shape, np.int8)
            scales = np.empty(src.shape[:-1], np.float32)
            step = 1024
            for s in range(0, n, step):
                q[s:s + step], scales[s:s + step] = _quant_rows(
                    src[s:s + step])
            feats = q
        if shard:
            assert mesh_ctx is not None, "sharded cache needs a mesh"
            dp = mesh_ctx.dp
            pad = (-n) % dp
            if pad:
                feats = np.concatenate(
                    [feats, np.zeros((pad,) + feats.shape[1:],
                                     feats.dtype)], axis=0)
                boxes = np.concatenate(
                    [boxes, np.zeros((pad,) + boxes.shape[1:],
                                     boxes.dtype)], axis=0)
                if scales is not None:
                    scales = np.concatenate(
                        [scales, np.ones((pad,) + scales.shape[1:],
                                         np.float32)], axis=0)
            sharding = NamedSharding(mesh_ctx.mesh, P("dp"))
        elif mesh_ctx is not None:
            sharding = mesh_ctx.replicated()
        else:
            sharding = None
        # convert on the HOST, then ship the narrow bytes. BOTH
        # jnp.asarray(f32, bfloat16) (~49 s per 604 MB measured) and
        # numpy astype(ml_dtypes.bfloat16) (software-emulated cast,
        # slower still) are pathologically slow for GB-scale tables;
        # _to_bf16_fast does the round-to-nearest-even truncation with
        # integer numpy ops at memory bandwidth.
        f_np = np.asarray(feats)
        if np.dtype(feat_dtype) == np.dtype(jnp.bfloat16) and \
                f_np.dtype == np.float32:
            f_np = _to_bf16_fast(f_np)
        elif not quantize:
            f_np = f_np.astype(np.dtype(feat_dtype), copy=False)
        b_np = np.asarray(boxes).astype(np.float32, copy=False)
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
            else jax.device_put
        self.feats = put(f_np)
        self.boxes = put(b_np)
        self.scales = put(scales) if scales is not None else None

    def lookup(self, slots: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """slots [B] int32 → (feats [B, n_boxes, feat_dim] f32-castable,
        boxes [B, n_boxes, 4]). Call INSIDE jit."""
        valid = (slots >= 0) & (slots < self.n)
        idx = jnp.clip(slots, 0, self.feats.shape[0] - 1)
        f = jnp.take(self.feats, idx, axis=0).astype(jnp.float32)
        if self.scales is not None:        # int8 table: dequantize
            f = f * jnp.take(self.scales, idx, axis=0)[..., None]
        b = jnp.take(self.boxes, idx, axis=0)
        mask = valid[:, None, None]
        return jnp.where(mask, f, 0), jnp.where(mask, b, 0)

    @classmethod
    def from_store(cls, store, img_ids: Sequence[str], mesh_ctx=None,
                   shard: bool = False, feat_dtype=jnp.bfloat16
                   ) -> Tuple["DeviceFeatureCache", dict]:
        """Build from any host feature store; returns (cache,
        {img_id: slot}).

        The table is allocated ONCE in the target dtype and filled
        per-image (f32→bf16 via ``_to_bf16_fast``): a full-scale cache
        is ~2 GB bf16 vs the ~6 GB peak of stack-then-convert — on a
        host that demand-pages cold memory slowly (this VM), halving
        the first-touch footprint halves the build time."""
        ids = list(img_ids)
        n = len(ids)
        f0, b0 = store.get(ids[0])
        dt = np.dtype(feat_dtype)
        to_bf16 = dt == np.dtype(jnp.bfloat16)
        to_int8 = dt == np.dtype(np.int8)
        feats = np.empty((n,) + np.shape(f0), dt)
        boxes = np.empty((n,) + np.shape(b0), np.float32)
        scales = (np.empty((n,) + np.shape(f0)[:-1], np.float32)
                  if to_int8 else None)
        slot_of = {}
        for i, img in enumerate(ids):
            f, b = store.get(img)
            f = np.asarray(f)
            if to_bf16 and f.dtype == np.float32:
                feats[i] = _to_bf16_fast(f)
            elif to_int8:
                feats[i], scales[i] = _quant_rows(f)
            else:
                feats[i] = f
            boxes[i] = b
            slot_of[img] = i
        return cls(feats, boxes, mesh_ctx=mesh_ctx,
                   shard=shard, feat_dtype=feat_dtype,
                   scales=scales), slot_of


def make_cached_train_step(cfg, tx, cache: DeviceFeatureCache,
                           dtype=jnp.bfloat16, **kw):
    """Train step whose batches carry ``slots`` [B] int32 instead of
    vis_feats/boxes — the feature gather runs on device from the HBM
    cache. Other batch fields unchanged (see train/step.py)."""
    from vqacl_tpu.train.step import make_train_step

    inner = make_train_step(cfg, tx, dtype=dtype, **kw)

    # wrap OUTSIDE jit: resolve slots → features inside the jitted inner
    # step by augmenting the batch. jnp.take of a device-resident table
    # under jit keeps everything on-device.
    import functools

    @functools.wraps(inner)
    def step(state, batch, *extra):
        b = dict(batch)
        slots = b.pop("slots")
        feats, boxes = _lookup_jit(cache, slots)
        b["vis_feats"] = feats
        b["boxes"] = boxes
        return inner(state, b, *extra)     # extra: RegState for EWC/MAS

    return step


def make_cached_eval_step(cfg, cache: DeviceFeatureCache,
                          dtype=jnp.bfloat16, **kw):
    """Eval step over slot-indexed batches (see make_cached_train_step)."""
    from vqacl_tpu.train.step import make_eval_step

    inner = make_eval_step(cfg, dtype=dtype, **kw)

    def step(params, proto, batch):
        b = dict(batch)
        slots = b.pop("slots")
        feats, boxes = _lookup_jit(cache, slots)
        b["vis_feats"] = feats
        b["boxes"] = boxes
        return inner(params, proto, b)

    return step


def make_cached_der_step(cfg, tx, cache: DeviceFeatureCache,
                         dtype=jnp.bfloat16, **kw):
    """DER replay step over slot-indexed batches (train/step.py::
    make_der_replay_step; see make_cached_train_step)."""
    from vqacl_tpu.train.step import make_der_replay_step

    inner = make_der_replay_step(cfg, tx, dtype=dtype, **kw)

    def step(state, batch):
        b = dict(batch)
        slots = b.pop("slots")
        feats, boxes = _lookup_jit(cache, slots)
        b["vis_feats"] = feats
        b["boxes"] = boxes
        return inner(state, b)

    return step


def make_cached_logits_step(cfg, cache: DeviceFeatureCache,
                            dtype=jnp.bfloat16, **kw):
    """DER capture pass over slot-indexed batches (train/step.py::
    make_logits_step)."""
    from vqacl_tpu.train.step import make_logits_step

    inner = make_logits_step(cfg, dtype=dtype, **kw)

    def step(params, proto, batch):
        b = dict(batch)
        slots = b.pop("slots")
        feats, boxes = _lookup_jit(cache, slots)
        b["vis_feats"] = feats
        b["boxes"] = boxes
        return inner(params, proto, b)

    return step


def _lookup_jit(cache: DeviceFeatureCache, slots):
    """Jitted gather, compiled once per cache instance (the tables are
    passed as arguments so they are not baked into the program — the
    tunneled compile service rejects huge constants)."""
    fn = getattr(cache, "_lookup_fn", None)
    if fn is None:
        n = cache.n
        quantized = cache.scales is not None

        def impl(feats, boxes, scales, s):
            valid = (s >= 0) & (s < n)
            idx = jnp.clip(s, 0, feats.shape[0] - 1)
            f = jnp.take(feats, idx, axis=0).astype(jnp.float32)
            if quantized:
                f = f * jnp.take(scales, idx, axis=0)[..., None]
            b = jnp.take(boxes, idx, axis=0)
            mask = valid[:, None, None]
            return jnp.where(mask, f, 0), jnp.where(mask, b, 0)

        fn = jax.jit(impl)
        cache._lookup_fn = fn
    return fn(cache.feats, cache.boxes, cache.scales, slots)
