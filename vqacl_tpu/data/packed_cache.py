"""Packed feature cache: ctypes bindings + pack builder.

The TPU-native counterpart of the reference's HDF5 feature files
(SURVEY §2.3 "HDF5 (C) via h5py" row): a flat memory-mapped pack read
by ``vqacl_tpu/native/feature_cache.cpp`` with multi-threaded batch gathers and
fused box normalization. h5 files convert once via ``pack_from_h5``;
the loader then serves batches with zero python-side per-item work.

Builds the shared library on first use with g++ (no pip deps; cached
next to the source).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

MAGIC = 0x56514143_4C504B31
# the C++ source ships inside the package (vqacl_tpu/native/) so pip
# installs can build it on demand; VQACL_NATIVE_DIR overrides (e.g. a
# pre-built tree on a shared filesystem)
_NATIVE_DIR = (os.environ.get("VQACL_NATIVE_DIR")
               or os.path.join(os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))), "native"))
_LIB: Optional[ctypes.CDLL] = None


def _build_dir(src: str) -> str:
    """Prefer a build/ dir next to the source; fall back to a per-user
    cache when the install site is read-only (system site-packages)."""
    d = os.path.join(os.path.dirname(src), "build")
    try:
        os.makedirs(d, exist_ok=True)
        if os.access(d, os.W_OK):
            return d
    except OSError:
        pass
    d = os.path.join(os.path.expanduser("~"), ".cache", "vqacl_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _build_lib() -> str:
    src = os.path.join(_NATIVE_DIR, "feature_cache.cpp")
    out = os.path.join(_build_dir(src), "libvfcache.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", src, "-o", out],
            check=True, capture_output=True)
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.vf_hash.restype = ctypes.c_uint64
        lib.vf_hash.argtypes = [ctypes.c_char_p]
        lib.vf_open.restype = ctypes.c_void_p
        lib.vf_open.argtypes = [ctypes.c_char_p]
        lib.vf_close.argtypes = [ctypes.c_void_p]
        for f in ("vf_n_images", "vf_n_boxes", "vf_feat_dim"):
            getattr(lib, f).restype = ctypes.c_uint32
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        lib.vf_find.restype = ctypes.c_int64
        lib.vf_find.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.vf_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        _LIB = lib
    return _LIB


def fnv1a(s: str) -> int:
    h = 1469598103934665603
    for ch in s.encode():
        h ^= ch
        h = (h * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def write_pack(path: str,
               records: Iterable[Tuple[str, np.ndarray, np.ndarray,
                                       float, float]],
               n_boxes: int = 36, feat_dim: int = 2048) -> None:
    """records: (img_id, features [n_boxes,feat_dim] f32,
    boxes_pixels [n_boxes,4] f32, img_h, img_w)."""
    entries: List[Tuple[int, bytes]] = []
    hw: List[Tuple[float, float]] = []
    seen: Dict[int, str] = {}
    for img_id, feats, boxes, img_h, img_w in records:
        h = fnv1a(img_id)
        if h in seen and seen[h] != img_id:
            raise ValueError(f"hash collision: {img_id} vs {seen[h]}")
        seen[h] = img_id
        feats = np.ascontiguousarray(feats, np.float32)
        boxes = np.ascontiguousarray(boxes, np.float32)
        assert feats.shape == (n_boxes, feat_dim), feats.shape
        assert boxes.shape == (n_boxes, 4), boxes.shape
        entries.append((h, feats.tobytes() + boxes.tobytes()))
        hw.append((float(img_h), float(img_w)))

    order = np.argsort([e[0] for e in entries], kind="stable")
    header = struct.pack("<QIIII", MAGIC, 1, len(entries), n_boxes, feat_dim)
    assert len(header) == 24
    index_size = 24 * len(entries)
    offset = 24 + index_size
    with open(path, "wb") as f:
        f.write(header)
        for i in order:
            h, blob = entries[i]
            f.write(struct.pack("<QQff", h, offset, hw[i][0], hw[i][1]))
            offset += len(blob)
        for i in order:
            f.write(entries[i][1])


def pack_from_h5(h5_paths: Sequence[str], out_path: str,
                 n_boxes: int = 36, feat_dim: int = 2048) -> int:
    """Convert reference *_obj36.h5 file(s) → one pack. Returns count."""
    import h5py

    def gen():
        for hp in h5_paths:
            with h5py.File(hp, "r") as f:
                for img_id in f.keys():
                    g = f[img_id]
                    yield (img_id, np.asarray(g["features"], np.float32),
                           np.asarray(g["boxes"], np.float32),
                           float(np.asarray(g["img_h"])),
                           float(np.asarray(g["img_w"])))

    n = 0

    def counting():
        nonlocal n
        for r in gen():
            n += 1
            yield r

    write_pack(out_path, counting(), n_boxes=n_boxes, feat_dim=feat_dim)
    return n


class PackedFeatureStore:
    """Feature-store interface over the native pack (drop-in for
    H5FeatureStore) plus a zero-copy batch path for the collator."""

    def __init__(self, path: str, n_threads: int = 8):
        self._lib = _lib()
        self._h = self._lib.vf_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open pack {path}")
        self.n_boxes = self._lib.vf_n_boxes(self._h)
        self.feat_dim = self._lib.vf_feat_dim(self._h)
        self.n_images = self._lib.vf_n_images(self._h)
        self.n_threads = n_threads
        self._slot_cache: Dict[str, int] = {}

    def close(self) -> None:
        if self._h:
            self._lib.vf_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def slot(self, img_id: str) -> int:
        s = self._slot_cache.get(img_id)
        if s is None:
            s = self._lib.vf_find(self._h, fnv1a(img_id))
            self._slot_cache[img_id] = s
        return s

    def __contains__(self, img_id: str) -> bool:
        return self.slot(img_id) >= 0

    def get_batch(self, img_ids: Sequence[str]
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (feats [n, n_boxes, feat_dim], boxes [n, n_boxes, 4]
        normalized+clipped), gathered by the native threads."""
        n = len(img_ids)
        slots = np.asarray([self.slot(i) for i in img_ids], np.int64)
        feats = np.empty((n, self.n_boxes, self.feat_dim), np.float32)
        boxes = np.empty((n, self.n_boxes, 4), np.float32)
        self._lib.vf_gather(
            self._h, slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads)
        return feats, boxes

    def get(self, img_id: str) -> Tuple[np.ndarray, np.ndarray]:
        feats, boxes = self.get_batch([img_id])
        if self.slot(img_id) < 0:
            raise KeyError(img_id)
        return feats[0], boxes[0]
