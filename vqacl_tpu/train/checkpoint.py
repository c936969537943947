"""Checkpoint save/load: params + prototype banks + step, one artifact.

The reference splits state across ``{task}_LAST.pth`` (model only,
trainer_base.py:246-249) and loose ``Q_prototype.pt``/``V_prototype.pt``
files (vqacl.py:420-426) that are silently lost on resume if forgotten
(SURVEY.md §5). Here the full train-relevant state serializes to a
single ``.npz`` (flattened pytree paths → arrays) — fast, portable,
no torch/pickle. Reference ``.pth`` checkpoints can still be ingested
through ``vqacl_tpu.models.hf_import.from_state_dict``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np

from vqacl_tpu.models.prototype import ProtoState

SEP = "::"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{SEP}{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _build_flat(params: Any, proto: ProtoState, step: int,
                extra: Dict[str, np.ndarray] | None) -> Dict[str, np.ndarray]:
    flat = _flatten({"params": params})
    for value, name in zip(proto, proto._fields):
        flat[f"proto{SEP}{name}"] = np.asarray(value)
    flat["meta::step"] = np.asarray(step)
    for k, v in (extra or {}).items():
        flat[f"extra{SEP}{k}"] = np.asarray(v)
    return flat


def _atomic_savez(path: str, flat: Dict[str, np.ndarray]) -> None:
    """Write ``<path>.npz`` via a temp file + ``os.replace`` so a crash
    mid-write never leaves a truncated archive where a good checkpoint
    (or none) used to be."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def save_checkpoint(path: str, params: Any, proto: ProtoState,
                    step: int = 0, extra: Dict[str, np.ndarray] | None = None
                    ) -> None:
    _atomic_savez(path, _build_flat(params, proto, step, extra))


class AsyncCheckpointer:
    """Background checkpoint writer: overlap serialization + disk IO
    with whatever the trainer does next (here: the per-task test
    matrix, which takes far longer than the write).

    ``save()`` snapshots the arrays synchronously (callers pass
    host-side arrays, e.g. ``jax.device_get`` results — REQUIRED when
    the train step donates its inputs: a device array captured lazily
    could be invalidated by the next step), then hands the flat dict to
    a writer thread that performs the same atomic tmp+replace write as
    :func:`save_checkpoint`. One write in flight at a time; ``wait()``
    joins it and re-raises any writer exception. The reference saves
    synchronously on the main thread (``vqacl.py:415-418``)."""

    def __init__(self) -> None:
        self._thread = None
        self._err: BaseException | None = None

    def save(self, path: str, params: Any, proto: ProtoState,
             step: int = 0,
             extra: Dict[str, np.ndarray] | None = None) -> None:
        self.wait()
        flat = _build_flat(params, proto, step, extra)

        def _write() -> None:
            try:
                _atomic_savez(path, flat)
            except BaseException as e:     # surfaced by the next wait()
                self._err = e

        import threading
        self._thread = threading.Thread(target=_write, daemon=True,
                                        name="ckpt-writer")
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def load_checkpoint(path: str) -> Tuple[Any, ProtoState, int]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    flat = {k: z[k] for k in z.files}
    params = _unflatten({k[len("params" + SEP):]: v for k, v in flat.items()
                         if k.startswith("params" + SEP)})
    proto_fields = {k[len("proto" + SEP):]: v for k, v in flat.items()
                    if k.startswith("proto" + SEP)}
    proto = ProtoState(**{name: proto_fields[name]
                          for name in ProtoState._fields})
    step = int(flat.get("meta::step", np.asarray(0)))
    return params, proto, step


# ---------------------------------------------------------------------------
# orbax backend (production TPU checkpointing: async, sharding-aware,
# multi-host safe). Optional — the npz path has no extra dependencies.
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(directory: str, params: Any, proto: ProtoState,
                          step: int = 0) -> None:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    tree = {"params": params, "proto": dict(proto._asdict()),
            "step": np.asarray(step)}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory, tree, force=True)


def load_checkpoint_orbax(directory: str) -> Tuple[Any, ProtoState, int]:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(directory)
    proto = ProtoState(**{k: tree["proto"][k] for k in ProtoState._fields})
    return tree["params"], proto, int(tree["step"])
