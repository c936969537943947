"""Multi-host utilities.

The reference's cross-process machinery (Gloo pickled-object
``all_gather`` for prediction dicts, ``dist.barrier()`` choreography —
dist_utils.py:84-221, vqacl.py:310-613) collapses on a single-host TPU
slice. For multi-host pods these are the TPU-native equivalents; on one
process they are no-ops, so callers can use them unconditionally
(mirroring the reference's world_size==1 early-returns).
"""

from __future__ import annotations

from typing import Any, Dict, List


def process_count() -> int:
    import jax
    return jax.process_count()


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """dist.barrier() equivalent at task boundaries."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_gather_object(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from all processes
    (dist_utils.all_gather, used for quesid2ans at vqacl.py:613)."""
    if process_count() == 1:
        return [obj]
    import pickle

    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        out.append(pickle.loads(gathered[i][:int(sizes[i][0])].tobytes()))
    return out


def merge_quesid2ans(quesid2ans: Dict) -> Dict:
    """Union the per-process prediction dicts (vqacl.py:613-618)."""
    merged: Dict = {}
    for part in all_gather_object(quesid2ans):
        merged.update(part)
    return merged
