"""Multihost utilities: single-process degenerate path + a simulated
2-process object all_gather (the TPU-native stand-in for the reference's
Gloo pickled-object gather, dist_utils.py:145 / vqacl.py:613)."""

import numpy as np

from vqacl_tpu.parallel import multihost as mh

import pytest

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def test_single_process_degenerate_paths():
    assert mh.process_count() == 1
    assert mh.is_main_process()
    mh.barrier("noop")                       # must not raise
    obj = {"q1": "yes", "q2": "two"}
    assert mh.all_gather_object(obj) == [obj]
    assert mh.merge_quesid2ans(obj) == obj


def test_simulated_two_process_gather(monkeypatch):
    """Drive the >1-process branch with a faked process_allgather so the
    pickle/pad/size bookkeeping is covered without a pod."""
    import jax
    from jax.experimental import multihost_utils

    objs = [{"q1": "yes"}, {"q2": "left", "q3": "2"}]
    import pickle
    payloads = [np.frombuffer(pickle.dumps(o), np.uint8) for o in objs]

    calls = {"n": 0}

    def fake_allgather(x):
        # first call gathers sizes, second gathers padded payloads
        calls["n"] += 1
        if calls["n"] == 1:
            return np.stack([np.asarray([p.size], np.int64)
                             for p in payloads])
        max_size = max(p.size for p in payloads)
        out = np.zeros((2, max_size), np.uint8)
        for i, p in enumerate(payloads):
            out[i, :p.size] = p
        return out

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    gathered = mh.all_gather_object(objs[0])
    assert gathered == objs

    calls["n"] = 0
    merged = mh.merge_quesid2ans(objs[0])
    assert merged == {"q1": "yes", "q2": "left", "q3": "2"}
