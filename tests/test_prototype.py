"""Prototype mechanism semantics vs a direct numpy oracle.

The oracle transcribes the reference's branchy, dict-keyed, in-place
``update_prototype`` control flow (modeling_t5_our.py:465-498) in plain
numpy; the functional ``proto_update`` (where-masked, counter-driven)
must produce identical banks over multi-task multi-step sequences.
"""

import numpy as np
import jax.numpy as jnp

from vqacl_tpu.models.prototype import (
    ProtoState, batch_class_means, cosine_retrieve, proto_update,
)

NQ, NV, D = 4, 6, 8


class Oracle:
    """Direct transcription of reference update_prototype semantics."""

    def __init__(self):
        self.Q_task_cur = {}
        self.Q_task_mem = {}
        self.Q = np.zeros((NQ, D))
        self.V = np.zeros((NV, D))
        self.Qnum = np.zeros(NQ)
        self.Vnum = np.zeros(NV)

    def update(self, cur_q, cur_v, num_q, num_v, tid, a, b):
        if tid not in self.Q_task_cur:
            self.Q_task_cur[tid] = cur_q
            self.Qnum = num_q.copy()
            self.Vnum = num_v.copy()
            self.V = cur_v.copy()
            if tid == 0:
                self.Q = cur_q.copy()
            else:
                self.Q = self.Q.copy()
                self.Q[tid] = cur_q[tid]
        else:
            self.Q_task_cur[tid] = cur_q
            if tid != 0:
                mem = cur_q.copy()
                mem[tid] = 0
                if tid not in self.Q_task_mem:
                    self.Q_task_mem[tid] = mem
                else:
                    self.Q_task_mem[tid] = a * self.Q_task_mem[tid] + (1 - a) * mem
                self.Q = self.Q_task_mem[tid].copy()
                self.Q[tid] = cur_q[tid]
            else:
                self.Q = cur_q.copy()
            self.V = b * self.V + (1 - b) * cur_v
            self.Qnum = self.Qnum + num_q
            self.Vnum = self.Vnum + num_v


def test_proto_update_matches_oracle():
    rng = np.random.default_rng(0)
    a, b = 0.3, 0.5
    oracle = Oracle()
    state = ProtoState.create(NQ, NV, D)
    for tid in range(3):
        state = state.start_task(tid)
        for step in range(4):
            cur_q = rng.normal(size=(NQ, D)).astype(np.float32)
            cur_v = rng.normal(size=(NV, D)).astype(np.float32)
            num_q = rng.integers(0, 5, NQ).astype(np.float32)
            num_v = rng.integers(0, 5, NV).astype(np.float32)
            oracle.update(cur_q, cur_v, num_q, num_v, tid, a, b)
            state = proto_update(state, jnp.asarray(cur_q), jnp.asarray(cur_v),
                                 jnp.asarray(num_q), jnp.asarray(num_v), a, b)
            np.testing.assert_allclose(np.asarray(state.q_proto), oracle.Q,
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"Q tid={tid} step={step}")
            np.testing.assert_allclose(np.asarray(state.v_proto), oracle.V,
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"V tid={tid} step={step}")
            np.testing.assert_allclose(np.asarray(state.q_num), oracle.Qnum,
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(state.v_num), oracle.Vnum,
                                       rtol=1e-6)


def test_batch_class_means():
    """calculate_current_prototype parity (modeling_t5_our.py:500-511):
    absent classes divide by 1 → zero rows."""
    pooled = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], np.float32)
    labels = np.zeros((3, 4), np.float32)
    labels[0, 1] = 1
    labels[1, 1] = 1
    labels[2, 3] = 1
    means, counts = batch_class_means(jnp.asarray(pooled), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(means[1]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(means[3]), [5.0, 6.0])
    np.testing.assert_allclose(np.asarray(means[0]), [0.0, 0.0])  # absent
    np.testing.assert_allclose(np.asarray(counts), [0, 2, 0, 1])


def test_cosine_retrieve_selects_nearest():
    rng = np.random.default_rng(1)
    bank = rng.normal(size=(5, D)).astype(np.float32)
    # queries = noisy copies of bank rows 3, 0
    q = np.stack([bank[3] + 0.01 * rng.normal(size=D),
                  bank[0] + 0.01 * rng.normal(size=D)]).astype(np.float32)
    sel, idx, acc = cosine_retrieve(jnp.asarray(bank), jnp.asarray(q))
    assert list(np.asarray(idx)) == [3, 0]
    np.testing.assert_allclose(np.asarray(sel), bank[[3, 0]], rtol=1e-6)
    labels = np.zeros((2, 5), np.float32)
    labels[0, 3] = 1
    labels[1, 0] = 1
    _, _, acc = cosine_retrieve(jnp.asarray(bank), jnp.asarray(q),
                                jnp.asarray(labels))
    assert float(acc) == 1.0
