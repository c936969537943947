"""Sample-specific / sample-invariant prototype mechanism, functionalized.

The reference mutates Python attributes on the module *during* the
forward pass (``/root/reference/VL-T5/src/modeling_t5_our.py:391-396,
465-511, 583-615``): per-question-type (Q, [10,768]) and per-category
(V, [80,768]) prototype banks, EMA-updated from the current batch and
then retrieved by tanh-cosine similarity, with the two retrieved vectors
appended (detached) to the encoder output.

On TPU that in-place statefulness becomes an explicit ``ProtoState``
pytree threaded through the compiled train step:

    new_state = proto_update(state, pooled_Q, pooled_V, labels, ...)
    q_vec, v_vec = proto_retrieve(new_state, pooled_Q, pooled_V)

All branches of the reference's ``update_prototype`` (first-batch-of-task
vs later, task 0 vs later tasks, mem-proto bootstrap on the second batch)
are expressed with ``jnp.where`` on counters carried in the state, so the
whole thing stays a single XLA program with no host round-trips.
Prototypes are stop-gradiented throughout — the reference detaches them
at every use site (concat :615, memory_loss :544-554), so no gradient
ever flows into the banks there either.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ProtoState(NamedTuple):
    """Prototype banks + bookkeeping. Shapes for VQA v2:
    Q [10, d], V [80, d]."""

    q_proto: jnp.ndarray        # [NQ, D] retrieval bank (self.Q_prototype)
    v_proto: jnp.ndarray        # [NV, D] retrieval bank (self.V_prototype)
    q_mem_proto: jnp.ndarray    # [NQ, D] current task's memory bank
    q_num: jnp.ndarray          # [NQ] accumulated per-class counts
    v_num: jnp.ndarray          # [NV]
    task_id: jnp.ndarray        # scalar int32 — current task index
    steps_in_task: jnp.ndarray  # scalar int32 — batches seen this task

    @staticmethod
    def create(n_ques_types: int, n_categories: int, d_model: int,
               dtype=jnp.float32) -> "ProtoState":
        return ProtoState(
            q_proto=jnp.zeros((n_ques_types, d_model), dtype),
            v_proto=jnp.zeros((n_categories, d_model), dtype),
            q_mem_proto=jnp.zeros((n_ques_types, d_model), dtype),
            q_num=jnp.zeros((n_ques_types,), dtype),
            v_num=jnp.zeros((n_categories,), dtype),
            task_id=jnp.zeros((), jnp.int32),
            steps_in_task=jnp.zeros((), jnp.int32),
        )

    def start_task(self, task_id: int) -> "ProtoState":
        """Host-side task-boundary reset: the reference's per-task dicts
        (Q_task_cur_proto / Q_task_mem_proto keyed by task id) mean each
        task starts with fresh 'seen' flags; banks persist."""
        return self._replace(task_id=jnp.asarray(task_id, jnp.int32),
                             steps_in_task=jnp.zeros((), jnp.int32))


def batch_class_means(hidden_pooled: jnp.ndarray,
                      labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class mean of pooled hiddens (``calculate_current_prototype``,
    modeling_t5_our.py:500-511).

    hidden_pooled [B, D] (already mean-pooled over sequence, pads
    included, matching ``torch.mean(hidden[:, :L], dim=1)``),
    labels [B, C] one-hot. Returns ([C, D] class means with zero rows
    where the class is absent — reference divides by 1 there — and [C]
    counts).
    """
    counts = jnp.sum(labels, axis=0)                        # [C]
    sums = jnp.einsum("bc,bd->cd", labels, hidden_pooled,
                      preferred_element_type=jnp.float32)   # [C, D]
    denom = jnp.where(counts <= 0, 1.0, counts)[:, None]
    return sums / denom, counts


def cosine_retrieve(bank: jnp.ndarray, pooled: jnp.ndarray,
                    labels: jnp.ndarray | None = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """tanh → L2-normalize → cosine argmax retrieval
    (``cosine_similarity_multi``, modeling_t5_our.py:434-462).

    Returns (selected [B,D] raw bank rows, argmax idx [B], retrieval
    accuracy scalar — -1.0 when labels are None).
    """
    def norm(x):
        t = jnp.tanh(x.astype(jnp.float32))
        return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)

    sim = norm(pooled) @ norm(bank).T          # [B, C]
    idx = jnp.argmax(sim, axis=-1)             # [B]
    selected = bank[idx]
    if labels is not None:
        true_idx = jnp.argmax(labels, axis=-1)
        acc = jnp.mean((idx == true_idx).astype(jnp.float32))
    else:
        acc = jnp.asarray(-1.0)
    return selected, idx, acc


def proto_update(state: ProtoState,
                 cur_q: jnp.ndarray, cur_v: jnp.ndarray,
                 num_q: jnp.ndarray, num_v: jnp.ndarray,
                 proto_alpha: float, proto_beta: float) -> ProtoState:
    """Functional port of ``update_prototype`` (modeling_t5_our.py:465-498).

    Reference branch structure (tid = current task id):
      step 0 of a task ("tid not in Q_task_cur_proto"):
        nums ← batch counts; V ← cur_V
        tid==0: Q ← cur_Q          else: Q[tid] ← cur_Q[tid]
      step ≥ 1:
        tid==0: Q ← cur_Q
        tid>0:  mem = cur_Q with row tid zeroed
                step 1: Q_mem ← mem          (bootstrap)
                step>1: Q_mem ← α·Q_mem + (1-α)·mem
                Q ← Q_mem with row tid ← cur_Q[tid]
        V ← β·V + (1-β)·cur_V
        nums ← nums + batch counts
    Everything is detached (see module docstring).
    """
    cur_q = jax.lax.stop_gradient(cur_q.astype(state.q_proto.dtype))
    cur_v = jax.lax.stop_gradient(cur_v.astype(state.v_proto.dtype))
    num_q = jax.lax.stop_gradient(num_q.astype(state.q_num.dtype))
    num_v = jax.lax.stop_gradient(num_v.astype(state.v_num.dtype))

    tid = state.task_id
    step = state.steps_in_task
    first = step == 0
    second = step == 1
    task0 = tid == 0

    nq = state.q_proto.shape[0]
    row_is_tid = jnp.arange(nq) == tid              # [NQ]
    mem_candidate = jnp.where(row_is_tid[:, None], 0.0, cur_q)

    # --- Q memory bank (only meaningful for tid > 0, step >= 1) ---
    q_mem_new = jnp.where(
        second[None, None],
        mem_candidate,
        proto_alpha * state.q_mem_proto + (1.0 - proto_alpha) * mem_candidate)
    q_mem = jnp.where(first[None, None], state.q_mem_proto, q_mem_new)

    # --- Q retrieval bank ---
    q_first = jnp.where(task0, cur_q,
                        jnp.where(row_is_tid[:, None], cur_q, state.q_proto))
    q_later = jnp.where(task0, cur_q,
                        jnp.where(row_is_tid[:, None], cur_q, q_mem))
    q_proto = jnp.where(first[None, None], q_first, q_later)

    # --- V retrieval bank ---
    v_proto = jnp.where(first[None, None], cur_v,
                        proto_beta * state.v_proto + (1.0 - proto_beta) * cur_v)

    q_num = jnp.where(first, num_q, state.q_num + num_q)
    v_num = jnp.where(first, num_v, state.v_num + num_v)

    return state._replace(q_proto=q_proto, v_proto=v_proto, q_mem_proto=q_mem,
                          q_num=q_num, v_num=v_num,
                          steps_in_task=step + 1)


def memory_loss(pooled_q: jnp.ndarray, pooled_v: jnp.ndarray,
                ques_labels: jnp.ndarray, cate_labels: jnp.ndarray,
                state: ProtoState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SI regularizer (``modeling_t5_nextqa.py:544-556``): squared L2 pull
    of pooled hiddens toward their label's (detached) prototype."""
    q_tgt = jax.lax.stop_gradient(ques_labels @ state.q_proto)
    v_tgt = jax.lax.stop_gradient(cate_labels @ state.v_proto)
    loss_q = jnp.mean(jnp.sum((pooled_q - q_tgt) ** 2, axis=-1))
    loss_v = jnp.mean(jnp.sum((pooled_v - v_tgt) ** 2, axis=-1))
    return loss_q, loss_v
