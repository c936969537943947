"""Train state: one pytree holding everything the compiled step touches.

Unlike the reference — where prototype banks live as loose Python
attributes outside ``state_dict`` and silently vanish on resume unless
separate ``.pt`` files are loaded (SURVEY.md §5, vqacl.py:420-426) — the
prototype state is a first-class member of the checkpointed train state.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vqacl_tpu.models.prototype import ProtoState


class TrainState(NamedTuple):
    step: jnp.ndarray            # optimizer step within the current group
    params: Any
    opt_state: Any
    proto: ProtoState
    rng: jax.Array
    sched: jnp.ndarray           # [warmup_iters, t_total] — traced schedule
                                 # params so group resets don't recompile

    @staticmethod
    def create(params: Any, tx: optax.GradientTransformation,
               proto: ProtoState, rng: jax.Array,
               warmup_iters: float = 100.0, t_total: float = 1000.0
               ) -> "TrainState":
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            proto=proto,
            rng=rng,
            sched=jnp.asarray([warmup_iters, t_total], jnp.float32),
        )

    def reset_optimizer(self, tx: optax.GradientTransformation,
                        warmup_iters: float, t_total: float) -> "TrainState":
        """Fresh AdamW per (task × group), vqacl.py:329: zeroed moments,
        step counter restarted, new schedule horizon — all state values,
        so the compiled step is reused."""
        return self._replace(
            step=jnp.zeros((), jnp.int32),
            opt_state=tx.init(self.params),
            sched=jnp.asarray([warmup_iters, t_total], jnp.float32))
