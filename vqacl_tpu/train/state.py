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
    step: jnp.ndarray            # global optimizer step (for LR schedule)
    params: Any
    opt_state: Any
    proto: ProtoState
    rng: jax.Array

    @staticmethod
    def create(params: Any, tx: optax.GradientTransformation,
               proto: ProtoState, rng: jax.Array) -> "TrainState":
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            proto=proto,
            rng=rng,
        )

    def reset_optimizer(self, tx: optax.GradientTransformation) -> "TrainState":
        """Fresh AdamW per (task × group), vqacl.py:329. Resets the step
        counter too — the schedule warms up anew per group."""
        return self._replace(step=jnp.zeros((), jnp.int32),
                             opt_state=tx.init(self.params))
