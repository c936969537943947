"""Device mesh construction and batch/param placement.

TPU-native replacement for the reference's process-per-GPU DDP+NCCL stack
(``VL-T5/src/vqacl.py:127,643-645``, ``dist_utils.py``): one JAX process,
an explicit ``jax.sharding.Mesh`` over the chips, and NamedSharding
annotations.  Gradient all-reduce, parameter broadcast, and the pickled
Gloo ``all_gather`` of predictions all disappear into XLA collectives or
plain host code (single-process) — see SURVEY.md §2.4/§5.

Axes:
  ``dp``   — data parallel (batch-sharded). The reference's only strategy.
  ``tp``   — tensor parallel (attention heads / MLP hidden sharded);
             an extension beyond the reference, off by default (tp=1).
  ``pp``   — pipeline parallel (transformer blocks sharded stage-wise,
             GPipe microbatching via ppermute — parallel/pipeline.py);
             off by default (pp=1), axis only present when requested.
             Composes with ``tp``: a dp×tp×pp mesh runs Megatron
             tensor-parallel blocks inside each pipeline stage.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshContext:
    mesh: Mesh
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def dp(self) -> int:
        return self.mesh.shape["dp"]

    @property
    def tp(self) -> int:
        return self.mesh.shape["tp"]

    @property
    def pp(self) -> int:
        return dict(self.mesh.shape).get("pp", 1)

    def batch_sharding(self) -> NamedSharding:
        """Leading-axis (batch) sharding over the dp axis."""
        return NamedSharding(self.mesh, P("dp"))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def make_mesh(dp: int = -1, tp: int = 1, pp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None,
              compute_dtype=jnp.bfloat16,
              param_dtype=jnp.float32) -> MeshContext:
    """Build a ``(dp, tp)`` mesh — or ``(dp, tp, pp)`` when ``pp > 1``.
    ``dp=-1`` takes all remaining devices.

    On a v5e-8 slice the default is an 8×1 mesh: pure data parallelism,
    matching the reference's DDP semantics with params replicated
    (t5-base easily fits per-chip HBM).
    """
    devs = np.array(devices if devices is not None else jax.devices())
    n = devs.size
    if dp == -1:
        assert n % (tp * pp) == 0, \
            f"{n} devices not divisible by tp*pp={tp * pp}"
        dp = n // (tp * pp)
    assert dp * tp * pp == n, \
        f"dp*tp*pp={dp * tp * pp} != n_devices={n}"
    if pp > 1:
        mesh = Mesh(devs.reshape(dp, tp, pp), axis_names=("dp", "tp", "pp"))
    else:
        mesh = Mesh(devs.reshape(dp, tp), axis_names=("dp", "tp"))
    return MeshContext(mesh=mesh, compute_dtype=compute_dtype,
                       param_dtype=param_dtype)


def shard_batch(ctx: MeshContext, batch: Any) -> Any:
    """Place a host batch (pytree of np/jnp arrays) batch-sharded on dp.

    Pads nothing: callers guarantee batch size divisible by dp (the
    static-shape collator pads to the global batch size).
    """
    sharding = ctx.batch_sharding()
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def replicate(ctx: MeshContext, tree: Any) -> Any:
    """Fully replicate a pytree across the mesh (params, prototype banks)."""
    sharding = ctx.replicated()
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), tree)
