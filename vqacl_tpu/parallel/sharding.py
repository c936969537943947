"""Parameter sharding rules for the VL-T5 pytree.

The reference replicates all parameters (DDP). We additionally support a
tensor-parallel layout over the ``tp`` mesh axis so the same train step
scales model-parallel on larger meshes: attention QKV/output projections
shard over the head dimension and the MLP shards over the hidden (d_ff)
dimension — the standard Megatron layout expressed purely as
NamedShardings (XLA inserts the all-reduces over ICI).

Rules map param-path regexes → PartitionSpec. Anything unmatched is
replicated.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-regex, spec). Paths look like "encoder/block_0/attn/wq".
# Weight convention in vqacl_tpu.models.t5: all linears are stored as
# [in_features, out_features] and applied as x @ W.
RULES: List[Tuple[str, P]] = [
    # attention input projections: out dim = heads*d_kv → shard out over tp
    (r".*/attn/wq$", P(None, "tp")),
    (r".*/attn/wk$", P(None, "tp")),
    (r".*/attn/wv$", P(None, "tp")),
    # attention output projection: in dim = heads*d_kv → shard in over tp
    (r".*/attn/wo$", P("tp", None)),
    (r".*/cross_attn/wq$", P(None, "tp")),
    (r".*/cross_attn/wk$", P(None, "tp")),
    (r".*/cross_attn/wv$", P(None, "tp")),
    (r".*/cross_attn/wo$", P("tp", None)),
    # MLP: first matmul shards hidden out, second shards hidden in
    (r".*/mlp/wi$", P(None, "tp")),
    (r".*/mlp/wi_0$", P(None, "tp")),
    (r".*/mlp/wi_1$", P(None, "tp")),
    (r".*/mlp/wo$", P("tp", None)),
    # embeddings / norms / rel-pos bias / visual embedding: replicated
]


def param_sharding_rules(path: str) -> P:
    for pat, spec in RULES:
        if re.match(pat, path):
            return spec
    return P()


def _tree_paths(tree: Any, prefix: str = "") -> Any:
    """Mirror pytree with 'a/b/c' path strings at the leaves."""
    if isinstance(tree, dict):
        return {k: _tree_paths(v, f"{prefix}/{k}" if prefix else k)
                for k, v in tree.items()}
    return prefix


def apply_rules(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings matching ``params`` structure."""
    paths = _tree_paths(params)
    return jax.tree.map(
        lambda p: NamedSharding(mesh, param_sharding_rules(p)), paths)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """device_put params with tensor-parallel layout (replicated if tp=1)."""
    shardings = apply_rules(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def fsdp_rules(mesh: Mesh, params: Any, min_size: int = 1 << 14) -> Any:
    """ZeRO-3-style layout: params (and therefore the Adam moments that
    mirror them) shard over the ``dp`` axis too — GSPMD inserts the
    all-gathers before use and reduce-scatters on the gradients. Beyond
    the reference (SURVEY §2.4 calls it an optional bonus: t5-base fits
    replicated), but it is what makes the same step scale to models
    that don't.

    Composes with the tp rules: tp-sharded dims keep their axis; the
    remaining largest dp-divisible dim of each big tensor gets "dp".
    """
    import numpy as np

    dp = mesh.shape["dp"]
    paths = _tree_paths(params)

    def spec_for(path: str, x) -> NamedSharding:
        base = param_sharding_rules(path)
        shape = np.shape(x)
        if dp > 1 and np.prod(shape, dtype=np.int64) >= min_size:
            axes = list(base) + [None] * (len(shape) - len(base))
            order = sorted(range(len(shape)), key=lambda d: -shape[d])
            for d in order:
                if axes[d] is None and shape[d] % dp == 0:
                    axes[d] = "dp"
                    break
            base = P(*axes)
        return NamedSharding(mesh, base)

    return jax.tree.map(spec_for, paths, params)


def shard_params_fsdp(mesh: Mesh, params: Any) -> Any:
    return jax.tree.map(jax.device_put, params, fsdp_rules(mesh, params))
