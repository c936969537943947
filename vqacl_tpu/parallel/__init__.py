from vqacl_tpu.parallel.mesh import (  # noqa: F401
    MeshContext,
    make_mesh,
    shard_batch,
    replicate,
)
from vqacl_tpu.parallel.sharding import param_sharding_rules, apply_rules  # noqa: F401
