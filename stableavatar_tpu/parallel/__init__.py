from stableavatar_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_context,
    maybe_constrain,
    current_mesh,
)
from stableavatar_tpu.parallel.sharding import (  # noqa: F401
    shard_params,
    param_sharding_spec,
    replicate,
)
