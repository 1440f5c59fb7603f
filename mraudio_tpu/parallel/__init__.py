from mraudio_tpu.parallel.mesh import make_mesh
from mraudio_tpu.parallel.partition import (
    batch_sharding,
    param_shardings,
    shard_params,
)

__all__ = ["make_mesh", "param_shardings", "shard_params", "batch_sharding"]
