from smoothquant_tpu.parallel.mesh import DP_AXIS, TP_AXIS, make_mesh
from smoothquant_tpu.parallel.sharding import (
    assert_group_shardable,
    param_specs,
    shard_params,
)
