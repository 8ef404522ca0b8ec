from smoothquant_tpu.parallel.cp import (
    CP_AXIS,
    make_cp_mesh,
    make_cp_prefill,
    ring_attention,
)
from smoothquant_tpu.parallel.mesh import DP_AXIS, TP_AXIS, make_mesh
from smoothquant_tpu.parallel.pp import (
    PP_AXIS,
    make_pp_forward,
    make_pp_mesh,
    stack_pp_stages,
)
from smoothquant_tpu.parallel.sharding import (
    assert_group_shardable,
    param_specs,
    shard_params,
)
