from mem_tpu.parallel.mesh import (
    get_mesh,
    init_distributed,
    shard_batch,
    shard_params,
    shard_opt_state_zero1,
    shard_fsdp,
    fsdp_specs,
    place_train_state,
    replicate,
    unreplicate,
    psum_metrics,
)
from mem_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_param_sharding,
    stack_stage_params,
)
