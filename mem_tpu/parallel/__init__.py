from mem_tpu.parallel.mesh import (
    get_mesh,
    init_distributed,
    shard_batch,
    replicate,
    unreplicate,
    psum_metrics,
)
