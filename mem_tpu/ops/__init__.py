from mem_tpu.ops.voxelize import (
    voxelize_numpy,
    voxelize_jax,
    voxelize_fused,
)
