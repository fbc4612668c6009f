from terrain_diffusion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    shard_spatial,
    spatial_model,
)
