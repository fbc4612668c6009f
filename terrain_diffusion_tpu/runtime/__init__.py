from terrain_diffusion_tpu.runtime.window import TensorWindow  # noqa: F401
from terrain_diffusion_tpu.runtime.tile_store import (  # noqa: F401
    MemoryTileStore,
    HDF5TileStore,
)
from terrain_diffusion_tpu.runtime.infinite_tensor import InfiniteTensor  # noqa: F401
