"""terrain_diffusion_tpu: a TPU-native terrain generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
`xandergos/terrain-diffusion` reference (InfiniteDiffusion lazy tiled
generation, hierarchical coarse->base->decoder diffusion stack, training,
serving, export), designed TPU-first:

- counter-based (threefry) and portable (PCG64) deterministic noise fields
  with O(1) random access,
- jitted `lax.scan` EDM DPM-Solver++ sampling,
- magnitude-preserving U-Nets in NHWC layout feeding the MXU,
- a batching infinite-tensor runtime that plans the full window dependency
  DAG of a query and dispatches padded batches to jitted programs sharded
  over a `jax.sharding.Mesh`,
- C++ native kernels for the host-side hot paths (portable RNG, Perlin FBm).
"""

__version__ = "0.1.0"
