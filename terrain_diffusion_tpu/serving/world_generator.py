"""Batch world pre-generation (`generate` CLI).

Walks `world.residual` slices over a coarse window in 2048-px tiles to
populate the tile store (reference `inference/world_generator.py:8-76`).
"""
from __future__ import annotations

import click
from tqdm import tqdm

from terrain_diffusion_tpu.common.cli_helpers import parse_cache_size, parse_kwargs
from terrain_diffusion_tpu.pipeline.world import WorldPipeline, resolve_hdf5_path


def generate_world(model_path: str, hdf5_file=None, seed=None, coarse_window: int = 64,
                   caching_strategy: str = "direct", tile_size: int = 2048,
                   **kwargs) -> None:
    world = WorldPipeline.from_pretrained(model_path, seed=seed,
                                          caching_strategy=caching_strategy, **kwargs)
    if caching_strategy == "direct":
        world.bind(hdf5_file=hdf5_file)
    else:
        world.bind(hdf5_file or "TEMP")
    if tile_size < 256 or tile_size % 256:
        # the walk strides in coarse cells (256 px); a tile smaller than
        # the stride would leave permanent ungenerated gaps in the store
        raise ValueError(f"tile_size must be a positive multiple of 256, "
                         f"got {tile_size}")
    with world:
        print(f"World seed: {world.seed}")
        ci0, ci1 = -coarse_window, coarse_window
        cj0, cj1 = -coarse_window, coarse_window
        step = tile_size // 256  # loop unit is coarse cells (256 px)
        pbar = tqdm(total=((ci1 - ci0 + step - 1) // step)
                    * ((cj1 - cj0 + step - 1) // step),
                    desc="Generating world")
        for i in range(ci0, ci1, step):
            for j in range(cj0, cj1, step):
                world.residual[:, i * 256:i * 256 + tile_size,
                               j * 256:j * 256 + tile_size]
                pbar.update(1)


@click.command()
@click.argument("model_path")
@click.option("--caching-strategy", type=click.Choice(["indirect", "direct"]), default="direct")
@click.option("--hdf5-file", default=None)
@click.option("--cache-size", default="100M")
@click.option("--seed", type=int, default=None)
@click.option("--batch-size", type=str, default="1,2,4,8,16")
@click.option("--log-mode", type=click.Choice(["info", "verbose"]), default="verbose")
@click.option("--coarse-window", type=int, default=50)
@click.option("--dtype", type=click.Choice(["fp32", "bf16", "fp16"]), default="fp32")
@click.option("--kwarg", "extra_kwargs", multiple=True)
def main(model_path, caching_strategy, hdf5_file, cache_size, seed, batch_size,
         log_mode, coarse_window, dtype, extra_kwargs):
    """Generate a world using the terrain diffusion pipeline."""
    if caching_strategy == "indirect" and hdf5_file is None:
        hdf5_file = "TEMP"
    if hdf5_file is not None:
        hdf5_file = resolve_hdf5_path(hdf5_file)
    if "," in batch_size:
        batch_sizes = [int(x.strip()) for x in batch_size.split(",")]
    else:
        batch_sizes = int(batch_size)
    generate_world(
        model_path, hdf5_file, seed=seed, coarse_window=coarse_window,
        latents_batch_size=batch_sizes, log_mode=log_mode,
        dtype=None if dtype == "fp32" else dtype,
        caching_strategy=caching_strategy,
        cache_limit=parse_cache_size(cache_size),
        **parse_kwargs(extra_kwargs),
    )


if __name__ == "__main__":
    main()
