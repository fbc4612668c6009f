"""Terrain Diffusion TPU CLI — command-compatible with the reference
(`terrain_diffusion/__main__.py:15-39`): train, save-model, build-*-dataset,
define-splits, explore, generate, api, mc-api, export (StableHLO),
onnx-export, azgaar-to-tiff, tiff-export.

Commands import lazily so `--help` stays fast and optional deps only load
when their command runs.
"""
import importlib

import click


class LazyGroup(click.Group):
    """Click group resolving subcommands from module paths on demand."""

    def __init__(self, *args, lazy_subcommands=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.lazy_subcommands = lazy_subcommands or {}

    def list_commands(self, ctx):
        return sorted(set(super().list_commands(ctx)) | set(self.lazy_subcommands))

    def get_command(self, ctx, cmd_name):
        if cmd_name in self.lazy_subcommands:
            mod_path, attr = self.lazy_subcommands[cmd_name].rsplit(":", 1)
            return getattr(importlib.import_module(mod_path), attr)
        return super().get_command(ctx, cmd_name)


cli = LazyGroup(
    help="Terrain Diffusion TPU - main entry point for all commands",
    lazy_subcommands={
        # training
        "train": "terrain_diffusion_tpu.training.train:main",
        "save-model": "terrain_diffusion_tpu.training.save_model:main",
        # data preprocessing
        "build-base-dataset": "terrain_diffusion_tpu.data.preprocessing.build_base_dataset:main",
        "build-encoded-dataset": "terrain_diffusion_tpu.data.preprocessing.build_encoded_dataset:main",
        "define-splits": "terrain_diffusion_tpu.data.preprocessing.define_splits:main",
        "build-synthetic-stats": "terrain_diffusion_tpu.pipeline.synthetic_map:build_stats_main",
        # inference / serving
        "explore": "terrain_diffusion_tpu.serving.explorer.server:main",
        "generate": "terrain_diffusion_tpu.serving.world_generator:main",
        "api": "terrain_diffusion_tpu.serving.api:main",
        "mc-api": "terrain_diffusion_tpu.serving.minecraft_api:main",
        "export": "terrain_diffusion_tpu.export.stablehlo_export:main",
        "onnx-export": "terrain_diffusion_tpu.export.onnx_export:main",
        "azgaar-to-tiff": "terrain_diffusion_tpu.serving.azgaar_to_tiff:main",
        "tiff-export": "terrain_diffusion_tpu.serving.tiff_export:main",
        # benchmarks
        "latency": "terrain_diffusion_tpu.evaluation.latency:main",
        # dev visualization harness
        "dev-viz": "terrain_diffusion_tpu.training.dev_utils.__main__:cli",
    },
)


if __name__ == "__main__":
    cli()
