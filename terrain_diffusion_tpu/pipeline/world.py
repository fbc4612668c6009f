"""WorldPipeline: 3-stage lazy hierarchical terrain generation on TPU.

Ground-up rebuild of the reference's heart
(`inference/world_pipeline.py:276-1385`) on the TPU-native runtime:

- coarse stage: 64-px tiles / stride 48, 20-step DPM-Solver++ **lax.scan**
  over the coarse U-Net, conditioned on the synthetic map mixed with
  deterministic noise via TrigFlow cos/sin at per-channel SNR
  (`world_pipeline.py:909-992`);
- latent stage: 64-px latent tiles / stride 32, 1-2 TrigFlow consistency
  steps, batched through padded batch buckets; per-tile 58-dim conditioning
  vector built **inside** the jitted program from the 4x4 coarse context
  window (`world_pipeline.py:1018-1203`);
- decoder stage: 512-px tiles / stride 384, 1-step consistency decode of the
  x8-nearest-upsampled latents (`world_pipeline.py:1209-1270`);
- output composition: Laplacian denoise+decode + signed-square for elevation
  (`:1276-1313`); windowed temperature regression + bilinear grid-sample
  upsampling for climate (`:1315-1365`).

TPU-first properties: every stage is one jitted program vectorized over a
tile batch; all stochastic inputs are generated **inside** the programs from
counter-based threefry keyed on (seed, stage, tile) — identical regardless of
batch composition or evaluation order (noise_mode='portable' instead feeds
host PCG64 streams for parity with reference worlds).  Stage weights live on
device once; only conditioning rasters and packed tile outputs cross the
host boundary.
"""
from __future__ import annotations

import contextlib
import functools
import dataclasses
import json
import os
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.nn import torch_compat
from terrain_diffusion_tpu.ops import mp
from terrain_diffusion_tpu.ops.image import (
    avg_pool,
    grid_sample_bilinear,
    max_pool,
    min_pool,
    signed_square,
    upsample_nearest,
)
from terrain_diffusion_tpu.ops.laplacian import laplacian_decode, laplacian_denoise
from terrain_diffusion_tpu.ops.noise_field import (
    gaussian_noise_patch,
    seed_to_pair,
    threefry_noise_patch,
)
from terrain_diffusion_tpu.ops.rng_portable import next_seed
from terrain_diffusion_tpu.ops.windows import linear_weight_window
from terrain_diffusion_tpu.pipeline.postprocessing import local_baseline_temperature
from terrain_diffusion_tpu.pipeline.synthetic_map import make_synthetic_map_factory
from terrain_diffusion_tpu.runtime import (
    HDF5TileStore,
    InfiniteTensor,
    MemoryTileStore,
    TensorWindow,
)
from terrain_diffusion_tpu.runtime.infinite_tensor import _next_pow2
from terrain_diffusion_tpu.scheduler import (
    EDMSchedulerConfig,
    compute_sigmas,
    trigflow_precondition_noise,
)

# Channel statistics the reference bakes into the pipeline
# (`world_pipeline.py:358-360`, `:1136-1138`, `:1277-1280`).
DEFAULT_COARSE_MEANS = [-37.67916460232751, 2.22578822145657, 18.030293275011356,
                        333.8442390481231, 1350.1259248456176, 52.444339366764396]
DEFAULT_COARSE_STDS = [39.68515115440358, 3.0981253981231522, 8.940333096712806,
                       322.25238547630295, 856.3430083394657, 30.982620765341043]
COND_INPUT_MEAN = np.array([14.99, 11.65, 15.87, 619.26, 833.12, 69.40, 0.66], np.float32)
COND_INPUT_STD = np.array([21.72, 21.78, 10.40, 452.29, 738.09, 34.59, 0.47], np.float32)
LOWFREQ_MEAN = -31.4
LOWFREQ_STD = 38.6

_TEMP_FILES = set()


def resolve_hdf5_path(hdf5_file: str) -> str:
    if hdf5_file.upper() == "TEMP":
        f = tempfile.NamedTemporaryFile(delete=False, suffix=".h5", prefix="terrain_")
        f.close()
        _TEMP_FILES.add(f.name)
        return f.name
    return hdf5_file


def _pack_elev_i16(elev):
    """Device-side wire conversion matching serving/api.py:_elev_to_int16
    exactly: floor, clip to int16 range."""
    return jnp.clip(jnp.floor(elev), -32768, 32767).astype(jnp.int16)


def _ceil_div(a, b):
    return -((-a) // b)


class WorldPipeline:
    """Multi-scale terrain generation pipeline (TPU-native)."""

    COARSE_MODEL_FOLDER = "coarse_model"
    BASE_MODEL_FOLDER = "base_model"
    DECODER_MODEL_FOLDER = "decoder_model"
    CONFIG_NAME = "config.json"

    def __init__(
        self,
        seed: int | None = None,
        latents_batch_size=(1, 2, 4, 8, 16, 32, 64),
        native_resolution: float = 90.0,
        *,
        T: int = 2,
        log_mode: str = "info",
        dtype: str | None = None,
        latent_compression: int = 8,
        frequency_mult=None,
        drop_water_pct: float = 0.5,
        cond_snr=None,
        coarse_pooling: int = 1,
        elev_coarse_pool_mode: str = "avg",
        p5_coarse_pool_mode: str = "avg",
        residual_mean: float = 0.0,
        residual_std: float = 1.1678,
        coarse_means=None,
        coarse_stds=None,
        caching_strategy: str = "direct",
        cache_limit: int | None = 100 * 1024 * 1024,
        onestep_latent: bool = False,
        decoder_tile_size: int = 512,
        decoder_tile_stride: int = 384,
        noise_mode: str = "threefry",
        block_impl: str = "pallas",
        mesh=None,
        **deprecated_kwargs,
    ):
        if T not in (1, 2):
            raise ValueError(f"T must be 1 or 2, got {T}")
        self.T = T
        self.seed = (int(seed) & 0xFFFFFFFFFFFFFFFF) if seed is not None else next_seed(None)
        if isinstance(latents_batch_size, int):
            self._batch_sizes = [latents_batch_size]
        else:
            self._batch_sizes = sorted(latents_batch_size)
        self.latents_batch_size = self._batch_sizes[-1]
        self.native_resolution = native_resolution
        self.latent_compression = latent_compression
        self.log_mode = log_mode
        self.caching_strategy = caching_strategy
        self.cache_limit = cache_limit
        self.onestep_latent = onestep_latent
        self.decoder_tile_size = decoder_tile_size
        self.decoder_tile_stride = decoder_tile_stride
        self.noise_mode = noise_mode
        # U-Net block implementation for stage models: "pallas" fuses each
        # large-map residual block into one VMEM-resident kernel
        # (ops/pallas_block.py; measured 1.5x decoder speedup on v5e);
        # automatically falls back to the XLA path off-TPU and on small
        # maps, so it is safe as the serving default.  "xla" disables.
        self.block_impl = block_impl
        # Optional jax.sharding.Mesh: tile batches are sharded over its
        # 'data' axis so each stage program runs one slice per device
        # (tile-parallel serving; batch buckets should be multiples of the
        # device count for full utilization).
        self.mesh = mesh
        if dtype == "bf16":
            self._dtype = jnp.bfloat16
        elif dtype == "fp16":
            self._dtype = jnp.float16
        else:
            self._dtype = jnp.float32
        self.kwargs = {
            "latent_compression": latent_compression,
            "log_mode": log_mode,
            "frequency_mult": list(frequency_mult) if frequency_mult is not None else [1.5, 3, 3, 3, 3],
            "drop_water_pct": drop_water_pct,
            "cond_snr": list(cond_snr) if cond_snr is not None else [0.3, 0.1, 1.0, 0.1, 1.0],
            "coarse_pooling": coarse_pooling,
            "elev_coarse_pool_mode": elev_coarse_pool_mode,
            "p5_coarse_pool_mode": p5_coarse_pool_mode,
            "histogram_raw": deprecated_kwargs.get("histogram_raw") or [0.0] * 5,
            "residual_mean": residual_mean,
            "residual_std": residual_std,
            "coarse_means": list(coarse_means) if coarse_means is not None else list(DEFAULT_COARSE_MEANS),
            "coarse_stds": list(coarse_stds) if coarse_stds is not None else list(DEFAULT_COARSE_STDS),
        }

        # (model, params) pairs — set by from_local_models/from_pretrained
        self.coarse_model = None
        self.coarse_params = None
        self.base_model = None
        self.base_params = None
        self.decoder_model = None
        self.decoder_params = None

        # runtime state
        self.tile_store = None
        self._hdf5_file_path = None
        self._is_temp_file = False
        self.synthetic_map_factory = None
        self.coarse = None
        self.latents = None
        self.residual = None
        self.custom_conditioning_imports = {}
        self.custom_conditioning_import_origins = {}
        self.custom_conditioning_default_values = {}
        self._compiled = {}
        self.stage_timings = {}

    # ==================================================================
    # Config / model IO
    # ==================================================================
    def get_config(self) -> dict:
        cfg = {
            "_class_name": "WorldPipeline",
            "native_resolution": self.native_resolution,
            "T": self.T,
            "latent_compression": self.latent_compression,
            "frequency_mult": self.kwargs["frequency_mult"],
            "drop_water_pct": self.kwargs["drop_water_pct"],
            "cond_snr": self.kwargs["cond_snr"],
            "coarse_pooling": self.kwargs["coarse_pooling"],
            "elev_coarse_pool_mode": self.kwargs["elev_coarse_pool_mode"],
            "p5_coarse_pool_mode": self.kwargs["p5_coarse_pool_mode"],
            "residual_mean": self.kwargs["residual_mean"],
            "residual_std": self.kwargs["residual_std"],
            "coarse_means": self.kwargs["coarse_means"],
            "coarse_stds": self.kwargs["coarse_stds"],
            "histogram_raw": self.kwargs["histogram_raw"],
            "onestep_latent": self.onestep_latent,
            "decoder_tile_size": self.decoder_tile_size,
            "decoder_tile_stride": self.decoder_tile_stride,
        }
        return cfg

    def save_pretrained(self, save_directory: str):
        os.makedirs(save_directory, exist_ok=True)
        with open(os.path.join(save_directory, self.CONFIG_NAME), "w") as f:
            json.dump(self.get_config(), f, indent=2)
        if self.coarse_model is not None:
            torch_compat.save_model(self.coarse_model, self.coarse_params,
                                    os.path.join(save_directory, self.COARSE_MODEL_FOLDER))
        if self.base_model is not None:
            torch_compat.save_model(self.base_model, self.base_params,
                                    os.path.join(save_directory, self.BASE_MODEL_FOLDER))
        if self.decoder_model is not None:
            torch_compat.save_model(self.decoder_model, self.decoder_params,
                                    os.path.join(save_directory, self.DECODER_MODEL_FOLDER))

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "WorldPipeline":
        with open(os.path.join(path, cls.CONFIG_NAME)) as f:
            config = json.load(f)
        config.pop("_class_name", None)
        config.update(kwargs)
        pipe = cls(**config)
        pipe.coarse_model, pipe.coarse_params = torch_compat.load_model(
            os.path.join(path, cls.COARSE_MODEL_FOLDER))
        pipe.base_model, pipe.base_params = torch_compat.load_model(
            os.path.join(path, cls.BASE_MODEL_FOLDER))
        pipe.decoder_model, pipe.decoder_params = torch_compat.load_model(
            os.path.join(path, cls.DECODER_MODEL_FOLDER))
        pipe._apply_block_impl()
        return pipe

    @classmethod
    def from_local_models(cls, coarse_model_path=None, base_model_path=None,
                          decoder_model_path=None, **kwargs) -> "WorldPipeline":
        pipe = cls(**kwargs)
        pipe.coarse_model, pipe.coarse_params = torch_compat.load_model(coarse_model_path)
        pipe.base_model, pipe.base_params = torch_compat.load_model(base_model_path)
        pipe.decoder_model, pipe.decoder_params = torch_compat.load_model(decoder_model_path)
        pipe._apply_block_impl()
        return pipe

    def set_models(self, coarse, base, decoder):
        """Attach (model, params) pairs directly (tests, custom loading)."""
        self.coarse_model, self.coarse_params = coarse
        self.base_model, self.base_params = base
        self.decoder_model, self.decoder_params = decoder
        self._apply_block_impl()
        self._compiled = {}  # stage programs close over the model objects
        if self.tile_store is not None:
            # already bound: the stage tensors' window fns captured the OLD
            # (model, params) at _build_hierarchy time — rebuild so new
            # weights actually generate (cached tiles stay; call rebuild()
            # to also drop them)
            self._build_hierarchy()
        return self

    def _apply_block_impl(self):
        """Inject the pipeline's block_impl into each stage model's
        block_kwargs (params are unaffected — the fused kernel consumes the
        same weight pytree)."""
        if self.block_impl in (None, "xla"):
            return
        for attr in ("coarse_model", "base_model", "decoder_model"):
            model = getattr(self, attr)
            if model is None:
                continue
            bk = dict(model.config.block_kwargs or {})
            if bk.get("block_impl") == self.block_impl:
                continue
            bk["block_impl"] = self.block_impl
            cfg = dataclasses.replace(model.config, block_kwargs=bk)
            setattr(self, attr, type(model)(cfg))

    # ==================================================================
    # Bind / lifecycle
    # ==================================================================
    def bind(self, hdf5_file=None, mode="a", compression="gzip", compression_opts=4):
        self._compression = compression
        self._compression_opts = compression_opts
        if self.caching_strategy == "direct":
            self.tile_store = MemoryTileStore(cache_size_bytes=self.cache_limit)
        else:
            if hdf5_file is None:
                raise ValueError("hdf5_file is required when caching_strategy='indirect'")
            original = hdf5_file
            hdf5_file = resolve_hdf5_path(hdf5_file)
            self._is_temp_file = original.upper() == "TEMP"
            self._hdf5_file_path = hdf5_file
            store = HDF5TileStore(hdf5_file, mode=mode, compression=compression,
                                  compression_opts=compression_opts)
            self._reconcile_params(store)
            self.tile_store = store
        self._init_conditioning()
        self._build_hierarchy()
        return self

    def _reconcile_params(self, store: HDF5TileStore):
        """Stored params win on mismatch (non-interactive equivalent of the
        reference's overwrite prompt, `world_pipeline.py:625-663`)."""

        def persisted(kw):
            # log_mode is a runtime verbosity knob, not a world parameter —
            # it must neither trigger a spurious mismatch nor be adopted
            return {k: v for k, v in kw.items() if k != "log_mode"}

        current = {"seed": self.seed, "kwargs": persisted(self.kwargs)}
        stored = store.get_params()
        if stored is None:
            store.set_params(current)
            return
        stored_cmp = {"seed": stored["seed"],
                      "kwargs": persisted(stored["kwargs"])}
        if stored_cmp != current:
            print("[WorldPipeline] stored world params differ; using stored "
                  "(pass a fresh file or call rebuild() to regenerate)")
            self.seed = stored["seed"]
            self.kwargs = {**persisted(stored["kwargs"]),
                           "log_mode": self.log_mode}
            # derived attributes read outside self.kwargs must follow the
            # adopted world parameters or new tiles blend at the wrong scale
            self.latent_compression = self.kwargs.get(
                "latent_compression", self.latent_compression)

    def _init_conditioning(self):
        self.synthetic_map_factory = make_synthetic_map_factory(
            seed=self.seed,
            frequency_mult=self.kwargs["frequency_mult"],
            drop_water_pct=self.kwargs["drop_water_pct"],
        )

    def _build_hierarchy(self):
        # NOTE: self._compiled is deliberately NOT reset here.  Stage
        # programs take the seed as a *traced* uint32 pair and are keyed on
        # the static config actually baked into them, so rebuild()/
        # change_seed() reuse every compiled program — on remote-compile
        # backends a seed change would otherwise cost a full recompile storm.
        self.coarse = self._build_coarse_stage()
        self.latents = self._build_latent_stage()
        self.residual = self._build_decoder_stage()

    def _prog(self, key, builder):
        """Fetch-or-build a jitted stage program keyed on the static config
        baked into its HLO (seed and geometry arrive as traced data)."""
        if key not in self._compiled:
            self._compiled[key] = builder()
        return self._compiled[key]

    def empty_cache(self):
        if self.tile_store is None:
            return
        for t in (self.coarse, self.latents, self.residual):
            if t is not None:
                t.clear_cache()

    def close(self):
        if self.tile_store is not None and hasattr(self.tile_store, "close"):
            self.tile_store.close()
        if self._is_temp_file and self._hdf5_file_path in _TEMP_FILES:
            try:
                os.unlink(self._hdf5_file_path)
            except OSError:
                pass
            _TEMP_FILES.discard(self._hdf5_file_path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ==================================================================
    # Observability (SURVEY §5.1: per-stage timing + profiler traces)
    # ==================================================================
    def _timed(self, stage: str, fn):
        """Wrap a stage call with accumulated wall timing; verbose mode
        prints per call, and `stage_timings` aggregates for reporting."""
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        agg = self.stage_timings.setdefault(stage, [0, 0.0])
        agg[0] += 1
        agg[1] += dt
        if self.log_mode == "verbose":
            print(f"[{stage}] {dt * 1000:.1f} ms")
        return out

    def timing_summary(self) -> dict:
        return {k: {"calls": v[0], "total_s": round(v[1], 4),
                    "mean_ms": round(v[1] / max(v[0], 1) * 1000, 2)}
                for k, v in self.stage_timings.items()}

    @contextlib.contextmanager
    def profile(self, log_dir: str):
        """Capture a jax.profiler trace of everything inside the block
        (view with TensorBoard / xprof)."""
        jax.profiler.start_trace(log_dir)
        try:
            yield self
        finally:
            jax.profiler.stop_trace()

    def rebuild(self):
        if self.tile_store is None:
            return
        if self.caching_strategy == "direct":
            self.tile_store = MemoryTileStore(cache_size_bytes=self.cache_limit)
        else:
            self.tile_store.close()
            os.unlink(self._hdf5_file_path)
            store = HDF5TileStore(self._hdf5_file_path, mode="a",
                                  compression=self._compression,
                                  compression_opts=self._compression_opts)
            store.set_params({"seed": self.seed, "kwargs": self.kwargs})
            self.tile_store = store
        self._init_conditioning()
        self._build_hierarchy()

    def change_seed(self, seed: int | None = None) -> bool:
        new_seed = (int(seed) & 0xFFFFFFFFFFFFFFFF) if seed is not None else next_seed(None)
        if new_seed == self.seed:
            return False
        self.seed = new_seed
        self.rebuild()
        return True

    def set_cond_snr(self, cond_snr) -> None:
        if len(cond_snr) != 5:
            raise ValueError("cond_snr must contain exactly 5 values.")
        self.kwargs["cond_snr"] = [float(x) for x in cond_snr]
        self.rebuild()

    # ==================================================================
    # Custom conditioning imports (tiff-export path)
    # ==================================================================
    def _has_custom_conditioning_imports(self) -> bool:
        return bool(self.custom_conditioning_imports)

    def set_custom_conditioning_import(self, channel: int, values: np.ndarray,
                                       origin_i: int, origin_j: int,
                                       default_value: float | None = None) -> None:
        values = np.asarray(values, dtype=np.float32)
        if values.ndim != 2:
            raise ValueError("Custom conditioning import must be a 2-D array.")
        channel = int(channel)
        self.custom_conditioning_imports[channel] = values.copy()
        self.custom_conditioning_import_origins[channel] = (int(origin_i), int(origin_j))
        if default_value is None:
            self.custom_conditioning_default_values.pop(channel, None)
        else:
            self.custom_conditioning_default_values[channel] = float(default_value)
        self.rebuild()

    def _sample_custom_conditioning_channel(self, channel, ci0, ci1, cj0, cj1):
        import_values = self.custom_conditioning_imports.get(channel)
        default_value = self.custom_conditioning_default_values.get(channel)
        if import_values is None and default_value is None:
            return None, None
        h, w = ci1 - ci0, cj1 - cj0
        if default_value is None:
            values = np.zeros((h, w), dtype=np.float32)
            mask = np.zeros((h, w), dtype=bool)
        else:
            values = np.full((h, w), float(default_value), dtype=np.float32)
            mask = np.ones((h, w), dtype=bool)
        if import_values is not None:
            src_i0, src_j0 = self.custom_conditioning_import_origins[channel]
            src_i1 = src_i0 + import_values.shape[0]
            src_j1 = src_j0 + import_values.shape[1]
            oi0, oi1 = max(ci0, src_i0), min(ci1, src_i1)
            oj0, oj1 = max(cj0, src_j0), min(cj1, src_j1)
            if oi0 < oi1 and oj0 < oj1:
                values[oi0 - ci0:oi1 - ci0, oj0 - cj0:oj1 - cj0] = import_values[
                    oi0 - src_i0:oi1 - src_i0, oj0 - src_j0:oj1 - src_j0]
                mask[oi0 - ci0:oi1 - ci0, oj0 - cj0:oj1 - cj0] = True
        if not mask.any():
            return None, None
        return values, mask

    def _conditioning_model_input(self, ci0, ci1, cj0, cj1) -> np.ndarray:
        """(5, H, W) float32 conditioning for the coarse U-Net
        (`world_pipeline.py:873-903`)."""
        if not self._has_custom_conditioning_imports():
            return self.synthetic_map_factory(ci0, cj0, ci1, cj1)
        raw = np.asarray(self.synthetic_map_factory.sample_raw(ci0, cj0, ci1, cj1),
                         dtype=np.float32)
        for channel in range(raw.shape[0]):
            values, mask = self._sample_custom_conditioning_channel(
                channel, ci0, ci1, cj0, cj1)
            if values is not None:
                raw[channel][mask] = values[mask]
        raw[0] = np.sign(raw[0]) * np.sqrt(np.abs(raw[0]))
        return raw

    # ==================================================================
    # Mesh sharding helpers (tile-parallel serving)
    # ==================================================================
    def _ndev(self) -> int:
        return int(np.prod(self.mesh.devices.shape)) if self.mesh is not None else 1

    def _mesh_buckets(self, buckets) -> tuple:
        """Scale batch buckets to multiples of the mesh device count."""
        n = self._ndev()
        if n == 1:
            return tuple(buckets)
        return tuple(sorted({max(b, 1) * n for b in buckets}))

    def _shard_batch(self, arr):
        """Shard a stacked batch over the mesh's 'data' axis (leading dim)."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P("data")))

    def _replicated(self, params):
        if self.mesh is None:
            return params
        key = id(params)
        if key not in self._compiled.setdefault("_replicated", {}):
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._compiled["_replicated"][key] = jax.device_put(
                params, NamedSharding(self.mesh, P()))
        return self._compiled["_replicated"][key]

    # ==================================================================
    # Noise
    # ==================================================================
    def _noise_in_program(self, seed: int, y0, x0, h, w, channels, tile):
        """Noise patch inside a jitted program (threefry) with traced y0/x0."""
        return threefry_noise_patch(seed=seed, y0=y0, x0=x0, h=h, w=w,
                                    channels=channels, tile_h=tile, tile_w=tile)

    def _noise_host(self, seed, y0, x0, h, w, channels, tile):
        if self.noise_mode == "portable":
            return gaussian_noise_patch(seed, y0, x0, h, w, channels, tile, tile)
        return np.asarray(self._noise_in_program(seed, y0, x0, h, w, channels, tile))

    # ==================================================================
    # Coarse stage
    # ==================================================================
    @property
    def _defer_host(self) -> bool:
        """Defer host downloads of stage outputs (device stays canonical
        until a host read).  Only with the in-memory store — the HDF5 store
        must see every tile eagerly to persist it."""
        return self.caching_strategy == "direct"

    def _build_coarse_stage(self):
        TILE, STRIDE = 64, 48
        pool = self.kwargs["coarse_pooling"]
        assert TILE % pool == 0 and STRIDE % pool == 0
        cfg = EDMSchedulerConfig(sigma_min=0.002, sigma_max=80, sigma_data=0.5)
        sigmas0 = float(compute_sigmas(cfg, 20)[0])
        means = np.asarray(self.kwargs["coarse_means"], np.float32)
        stds = np.asarray(self.kwargs["coarse_stds"], np.float32)
        cond_means = means[[0, 2, 3, 4, 5]]
        cond_stds = stds[[0, 2, 3, 4, 5]]
        t_cond = np.arctan(np.asarray(self.kwargs["cond_snr"], np.float32))
        cond_scalar_vals = np.log(np.tan(t_cond) / 8.0)
        wwin = jnp.asarray(linear_weight_window(TILE // pool))
        model, params = self.coarse_model, self.coarse_params
        dt = self._dtype
        threefry = self.noise_mode == "threefry"
        pool_modes = (self.kwargs["elev_coarse_pool_mode"],
                      self.kwargs["p5_coarse_pool_mode"])

        def core(ii, jj, cond_map, cond_noise_in, sample_noise_in,
                 seed_cond, seed_samp, mparams):
            # cond_map: (B, 5, 64, 64) normalized; noise inputs used when
            # not threefry; seed_cond/seed_samp: (2,) uint32 traced seeds.
            # Traceable stage core shared by the standalone program and the
            # fused (compute + atlas-scatter) program.
            def one(i1, j1, cond, cnoise_in, snoise_in):
                if threefry:
                    cond_noise = self._noise_in_program(seed_cond, i1, j1, TILE, TILE, 5, TILE)
                    sample_noise = self._noise_in_program(seed_samp, i1, j1, TILE, TILE, 6, TILE)
                else:
                    cond_noise, sample_noise = cnoise_in, snoise_in
                tc = jnp.asarray(t_cond).reshape(-1, 1, 1)
                cond_img = jnp.cos(tc) * cond + jnp.sin(tc) * cond_noise  # (5,64,64)
                x = sample_noise * sigmas0  # (6,64,64)

                cond_scalars = [jnp.asarray([v], dtype=dt) for v in cond_scalar_vals]

                def model_fn(scaled, sigma):
                    cnoise = trigflow_precondition_noise(sigma, cfg.sigma_data)
                    x_in = jnp.concatenate([scaled, cond_img], axis=0)  # (11,64,64)
                    x_in = jnp.transpose(x_in, (1, 2, 0))[None].astype(dt)  # NHWC
                    out = model.apply(mparams, x_in, jnp.full((1,), cnoise, dtype=dt),
                                      cond_scalars, compute_dtype=dt)
                    return jnp.transpose(out[0], (2, 0, 1)).astype(jnp.float32)

                from terrain_diffusion_tpu.scheduler import sample_dpm

                sample = sample_dpm(model_fn, x, cfg, 20)
                sample = sample / cfg.sigma_data
                sample = sample * jnp.asarray(stds).reshape(-1, 1, 1) + \
                    jnp.asarray(means).reshape(-1, 1, 1)
                sample = sample.at[1].set(sample[0] - sample[1])
                if pool > 1:
                    ch0 = {"max": max_pool, "min": min_pool}.get(pool_modes[0], avg_pool)(
                        sample[0:1], pool)
                    ch1 = {"max": max_pool, "min": min_pool}.get(pool_modes[1], avg_pool)(
                        sample[1:2], pool)
                    rest = avg_pool(sample[2:], pool)
                    sample = jnp.concatenate([ch0, ch1, rest], axis=0)
                return jnp.concatenate([sample * wwin[None], wwin[None]], axis=0)

            return jax.vmap(one)(ii, jj, cond_map, cond_noise_in, sample_noise_in)

        prog_key = ("coarse", tuple(self.kwargs["cond_snr"]),
                    tuple(self.kwargs["coarse_means"]),
                    tuple(self.kwargs["coarse_stds"]),
                    pool, pool_modes, dt.__name__, threefry)
        coarse_prog = self._prog(prog_key, lambda: jax.jit(core))

        def build_fused():
            @functools.partial(jax.jit, donate_argnums=(0,))
            def fused(out_atlas, out_slots, ii, jj, cond_map, cns, sns,
                      seed_cond, seed_samp, mparams):
                outs = core(ii, jj, cond_map, cns, sns, seed_cond, seed_samp,
                            mparams)
                return out_atlas.at[out_slots].set(outs)

            return fused

        coarse_fused = self._prog(prog_key + ("fused",), build_fused)

        def _prep(ctxs):
            seed = self.seed
            conds, cns, sns = [], [], []
            i1s, j1s = [], []
            for ctx in ctxs:
                _, i, j = int(ctx[0]), int(ctx[1]), int(ctx[2])
                i1 = (i * (STRIDE // pool)) * pool
                j1 = (j * (STRIDE // pool)) * pool
                i1s.append(i1)
                j1s.append(j1)
                cond = self._conditioning_model_input(i1, i1 + TILE, j1, j1 + TILE)
                cond = (cond - cond_means[:, None, None]) / cond_stds[:, None, None]
                conds.append(cond)
                if threefry:
                    # noise is generated in-program; ship 4-byte dummies
                    # instead of uploading megabytes of zeros per call
                    cns.append(np.zeros((1, 1, 1), np.float32))
                    sns.append(np.zeros((1, 1, 1), np.float32))
                else:
                    cns.append(self._noise_host(seed, i1, j1, TILE, TILE, 5, TILE))
                    sns.append(self._noise_host(seed + 1, i1, j1, TILE, TILE, 6, TILE))
            return (np.asarray(i1s), np.asarray(j1s), np.stack(conds),
                    np.stack(cns), np.stack(sns),
                    seed_to_pair(seed), seed_to_pair(seed + 1))

        def f(ctxs):
            if self.log_mode == "verbose":
                print(f"Coarse f batch {len(ctxs)} at {[tuple(c) for c in ctxs]}")
            ii, jj, conds, cns, sns, sc, ss = _prep(ctxs)
            return self._timed("coarse", lambda: coarse_prog(
                self._shard_batch(ii), self._shard_batch(jj),
                self._shard_batch(conds), self._shard_batch(cns),
                self._shard_batch(sns), sc, ss, self._replicated(params)))

        def f_fused(ctxs, out_atlas, out_slots, arg_views):
            if self.log_mode == "verbose":
                print(f"Coarse fused batch {len(ctxs)}")
            ii, jj, conds, cns, sns, sc, ss = _prep(ctxs)
            return self._timed("coarse", lambda: coarse_fused(
                out_atlas, out_slots, ii, jj, conds, cns, sns, sc, ss, params))

        coarse_buckets = self._mesh_buckets((1, 2, 4, 8, 16, 32))
        return InfiniteTensor(
            shape=(7, None, None), f=f,
            f_fused=f_fused if self.mesh is None else None,
            output_window=TensorWindow((7, TILE // pool, TILE // pool),
                                       (7, STRIDE // pool, STRIDE // pool)),
            batch_size=coarse_buckets[-1], vectorized=True,
            batch_buckets=coarse_buckets,
            tile_store=self.tile_store, tensor_id="base_coarse_map",
            device_cache_tiles=256, defer_host=self._defer_host)

    # ==================================================================
    # Latent stage
    # ==================================================================
    def _latent_core(self):
        """Traceable latent-phase core: (t_value, with_prev) are python
        closure-time switches; everything else is traced."""
        TILE, STRIDE = 64, 32
        cfg = EDMSchedulerConfig(sigma_min=0.002, sigma_max=80, sigma_data=0.5)
        sd = cfg.sigma_data
        hist_raw = np.asarray(self.kwargs["histogram_raw"], np.float32)
        model = self.base_model
        dt = self._dtype
        threefry = self.noise_mode == "threefry"

        def build_cond(coarse_region):
            """58-dim conditioning vector from a (7,4,4) coarse window
            (reference `_process_latent_conditioning`, :1018-1050).

            NaN handling replicates the reference's *actual* production
            behavior: it is called with a batch of 1, so
            ``cond_img[0:1].nan_to_num(cond_means[0])`` slices the whole
            batch (not channel 0) — every NaN in every channel is filled
            with cond_means[0] in *normalized* space, ``[1:2]`` is an empty
            no-op, and the per-tile seeded climate fill at :1039-1045 can
            never fire (no NaNs survive).  We mirror that exactly; the
            seeded-fill branch is intentionally not reproduced because it is
            unreachable in the reference pipeline.
            """
            vals = coarse_region[:-1] / coarse_region[-1:]
            cond = jnp.concatenate([vals, jnp.ones((1, 4, 4))], axis=0)  # (7,4,4)
            cond = (cond - COND_INPUT_MEAN[:, None, None]) / COND_INPUT_STD[:, None, None]
            cond = jnp.nan_to_num(cond, nan=float(COND_INPUT_MEAN[0]))
            means_crop = cond[0].reshape(-1)
            p5_crop = cond[1].reshape(-1)
            climate = cond[2:6, 1:3, 1:3].mean(axis=(1, 2))
            mask_crop = cond[6].reshape(-1)
            noise_level_norm = jnp.asarray([(0.0 - 0.5) * np.sqrt(12)], jnp.float32)
            return mp.mp_concat(
                [means_crop, p5_crop, climate, mask_crop,
                 jnp.asarray(hist_raw), noise_level_norm], axis=0)

        def core(t_value, with_prev, ctx_i, ctx_j, coarse_regions,
                 prev_regions, noise_in, seed_pair, mparams):
            """One TrigFlow consistency step on a batch of latent tiles —
            shared by the standalone programs, the fused (assembly + compute
            + scatter) programs, and the T=1 in-program chain."""
            def one(ci, cj, coarse_region, prev_region, z_in):
                if with_prev:
                    prev = prev_region[:-1] / prev_region[-1:] * sd  # (5,64,64)
                else:
                    prev = jnp.zeros((5, TILE, TILE), jnp.float32)
                cond_vec = build_cond(coarse_region)
                if threefry:
                    z = self._noise_in_program(seed_pair, ci * STRIDE,
                                               cj * STRIDE, TILE, TILE, 5, TILE)
                else:
                    z = z_in
                t = jnp.float32(t_value)
                x_t = jnp.cos(t) * prev + jnp.sin(t) * (z * sd)
                model_in = x_t / sd
                return x_t, model_in, cond_vec

            x_ts, model_ins, cond_vecs = jax.vmap(one)(
                ctx_i, ctx_j, coarse_regions, prev_regions, noise_in)
            B = model_ins.shape[0]
            x_in = jnp.transpose(model_ins, (0, 2, 3, 1)).astype(dt)  # NHWC
            t = jnp.float32(t_value)
            nl = jnp.full((B,), t, dtype=dt)
            pred = -model.apply(mparams, x_in, nl, [cond_vecs.astype(dt)],
                                compute_dtype=dt)
            pred = jnp.transpose(pred, (0, 3, 1, 2)).astype(jnp.float32)
            sample = jnp.cos(t) * x_ts - jnp.sin(t) * sd * pred
            sample = sample / sd
            wwin = jnp.asarray(linear_weight_window(TILE))
            return jnp.concatenate(
                [sample * wwin[None, None], jnp.broadcast_to(wwin, (B, 1, TILE, TILE))],
                axis=1)

        return core

    def _latent_program(self, t_value: float, seed_offset: int, with_prev: bool):
        """(f, f_fused) pair for one latent phase tensor."""
        TILE, STRIDE = 64, 32
        core = self._latent_core()
        model, params = self.base_model, self.base_params
        threefry = self.noise_mode == "threefry"
        hist_raw = tuple(np.asarray(self.kwargs["histogram_raw"], np.float32).tolist())
        dt = self._dtype
        key = ("latent", float(t_value), bool(with_prev), hist_raw,
               dt.__name__, threefry)

        prog = self._prog(key, lambda: jax.jit(functools.partial(
            core, float(t_value), bool(with_prev))))

        def build_fused():
            tv, wp = float(t_value), bool(with_prev)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fused(out_atlas, out_slots, ctx_i, ctx_j, views, noise_in,
                      seed_pair, mparams):
                from terrain_diffusion_tpu.runtime.infinite_tensor import (
                    assemble_from_atlas)

                if wp:
                    (p_atlas, p_slots, p_offs, p_valid), \
                        (c_atlas, c_slots, c_offs, c_valid) = views
                    prevs = assemble_from_atlas(p_atlas, p_slots, p_offs,
                                                p_valid, (6, TILE, TILE))
                else:
                    ((c_atlas, c_slots, c_offs, c_valid),) = views
                    prevs = jnp.zeros((ctx_i.shape[0], 6, 1, 1), jnp.float32)
                coarses = assemble_from_atlas(c_atlas, c_slots, c_offs,
                                              c_valid, (7, 4, 4))
                outs = core(tv, wp, ctx_i, ctx_j, coarses, prevs, noise_in,
                            seed_pair, mparams)
                return out_atlas.at[out_slots].set(outs)

            return fused

        fused_prog = self._prog(key + ("fused",), build_fused)

        def _noise_for(ctxs):
            seed = self.seed
            if threefry:
                return (np.zeros((len(ctxs), 1, 1, 1), np.float32),
                        seed_to_pair(seed + seed_offset))
            return (np.stack([
                self._noise_host(seed + seed_offset, int(c[1]) * STRIDE,
                                 int(c[2]) * STRIDE, TILE, TILE, 5, TILE)
                for c in ctxs]), seed_to_pair(seed + seed_offset))

        stage = "latent_step" if with_prev else "latent_init"

        def f(ctxs, *regions):
            if self.log_mode == "verbose":
                print(f"Latent f ({'step' if with_prev else 'init'}) batch {len(ctxs)}")
            if with_prev:
                prevs, coarses = regions
            else:
                (coarses,) = regions
                # prev_region is traced out when with_prev=False
                prevs = np.zeros((len(ctxs), 6, 1, 1), np.float32)
            noise, spair = _noise_for(ctxs)
            return self._timed(stage, lambda: prog(
                self._shard_batch(np.ascontiguousarray(ctxs[:, 1])),
                self._shard_batch(np.ascontiguousarray(ctxs[:, 2])),
                self._shard_batch(coarses),
                self._shard_batch(prevs),
                self._shard_batch(np.asarray(noise)),
                spair, self._replicated(params)))

        def f_fused(ctxs, out_atlas, out_slots, arg_views):
            if self.log_mode == "verbose":
                print(f"Latent fused ({'step' if with_prev else 'init'}) "
                      f"batch {len(ctxs)}")
            noise, spair = _noise_for(ctxs)
            return self._timed(stage, lambda: fused_prog(
                out_atlas, out_slots,
                np.ascontiguousarray(ctxs[:, 1]),
                np.ascontiguousarray(ctxs[:, 2]),
                arg_views, np.asarray(noise), spair, params))

        return f, (f_fused if self.mesh is None else None)

    def _build_latent_stage(self):
        TILE, STRIDE = 64, 32
        cfg = EDMSchedulerConfig(sigma_min=0.002, sigma_max=80, sigma_data=0.5)
        sigmas0 = float(compute_sigmas(cfg, 20)[0])
        t_init = float(np.arctan(sigmas0 / cfg.sigma_data))
        T_INTER = [float(np.arctan(0.35 / 0.5))]
        out_win = TensorWindow((6, TILE, TILE), (6, STRIDE, STRIDE))
        coarse_win = TensorWindow((7, 4, 4), (7, 1, 1), offset=(0, -1, -1))
        buckets = self._mesh_buckets(self._batch_sizes)

        if self.T == 1:
            # Fused single-tensor path (`world_pipeline.py:1149-1172`): init +
            # intermediate steps chained inside one window fn, so intermediate
            # latents are never blended across tiles (one fewer blend round).
            steps = [] if self.onestep_latent else T_INTER
            init_f, _ = self._latent_program(t_init, 5819, with_prev=False)
            step_fs = [self._latent_program(t, 5820 + i, with_prev=True)[0]
                       for i, t in enumerate(steps)]

            def f_t1(ctxs, coarses):
                out = init_f(ctxs, coarses)
                for sf in step_fs:
                    out = sf(ctxs, out, coarses)
                return out

            return InfiniteTensor(
                shape=(6, None, None), f=f_t1,
                f_fused=self._latent_t1_fused(t_init, steps),
                output_window=out_win,
                args=(self.coarse,), args_windows=(coarse_win,),
                batch_size=buckets[-1], vectorized=True,
                batch_buckets=buckets, tile_store=self.tile_store,
                tensor_id="latent_map_T1", device_cache_tiles=256,
                defer_host=self._defer_host)

        init_f, init_fused = self._latent_program(t_init, 5819, with_prev=False)
        tensor = InfiniteTensor(
            shape=(6, None, None), f=init_f, f_fused=init_fused,
            output_window=out_win,
            args=(self.coarse,), args_windows=(coarse_win,),
            batch_size=buckets[-1], vectorized=True,
            batch_buckets=buckets, tile_store=self.tile_store,
            tensor_id="init_latent_map", device_cache_tiles=256,
            defer_host=self._defer_host)

        if not self.onestep_latent:
            for i, t in enumerate(T_INTER):
                step_f, step_fused = self._latent_program(t, 5820 + i,
                                                          with_prev=True)
                tensor = InfiniteTensor(
                    shape=(6, None, None), f=step_f, f_fused=step_fused,
                    output_window=out_win,
                    args=(tensor, self.coarse), args_windows=(out_win, coarse_win),
                    batch_size=buckets[-1], vectorized=True,
                    batch_buckets=buckets, tile_store=self.tile_store,
                    tensor_id=f"step_latent_map_{i}", device_cache_tiles=256,
                    defer_host=self._defer_host)
        return tensor

    def _latent_t1_fused(self, t_init: float, steps):
        """Fused T=1 chain: coarse assembly + init + all intermediate steps
        + atlas scatter in ONE dispatch (intermediate latents stay in
        registers/HBM, never blended — same semantics as the unfused f_t1
        chain, one program instead of 1+len(steps))."""
        if self.mesh is not None:
            return None
        TILE, STRIDE = 64, 32
        core = self._latent_core()
        params = self.base_params
        threefry = self.noise_mode == "threefry"
        hist_raw = tuple(np.asarray(self.kwargs["histogram_raw"], np.float32).tolist())
        key = ("latent_t1_chain", float(t_init), tuple(float(t) for t in steps),
               hist_raw, self._dtype.__name__, threefry)

        def build():
            ts = [float(t_init)] + [float(t) for t in steps]

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fused(out_atlas, out_slots, ctx_i, ctx_j, views, noise_in,
                      seed_pairs, mparams):
                from terrain_diffusion_tpu.runtime.infinite_tensor import (
                    assemble_from_atlas)

                ((c_atlas, c_slots, c_offs, c_valid),) = views
                coarses = assemble_from_atlas(c_atlas, c_slots, c_offs,
                                              c_valid, (7, 4, 4))
                prevs = jnp.zeros((ctx_i.shape[0], 6, 1, 1), jnp.float32)
                out = core(ts[0], False, ctx_i, ctx_j, coarses, prevs,
                           noise_in[:, 0], seed_pairs[0], mparams)
                for si, t in enumerate(ts[1:]):
                    out = core(t, True, ctx_i, ctx_j, coarses, out,
                               noise_in[:, si + 1], seed_pairs[si + 1],
                               mparams)
                return out_atlas.at[out_slots].set(out)

            return fused

        fused_prog = self._prog(key, build)
        offsets = [5819] + [5820 + i for i in range(len(steps))]

        def f_fused(ctxs, out_atlas, out_slots, arg_views):
            if self.log_mode == "verbose":
                print(f"Latent T1 fused batch {len(ctxs)}")
            seed = self.seed
            if threefry:
                noise = np.zeros((len(ctxs), len(offsets), 1, 1, 1), np.float32)
            else:
                noise = np.stack([
                    np.stack([self._noise_host(seed + off, int(c[1]) * STRIDE,
                                               int(c[2]) * STRIDE, TILE, TILE,
                                               5, TILE) for off in offsets])
                    for c in ctxs])
            seed_pairs = np.stack([seed_to_pair(seed + off) for off in offsets])
            return self._timed("latent_t1", lambda: fused_prog(
                out_atlas, out_slots,
                np.ascontiguousarray(ctxs[:, 1]),
                np.ascontiguousarray(ctxs[:, 2]),
                arg_views, noise, seed_pairs, params))

        return f_fused

    # ==================================================================
    # Decoder stage
    # ==================================================================
    def _build_decoder_stage(self):
        TILE = self.decoder_tile_size
        STRIDE = self.decoder_tile_stride
        lc = self.latent_compression
        cfg = EDMSchedulerConfig(sigma_min=0.002, sigma_max=80, sigma_data=0.5)
        sd = cfg.sigma_data
        sigmas0 = float(compute_sigmas(cfg, 20)[0])
        t_list = [float(np.arctan(sigmas0 / sd))]
        wwin_np = linear_weight_window(TILE)
        model, params = self.decoder_model, self.decoder_params
        dt = self._dtype
        threefry = self.noise_mode == "threefry"

        def core(ctx_i, ctx_j, latents_regions, noise_in, seed_pairs, mparams):
            # seed_pairs: (len(t_list), 2) uint32 traced per-step seeds
            def one(ci, cj, latents_region, z_in):
                lat = (latents_region[:-1] / latents_region[-1:])[:4]
                up = upsample_nearest(lat, lc)  # (4, TILE, TILE)
                sample = jnp.zeros((1, TILE, TILE), jnp.float32)
                for step, t_val in enumerate(t_list):
                    if threefry:
                        z = self._noise_in_program(seed_pairs[step], ci * STRIDE,
                                                   cj * STRIDE, TILE, TILE, 1, TILE)
                    else:
                        z = z_in[step]
                    t = jnp.float32(t_val)
                    x_t = jnp.cos(t) * sample + jnp.sin(t) * (z * sd)
                    model_in = jnp.concatenate([x_t / sd, up], axis=0)  # (5,T,T)
                    x_in = jnp.transpose(model_in, (1, 2, 0))[None].astype(dt)
                    pred = -model.apply(mparams, x_in, jnp.full((1,), t, dtype=dt),
                                        [], compute_dtype=dt)
                    pred = jnp.transpose(pred[0], (2, 0, 1)).astype(jnp.float32)
                    sample = jnp.cos(t) * x_t - jnp.sin(t) * sd * pred
                sample = sample / sd
                wwin = jnp.asarray(wwin_np)
                return jnp.concatenate([sample * wwin[None], wwin[None]], axis=0)

            return jax.vmap(one)(ctx_i, ctx_j, latents_regions, noise_in)

        prog_key = ("decoder", tuple(t_list), TILE, STRIDE, lc, dt.__name__,
                    threefry)
        prog = self._prog(prog_key, lambda: jax.jit(core))

        def build_fused():
            @functools.partial(jax.jit, donate_argnums=(0,))
            def fused(out_atlas, out_slots, ctx_i, ctx_j, views, noise_in,
                      seed_pairs, mparams):
                from terrain_diffusion_tpu.runtime.infinite_tensor import (
                    assemble_from_atlas)

                ((l_atlas, l_slots, l_offs, l_valid),) = views
                regions = assemble_from_atlas(
                    l_atlas, l_slots, l_offs, l_valid,
                    (6, TILE // lc, TILE // lc))
                outs = core(ctx_i, ctx_j, regions, noise_in, seed_pairs,
                            mparams)
                return out_atlas.at[out_slots].set(outs)

            return fused

        fused_prog = self._prog(prog_key + ("fused",), build_fused)

        def _noise_for(ctxs):
            seed = self.seed
            if threefry:
                noise = np.zeros((len(ctxs), len(t_list), 1, 1, 1), np.float32)
                # Domain-separate the decoder's device streams from the
                # latent stage: the reference reuses offset 5819+i for BOTH
                # stages, and since decoder tile index hr//512 == latent
                # tile index lat//64, their streams collide — the decode
                # noise's first 20480 values equal the latent init noise
                # over the same region.  That inherited quirk is kept only
                # on the bit-portable host path below (reference
                # world_pipeline.py:1230); the threefry path draws from an
                # independent offset family.
                dec_off = 15819
            else:
                noise = np.stack([
                    np.stack([
                        self._noise_host(seed + 5819 + s, int(c[1]) * STRIDE,
                                         int(c[2]) * STRIDE, TILE, TILE, 1, TILE)
                        for s in range(len(t_list))])
                    for c in ctxs])
                dec_off = 5819  # pairs unused by the program in this mode
            seed_pairs = np.stack([seed_to_pair(seed + dec_off + s)
                                   for s in range(len(t_list))])
            return noise, seed_pairs

        def f(ctxs, latents_regions):
            if self.log_mode == "verbose":
                print(f"Residual f batch {len(ctxs)} at {[tuple(c) for c in ctxs]}")
            noise, seed_pairs = _noise_for(ctxs)
            return self._timed("decoder", lambda: prog(
                self._shard_batch(np.ascontiguousarray(ctxs[:, 1])),
                self._shard_batch(np.ascontiguousarray(ctxs[:, 2])),
                self._shard_batch(latents_regions),
                self._shard_batch(np.asarray(noise)),
                seed_pairs,
                self._replicated(params)))

        def f_fused(ctxs, out_atlas, out_slots, arg_views):
            if self.log_mode == "verbose":
                print(f"Residual fused batch {len(ctxs)}")
            noise, seed_pairs = _noise_for(ctxs)
            return self._timed("decoder", lambda: fused_prog(
                out_atlas, out_slots,
                np.ascontiguousarray(ctxs[:, 1]),
                np.ascontiguousarray(ctxs[:, 2]),
                arg_views, noise, seed_pairs, params))

        out_win = TensorWindow((2, TILE, TILE), (2, STRIDE, STRIDE))
        in_win = TensorWindow((6, TILE // lc, TILE // lc),
                              (6, STRIDE // lc, STRIDE // lc))
        # bucket 16 included deliberately: at b16 XLA's convs reach 15.63
        # ms/img vs 16.81 at b8 (util_scripts/bucket_microbench.py, v5e) and
        # steady serving rows carry 23-46 decoder windows, so the largest
        # chunks ride the cheaper program (~5% decoder-stage saving; the
        # Pallas kernel still serves b<8 via its batch-cutover eligibility)
        dec_buckets = self._mesh_buckets((1, 2, 4, 8, 16))
        return InfiniteTensor(
            shape=(2, None, None), f=f,
            f_fused=f_fused if self.mesh is None else None,
            output_window=out_win,
            args=(self.latents,), args_windows=(in_win,),
            batch_size=dec_buckets[-1], vectorized=True,
            batch_buckets=dec_buckets,
            tile_store=self.tile_store, tensor_id="init_residual_map",
            device_cache_tiles=96, defer_host=self._defer_host)

    # ==================================================================
    # Output composition
    # ==================================================================
    def _elev_core(self):
        """Jitted elevation composition; one compile per query shape (avoids
        slow per-primitive dispatch compiles)."""
        RES_MEAN = self.kwargs["residual_mean"]
        RES_STD = self.kwargs["residual_std"]

        def build():
            # oi/oj (query alignment within the padded region) are TRACED —
            # only h/w are compile-time; otherwise every new alignment costs
            # a remote XLA compile of the whole composition program
            @functools.partial(jax.jit, static_argnames=("h", "w"))
            def core(residual_init, latents_init, oi, oj, h, w):
                residual_p = (residual_init[0] / residual_init[1]) * RES_STD + RES_MEAN
                latents_norm = latents_init[:-1] / latents_init[-1:]
                lowfreq_p = latents_norm[4] * LOWFREQ_STD + LOWFREQ_MEAN
                r, l = laplacian_denoise(residual_p[None], lowfreq_p[None], sigma=5)
                elev_p = laplacian_decode(r, l)[0]
                elev_sqrt = jax.lax.dynamic_slice(elev_p, (oi, oj), (h, w))
                return signed_square(elev_sqrt)

            return core

        return self._prog(("elev_core", float(RES_MEAN), float(RES_STD)), build)

    @staticmethod
    def _elev_ranges(i1, j1, i2, j2, scale: int):
        """(residual_ranges, latents_ranges, pi1, pj1) read regions for an
        elevation query — shared by get() and the multi-query planner."""
        sigma = 5
        kernel_size = (int(sigma * 2) // 2) * 2 + 1
        pad_lr = kernel_size // 2 + 1
        pad_hr = pad_lr * scale

        pi1 = ((i1 - pad_hr) // scale) * scale
        pj1 = ((j1 - pad_hr) // scale) * scale
        # canonical region size for a given query SIZE (covers every
        # alignment): composition programs then compile once per query
        # shape instead of once per alignment-dependent padding variant
        sh = _ceil_div(i2 - i1 + 2 * pad_hr + scale - 1, scale) * scale
        sw = _ceil_div(j2 - j1 + 2 * pad_hr + scale - 1, scale) * scale
        pi2 = pi1 + sh
        pj2 = pj1 + sw
        res_ranges = [(0, 2), (pi1, pi2), (pj1, pj2)]
        lat_ranges = [(0, 6), (pi1 // scale, pi2 // scale),
                      (pj1 // scale, pj2 // scale)]
        return res_ranges, lat_ranges, pi1, pj1

    @staticmethod
    def _climate_ranges(i1, j1, i2, j2, scale: int):
        """Coarse read region for a climate query."""

        S = 32 * scale
        ci1, cj1 = i1 // S, j1 // S
        # canonical cell count for a given query size (see _elev_ranges)
        ci2 = ci1 + _ceil_div(i2 - i1 + S - 1, S)
        cj2 = cj1 + _ceil_div(j2 - j1 + S - 1, S)
        win = 15
        pad = (win - 1) // 2 + 1
        return [(0, 7), (ci1 - pad, ci2 + pad), (cj1 - pad, cj2 + pad)]

    def _compute_elev(self, i1, j1, i2, j2, scale: int):
        """Elevation in meters for [i1:i2) x [j1:j2)
        (reference `_compute_elev`, :1276-1313)."""
        res_ranges, lat_ranges, pi1, pj1 = self._elev_ranges(i1, j1, i2, j2, scale)
        residual_init = self.residual.read_device(res_ranges)
        latents_init = self.latents.read_device(lat_ranges)
        # returns a device array so climate composition can consume it
        # without a host round trip; get() materializes once at the end
        return self._elev_core()(
            residual_init, latents_init,
            jnp.int32(i1 - pi1), jnp.int32(j1 - pj1), h=i2 - i1, w=j2 - j1)

    def _compute_climate(self, i1, j1, i2, j2, elev: np.ndarray, scale: int) -> np.ndarray:
        """(5, H, W) climate [temp, t_season, precip, p_cv, beta]
        (reference `_compute_climate`, :1315-1365)."""

        S = 32 * scale
        ci1, cj1 = i1 // S, j1 // S
        ci2, cj2 = _ceil_div(i2, S), _ceil_div(j2, S)
        win = 15
        pad = (win - 1) // 2 + 1
        coarse_init = self.coarse.read_device(
            [(0, 7), (ci1 - pad, ci2 + pad), (cj1 - pad, cj2 + pad)])

        # host-side sampling grid (cheap); regression + grid-sample jitted
        ii, jj = np.meshgrid(np.arange(i1, i2), np.arange(j1, j2), indexing="ij")
        u = (ii + 0.5) / S - ci1 + 0.5
        v = (jj + 0.5) / S - cj1 + 0.5

        def build_climate_core():
            @jax.jit
            def core(coarse_init, u, v, elev):
                coarse_map = coarse_init[:-1] / coarse_init[-1:]
                coarse_elev = jnp.sign(coarse_map[0]) * jnp.square(
                    jnp.maximum(0.0, coarse_map[0]))
                temp_baseline, beta = local_baseline_temperature(
                    coarse_map[2], coarse_elev, win=win, fallback_threshold=0.02)
                central = coarse_map[:, win // 2:-(win // 2), win // 2:-(win // 2)]
                H_src = temp_baseline.shape[-2]
                W_src = temp_baseline.shape[-1]
                grid_y = (u + 0.5) * 2 / H_src - 1
                grid_x = (v + 0.5) * 2 / W_src - 1
                grid = jnp.stack([grid_x, grid_y], axis=-1)
                features = jnp.concatenate(
                    [temp_baseline[None], beta[None], central], axis=0)
                feats_up = grid_sample_bilinear(features, grid)
                temp_realistic = feats_up[0] + feats_up[1] * jnp.maximum(elev, 0.0)
                return jnp.stack([temp_realistic, feats_up[2 + 3], feats_up[2 + 4],
                                  feats_up[2 + 5], feats_up[1]])

            return core

        climate = self._prog(("climate_core", win), build_climate_core)(
            coarse_init, jnp.asarray(u, dtype=jnp.float32),
            jnp.asarray(v, dtype=jnp.float32), jnp.asarray(elev))
        return np.asarray(climate, dtype=np.float32)

    def _compose_fused_core(self, with_climate: bool, pack_wire: bool = False):
        """ONE jitted program for the whole output composition: assemble the
        residual/latents[/coarse] regions straight from the stage atlases
        (traced geometry), laplacian denoise+decode + signed square, and the
        climate regression + grid-sample — a single dispatch replacing the
        5-dispatch read_device/elev_core/climate_core chain.

        The program is vmapped over the query batch, so `get_many` composes
        a whole row of same-geometry tiles in ONE dispatch (on remote
        devices the per-dispatch round trip otherwise dominates the
        steady-state serving rate)."""
        RES_MEAN = self.kwargs["residual_mean"]
        RES_STD = self.kwargs["residual_std"]
        win = 15

        def build():
            from terrain_diffusion_tpu.runtime.infinite_tensor import (
                assemble_from_atlas)

            def compose_one(r_atlas, r_slots, r_offs, r_valid,
                            l_atlas, l_slots, l_offs, l_valid,
                            c_atlas, c_slots, c_offs, c_valid,
                            oi, oj, di, dj,
                            res_shape, lat_shape, coarse_shape, h, w, S):
                residual_init = assemble_from_atlas(
                    r_atlas, r_slots[None], r_offs[None], r_valid[None],
                    res_shape)[0]
                latents_init = assemble_from_atlas(
                    l_atlas, l_slots[None], l_offs[None], l_valid[None],
                    lat_shape)[0]
                residual_p = (residual_init[0] / residual_init[1]) * RES_STD + RES_MEAN
                latents_norm = latents_init[:-1] / latents_init[-1:]
                lowfreq_p = latents_norm[4] * LOWFREQ_STD + LOWFREQ_MEAN
                r, l = laplacian_denoise(residual_p[None], lowfreq_p[None], sigma=5)
                elev_p = laplacian_decode(r, l)[0]
                elev = signed_square(
                    jax.lax.dynamic_slice(elev_p, (oi, oj), (h, w)))
                if not with_climate:
                    return (_pack_elev_i16(elev) if pack_wire else elev), ()
                coarse_init = assemble_from_atlas(
                    c_atlas, c_slots[None], c_offs[None], c_valid[None],
                    coarse_shape)[0]
                coarse_map = coarse_init[:-1] / coarse_init[-1:]
                coarse_elev = jnp.sign(coarse_map[0]) * jnp.square(
                    jnp.maximum(0.0, coarse_map[0]))
                temp_baseline, beta = local_baseline_temperature(
                    coarse_map[2], coarse_elev, win=win, fallback_threshold=0.02)
                central = coarse_map[:, win // 2:-(win // 2), win // 2:-(win // 2)]
                H_src = temp_baseline.shape[-2]
                W_src = temp_baseline.shape[-1]
                # sampling grid built in-program from traced offsets (the
                # host used to upload two (H, W) f32 meshgrids per query).
                # di/dj = i1 - ci1*S (small ints), so the f32 math is exact
                # even at world coordinates far beyond 2^24
                ii = (di + jnp.arange(h, dtype=jnp.float32))[:, None]
                jj = (dj + jnp.arange(w, dtype=jnp.float32))[None, :]
                u = (ii + 0.5) / S + 0.5
                v = (jj + 0.5) / S + 0.5
                u = jnp.broadcast_to(u, (h, w))
                v = jnp.broadcast_to(v, (h, w))
                grid_y = (u + 0.5) * 2 / H_src - 1
                grid_x = (v + 0.5) * 2 / W_src - 1
                grid = jnp.stack([grid_x, grid_y], axis=-1)
                features = jnp.concatenate(
                    [temp_baseline[None], beta[None], central], axis=0)
                feats_up = grid_sample_bilinear(features, grid)
                temp_realistic = feats_up[0] + feats_up[1] * jnp.maximum(elev, 0.0)
                climate = jnp.stack([temp_realistic, feats_up[2 + 3],
                                     feats_up[2 + 4], feats_up[2 + 5],
                                     feats_up[1]])
                if pack_wire:
                    return _pack_elev_i16(elev), climate.astype(jnp.float16)
                return elev, climate

            @functools.partial(jax.jit, static_argnames=(
                "res_shape", "lat_shape", "coarse_shape", "h", "w", "S"))
            def compose(res_view, lat_view, coarse_view, oi, oj, di, dj,
                        *, res_shape, lat_shape, coarse_shape, h, w, S):
                # geometry arrays are (B, K); atlases are shared
                r_atlas, r_slots, r_offs, r_valid = res_view
                l_atlas, l_slots, l_offs, l_valid = lat_view
                if with_climate:
                    c_atlas, c_slots, c_offs, c_valid = coarse_view
                else:
                    c_atlas = c_slots = c_offs = c_valid = None
                fn = functools.partial(
                    compose_one, res_shape=res_shape, lat_shape=lat_shape,
                    coarse_shape=coarse_shape, h=h, w=w, S=S)
                return jax.vmap(fn, in_axes=(
                    None, 0, 0, 0, None, 0, 0, 0,
                    None, 0, 0, 0, 0, 0, 0, 0))(
                    r_atlas, r_slots, r_offs, r_valid,
                    l_atlas, l_slots, l_offs, l_valid,
                    c_atlas, c_slots, c_offs, c_valid, oi, oj, di, dj)

            return compose

        return self._prog(("compose_fused_v2", float(RES_MEAN), float(RES_STD),
                           win, with_climate, pack_wire), build)

    def _compose_query_plan(self, i1, j1, i2, j2, with_climate: bool):
        """(tensors+ranges, scalars, static shapes) for one fused compose."""
        scale = self.latent_compression
        res_ranges, lat_ranges, pi1, pj1 = self._elev_ranges(
            i1, j1, i2, j2, scale)
        S = 32 * scale
        needed = [(self.residual, res_ranges), (self.latents, lat_ranges)]
        if with_climate:
            needed.append((self.coarse,
                           self._climate_ranges(i1, j1, i2, j2, scale)))
        shapes = tuple(tuple(b - a for a, b in r) for _, r in needed)
        scalars = (i1 - pi1, j1 - pj1,
                   i1 - (i1 // S) * S, j1 - (j1 // S) * S)
        return needed, scalars, shapes, S

    def _compose_fused_batch(self, queries, with_climate: bool,
                             pack_wire: bool = False, plans=None,
                             pad_to: int | None = None):
        """One dispatch composing ALL `queries` (which must share output
        size); returns (elev (B,...), climate (B,...) | ()) device arrays
        (B = len(queries) — padding rows are sliced off), or None when
        geometries differ or a window is not device-resident (caller falls
        back to per-query composition).

        pad_to replicates the last query up to that batch size so recurring
        serving rows hit a bounded set of compiled programs (power-of-two
        buckets) instead of one program per row length."""
        from terrain_diffusion_tpu.runtime.infinite_tensor import (
            _traced_geometry)

        n_real = len(queries)
        (i1, j1, i2, j2) = queries[0]
        h, w = i2 - i1, j2 - j1
        if any((b2 - b1, c2 - c1) != (h, w)
               for (b1, c1, b2, c2) in queries):
            return None
        if plans is None:
            plans = [self._compose_query_plan(*q, with_climate)
                     for q in queries]
        needed0, _, shapes0, S = plans[0]
        if any(p[2] != shapes0 for p in plans):
            return None  # mixed alignments: different static region shapes
        if pad_to is not None and pad_to > len(plans):
            plans = list(plans) + [plans[-1]] * (pad_to - len(plans))
        views = []
        for t_i, (tensor, _) in enumerate(needed0):
            if tensor.device_cache is None:
                return None
            boxes = [tuple(p[0][t_i][1]) for p in plans]
            geo = _traced_geometry(tensor.output_window, boxes,
                                   tensor.device_cache.slot)
            if geo is None:
                return None
            slots, offs, valid, _K = geo
            views.append((tensor.device_cache._atlas, slots, offs, valid))
        if not with_climate:
            views.append(None)
        scal = np.asarray([p[1] for p in plans], np.int32)  # (B, 4)
        compose = self._compose_fused_core(with_climate, pack_wire)
        shapes = shapes0 + ((None,) if not with_climate else ())
        elev, climate = compose(
            views[0], views[1], views[2],
            scal[:, 0], scal[:, 1], scal[:, 2], scal[:, 3],
            res_shape=shapes[0], lat_shape=shapes[1], coarse_shape=shapes[2],
            h=h, w=w, S=S)
        if len(plans) != n_real:
            elev = elev[:n_real]
            climate = climate[:n_real] if with_climate else climate
        return elev, climate

    def _compose_fused(self, i1, j1, i2, j2, with_climate: bool,
                       pack_wire: bool = False):
        """(elev_dev, climate_dev | None) in one dispatch, or None when a
        needed window is not device-resident (fallback: unfused path)."""
        out = self._compose_fused_batch([(i1, j1, i2, j2)], with_climate,
                                        pack_wire)
        if out is None:
            return None
        elev, climate = out
        return elev[0], (climate[0] if with_climate else None)

    def get(self, i1, j1, i2, j2, with_climate: bool = True,
            pack_wire: bool = False) -> dict:
        """Terrain for bounding box: elev (H, W) meters [+ climate (5, H, W)].

        pack_wire=True packs the serving wire formats ON DEVICE before the
        fetch — elevation floor+clip to int16 (bit-identical to the host
        conversion the HTTP API applies), climate to float16 (<6e-4
        relative rounding) — halving the bytes pulled per query.  Returned
        dtypes become int16 / float16.
        """
        # make every needed window resident, then try the single-dispatch
        # fused composition; fall back to the staged path (host tile store,
        # partial device residency)
        self._timed("prefetch", lambda: self.prefetch(
            [(i1, j1, i2, j2)], with_climate))
        fused = self._timed("compose", lambda: self._compose_fused(
            i1, j1, i2, j2, with_climate, pack_wire))
        if fused is not None:
            elev_dev, climate_dev = fused
            out = self._timed("fetch", lambda: jax.device_get(
                (elev_dev, climate_dev) if climate_dev is not None
                else (elev_dev,)))
            elev = np.asarray(out[0])
            climate = np.asarray(out[1]) if with_climate else None
            if not pack_wire:
                elev = elev.astype(np.float32, copy=False)
                climate = (climate.astype(np.float32, copy=False)
                           if climate is not None else None)
            return {"elev": elev, "climate": climate}
        elev_dev = self._timed("compose_elev", lambda: self._compute_elev(
            i1, j1, i2, j2, scale=self.latent_compression))
        climate = (self._timed("compose_climate", lambda: self._compute_climate(
            i1, j1, i2, j2, elev_dev, scale=self.latent_compression))
                   if with_climate else None)
        elev = self._timed("fetch_elev", lambda: np.asarray(
            elev_dev, dtype=np.float32))
        if pack_wire:  # host-side fallback packing: identical results
            elev = np.clip(np.floor(elev), -32768, 32767).astype(np.int16)
            climate = (np.asarray(climate, np.float16)
                       if climate is not None else None)
        return {"elev": elev, "climate": climate}

    def warmup(self, tile: int | None = None, with_climate: bool = True) -> dict:
        """Precompile the serving-path programs for `tile`-sized queries
        (cold/adjacent batch buckets + an odd alignment) so the first client
        request doesn't pay the compile bill.  Generated tiles are real
        world data and stay cached."""
        t = int(tile or self.decoder_tile_size)
        t0 = time.perf_counter()
        self.get(0, 0, t, t, with_climate=with_climate)
        self.get(0, t, t, 2 * t, with_climate=with_climate)  # adjacent buckets
        off = t // 2 + 1
        self.get(off, 2 * t + off, off + t, 3 * t + off,
                 with_climate=with_climate)  # odd alignment
        return {"warmup_s": round(time.perf_counter() - t0, 2)}

    def prefetch(self, queries, with_climate: bool = True) -> None:
        """Plan + generate every stage window needed by ALL `queries`
        (list of (i1, j1, i2, j2) boxes) in one coalesced pass: missing
        windows across the queries merge into shared stage batches, so N
        concurrent tile requests cost the same few large dispatches as one
        (the reference serves strictly sequentially — Flask threaded=False,
        `api.py:249` — so this path has no reference counterpart to match,
        only to beat)."""
        from terrain_diffusion_tpu.runtime.infinite_tensor import (
            ensure_regions_multi)

        scale = self.latent_compression
        res_list, lat_list, coarse_list = [], [], []
        for (i1, j1, i2, j2) in queries:
            res_ranges, lat_ranges, _, _ = self._elev_ranges(i1, j1, i2, j2, scale)
            res_list.append(res_ranges)
            lat_list.append(lat_ranges)
            if with_climate:
                coarse_list.append(self._climate_ranges(i1, j1, i2, j2, scale))
        # ONE plan across all three roots: latent/coarse windows the compose
        # reads directly merge into the same stage batches as the residual
        # stage's parents (separate per-root plans left them to a late,
        # padded second pass — measured as trailing 12/9-window
        # step_latent_map dispatches per 3-row steady period)
        reqs = [(self.residual, res_list), (self.latents, lat_list)]
        if coarse_list:
            reqs.append((self.coarse, coarse_list))
        ensure_regions_multi(reqs)

    def _compose_grouped(self, queries, with_climate: bool,
                         pack_wire: bool = False):
        """Group `queries` by geometry class (output size + static region
        shapes) and compose each group in ONE vmapped dispatch.  Returns
        (pending, fallback): pending = [(query indices, (elev (B, ...),
        climate (B, ...) | ()))] with results still on device, fallback =
        indices whose windows were not device-resident (compose via the
        staged per-query path).  Groups are padded to power-of-two batch
        sizes so recurring serving rows hit a bounded program set."""
        groups: dict[tuple, list[int]] = {}
        plans = []
        for qi, q in enumerate(queries):
            plan = self._compose_query_plan(*q, with_climate)
            plans.append(plan)
            (i1, j1, i2, j2) = q
            groups.setdefault((i2 - i1, j2 - j1, plan[2], plan[3]),
                              []).append(qi)
        pending, fallback = [], []
        for idxs in groups.values():
            out = self._timed("compose", lambda idxs=idxs:
                              self._compose_fused_batch(
                                  [queries[i] for i in idxs], with_climate,
                                  pack_wire, plans=[plans[i] for i in idxs],
                                  pad_to=_next_pow2(len(idxs))))
            if out is None:  # staged fallback (partial device residency)
                fallback.extend(idxs)
                continue
            pending.append((idxs, out))
        return pending, fallback

    def get_many(self, queries, with_climate: bool = True,
                 pack_wire: bool = False) -> list:
        """Batched get(): one coalesced generation pass over all queries,
        then per-query composition (results identical to sequential get).

        Queries sharing one geometry class (output size + static region
        shapes — e.g. a whole row of grid-aligned tiles) compose in ONE
        vmapped dispatch, and all compose dispatches are issued BEFORE the
        first result is fetched, so device compute overlaps the host
        downloads (on a remote device the per-dispatch round trip otherwise
        dominates the steady-state serving rate)."""
        self._timed("prefetch", lambda: self.prefetch(queries, with_climate))
        pending, fallback = self._compose_grouped(queries, with_climate,
                                                  pack_wire)
        results = [None] * len(queries)
        for _, (elev_dev, climate_dev) in pending:
            # start all D2H copies before blocking on any
            for arr in (elev_dev, climate_dev):
                if arr is not None and hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
        for qi in fallback:
            results[qi] = self.get(*queries[qi], with_climate=with_climate,
                                   pack_wire=pack_wire)
        for idxs, (elev_dev, climate_dev) in pending:
            has_climate = with_climate and climate_dev is not None \
                and not isinstance(climate_dev, tuple)
            out = self._timed("fetch", lambda: jax.device_get(
                (elev_dev, climate_dev) if has_climate else (elev_dev,)))
            elev_b = np.asarray(out[0])
            climate_b = np.asarray(out[1]) if has_climate else None
            for b, qi in enumerate(idxs):
                elev = elev_b[b]
                climate = climate_b[b] if has_climate else None
                if not pack_wire:
                    elev = elev.astype(np.float32, copy=False)
                    climate = (climate.astype(np.float32, copy=False)
                               if climate is not None else None)
                results[qi] = {"elev": elev, "climate": climate}
        return results
