"""Self-contained annotated demo: infinite, seed-consistent terrain with the
InfiniteDiffusion runtime (the counterpart of the reference's
`annotated_infinite_panorama.py`, terrain-native and dependency-free).

Run:
    python examples/annotated_infinite_terrain.py

Method (the InfiniteDiffusion recipe, SURVEY §5.7):
    1. All stochastic inputs come from a deterministic tile-seeded noise
       field, so any window of the (infinite) world sees the same noise —
       generation is seed-consistent and O(1) random access.
    2. Generation runs in *phases* over overlapping windows.  Each window
       packs `values * weight` plus a weight channel; the runtime SUMS
       overlapping outputs, and consumers divide values by weight — lazy
       MultiDiffusion-style blending.
    3. Later phases read the blended output of earlier phases through
       TensorWindows, adding detail at a finer scale.
    4. Slice the final tensor anywhere; tiles are cached so adjacent queries
       only compute the new windows.

This demo uses closed-form "denoisers" (spectral shaping of the noise field)
instead of trained networks, so it runs in seconds on CPU while exercising
the exact runtime the real pipeline uses.
"""
import numpy as np

from terrain_diffusion_tpu.ops.noise_field import gaussian_noise_patch
from terrain_diffusion_tpu.ops.windows import linear_weight_window, normalize_weighted
from terrain_diffusion_tpu.runtime import InfiniteTensor, MemoryTileStore, TensorWindow

SEED = 1234
TILE = 64            # window size of both phases
STRIDE = 32          # overlap stride (50% overlap)
SMOOTH = 9           # low-pass half-width of the coarse phase


def smooth(field: np.ndarray, k: int) -> np.ndarray:
    """Box-blur (separable) — stand-in for a denoising network."""
    pad = np.pad(field, ((0, 0), (k, k), (k, k)), mode="reflect")
    ker = np.ones(2 * k + 1) / (2 * k + 1)
    pad = np.apply_along_axis(lambda r: np.convolve(r, ker, "valid"), 1, pad)
    pad = np.apply_along_axis(lambda r: np.convolve(r, ker, "valid"), 2, pad)
    return pad


def main():
    store = MemoryTileStore()
    weight = linear_weight_window(TILE)

    # ---- Phase 1: coarse landmass --------------------------------------
    # Each window samples its own patch of the deterministic noise field at
    # its world position and low-passes it.  Because the noise is
    # position-keyed, overlapping windows agree where they overlap.
    def coarse_f(ctx):
        _, i, j = ctx
        y0, x0 = i * STRIDE, j * STRIDE
        noise = gaussian_noise_patch(SEED, y0, x0, TILE + 2 * SMOOTH,
                                     TILE + 2 * SMOOTH, channels=1)
        base = smooth(noise, SMOOTH)[:, SMOOTH:-SMOOTH, SMOOTH:-SMOOTH] * 12.0
        return np.concatenate([base * weight[None], weight[None]], axis=0)

    coarse = InfiniteTensor(
        shape=(2, None, None), f=coarse_f,
        output_window=TensorWindow((2, TILE, TILE), (2, STRIDE, STRIDE)),
        tile_store=store, tensor_id="coarse")

    # ---- Phase 2: detail refinement ------------------------------------
    # Reads the *blended* coarse output (weight-normalized) and adds
    # medium-frequency detail from a second noise stream, amplified on
    # "land" (positive heights) — conditioning of a later phase on an
    # earlier one, exactly like latent -> decoder in the real pipeline.
    def detail_f(ctx, coarse_region):
        _, i, j = ctx
        y0, x0 = i * STRIDE, j * STRIDE
        base = normalize_weighted(coarse_region)
        detail = gaussian_noise_patch(SEED + 1, y0, x0, TILE, TILE, channels=1)
        detail = smooth(np.pad(detail, ((0, 0), (2, 2), (2, 2)), "reflect"), 2)
        detail = detail[:, 2:-2, 2:-2]
        land_gain = np.clip(base, 0, None) * 0.8 + 0.1
        out = base + detail * land_gain
        return np.concatenate([out * weight[None], weight[None]], axis=0)

    terrain = InfiniteTensor(
        shape=(2, None, None), f=detail_f,
        output_window=TensorWindow((2, TILE, TILE), (2, STRIDE, STRIDE)),
        args=(coarse,),
        args_windows=(TensorWindow((2, TILE, TILE), (2, STRIDE, STRIDE)),),
        tile_store=store, tensor_id="terrain")

    # ---- Query the infinite world --------------------------------------
    # Any region works, including negative coordinates.  Determinism check:
    # re-reading a sub-region (even from a fresh pipeline) is bit-identical.
    region = normalize_weighted(terrain[:, -64:192, -64:448])[0]
    print(f"generated {region.shape} region; height range "
          f"[{region.min():.2f}, {region.max():.2f}]")

    sub = normalize_weighted(terrain[:, 0:64, 0:64])[0]
    assert np.array_equal(region[64:128, 64:128], sub), "seed consistency violated"
    print("seed-consistency check passed (overlapping queries bit-identical)")

    try:
        from PIL import Image

        from terrain_diffusion_tpu.serving.relief_map import get_relief_map

        rgb = get_relief_map(region * 400.0, None, None, None)
        out = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(out).save("infinite_terrain.png")
        print("saved infinite_terrain.png")
    except Exception as e:  # rendering is optional
        print(f"(skipped PNG render: {e})")


if __name__ == "__main__":
    main()
