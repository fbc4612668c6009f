"""WorldPipeline end-to-end tests (tiny models, small tile geometry).

Marked slow: CPU XLA compiles dominate (~minutes); the math itself is tiny.
Run explicitly with `pytest tests/test_pipeline.py` or via `-m slow`.
"""
import numpy as np
import pytest

from terrain_diffusion_tpu.pipeline.world import WorldPipeline

from helpers import tiny_models

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def models():
    return tiny_models(decoder_tile=64)


def _make_pipe(models, seed=1234, **kw):
    kw.setdefault("latents_batch_size", [1, 2, 4])
    kw.setdefault("decoder_tile_size", 64)
    kw.setdefault("decoder_tile_stride", 48)
    return WorldPipeline(seed=seed, **kw).set_models(*models)


@pytest.fixture(scope="module")
def pipe(models):
    p = _make_pipe(models)
    p.bind()
    return p


def test_get_end_to_end(pipe):
    out = pipe.get(0, 0, 24, 24)
    assert out["elev"].shape == (24, 24)
    assert out["climate"].shape == (5, 24, 24)
    assert np.isfinite(out["elev"]).all()
    assert np.isfinite(out["climate"]).all()


def test_same_query_bit_deterministic(pipe):
    a = pipe.get(0, 0, 24, 24)
    b = pipe.get(0, 0, 24, 24)
    np.testing.assert_array_equal(a["elev"], b["elev"])
    np.testing.assert_array_equal(a["climate"], b["climate"])


def test_overlap_consistency_within_algorithmic_tolerance(pipe):
    # Different query boxes pad differently; laplacian_denoise's low-band
    # re-estimation makes overlapping queries agree only approximately
    # (same property as the reference algorithm).
    a = pipe.get(0, 0, 24, 24)
    b = pipe.get(8, 8, 32, 32)
    np.testing.assert_allclose(a["elev"][8:24, 8:24], b["elev"][:16, :16],
                               rtol=0.05, atol=10.0)


def test_cross_pipeline_determinism(models, pipe):
    ref = pipe.get(4, 4, 20, 20)
    p2 = _make_pipe(models)
    p2.bind()
    got = p2.get(4, 4, 20, 20)
    np.testing.assert_allclose(got["elev"], ref["elev"], rtol=1e-5, atol=1e-4)


def test_seed_changes_world(models, pipe):
    ref = pipe.get(4, 4, 20, 20)
    p2 = _make_pipe(models, seed=999)
    p2.bind()
    got = p2.get(4, 4, 20, 20)
    assert not np.allclose(got["elev"], ref["elev"])


def test_change_seed_rebuilds(models):
    p = _make_pipe(models)
    p.bind()
    a = p.coarse[:, 0:4, 0:4]
    assert p.change_seed(4321)
    b = p.coarse[:, 0:4, 0:4]
    assert not np.allclose(a, b)
    assert not p.change_seed(4321)  # no-op on same seed


def test_t1_and_onestep_paths(models):
    p = _make_pipe(models, T=1)
    p.bind()
    out = p.latents[:, 0:8, 0:8]
    assert np.isfinite(out).all()
    p2 = _make_pipe(models, onestep_latent=True)
    p2.bind()
    out2 = p2.latents[:, 0:8, 0:8]
    assert np.isfinite(out2).all()
    assert not np.allclose(out, out2)


def test_indirect_caching_persistence(models, tmp_path):
    path = str(tmp_path / "world.h5")
    p = _make_pipe(models, caching_strategy="indirect")
    p.bind(path)
    a = p.coarse[:, 0:4, 0:4]
    elev_a = p.get(0, 0, 48, 48)["elev"]
    # with HDF5 persistence the device atlas must NOT defer host copies —
    # every stage tile has to hit the store eagerly
    assert not p.residual.defer_host and not p.latents.defer_host
    p.close()
    # reopen: tiles served from disk, params reconciled — no model calls
    p2 = _make_pipe(models, caching_strategy="indirect")
    p2.bind(path)
    b = p2.coarse[:, 0:4, 0:4]
    np.testing.assert_array_equal(a, b)
    calls = {"n": 0}
    orig = p2.residual.f
    p2.residual.f = lambda *args: (calls.__setitem__("n", calls["n"] + 1),
                                   orig(*args))[1]
    elev_b = p2.get(0, 0, 48, 48)["elev"]
    assert calls["n"] == 0, "persisted tiles should not be recomputed"
    # stage tiles reload bit-exact (see reads above); composition itself is
    # ulp-variant between the device-assembled and host-uploaded input
    # executables (XLA specializes per input provenance), so compare to
    # float32-ulp tolerance rather than bytes
    np.testing.assert_allclose(elev_a, elev_b, rtol=1e-5, atol=1e-3)
    p2.close()


def test_save_and_from_pretrained(models, tmp_path, pipe):
    p = _make_pipe(models)
    p.save_pretrained(str(tmp_path / "pipe"))
    p2 = WorldPipeline.from_pretrained(str(tmp_path / "pipe"), seed=1234,
                                       latents_batch_size=[1, 2, 4])
    assert p2.decoder_tile_size == 64  # persisted in config
    p2.bind()
    assert p2.coarse_model.config.in_channels == 11


def test_config_roundtrip_preserves_histogram_raw(models, tmp_path):
    p = _make_pipe(models, histogram_raw=[0.5, 0, 0, 0, 0])
    p.save_pretrained(str(tmp_path / "hr"))
    p2 = WorldPipeline.from_pretrained(str(tmp_path / "hr"), seed=1234,
                                       latents_batch_size=[1, 2, 4])
    assert p2.kwargs["histogram_raw"] == [0.5, 0, 0, 0, 0]


def test_set_models_after_bind_takes_effect(models):
    """set_models() on a bound pipeline must regenerate with the NEW
    weights — the stage tensors' window fns captured the old ones at
    bind() time, so the hierarchy must be rebuilt."""
    import jax.numpy as jnp

    ref = _make_pipe(models)
    ref.bind()
    a = ref.get(0, 0, 24, 24)

    (cm, cp), (bm, bp), (dm, dp) = models
    p = _make_pipe(models)
    p.bind()  # hierarchy built against the ORIGINAL decoder weights
    p.set_models((cm, cp), (bm, bp),
                 (dm, {**dp, "out_gain": jnp.asarray(3.0)}))
    b = p.get(0, 0, 24, 24)
    assert not np.allclose(a["elev"], b["elev"])


def test_reconcile_adopts_stored_world_params(models, tmp_path):
    """Reopening an HDF5 world with different ctor params must adopt the
    STORED world parameters — including derived attributes — and a
    runtime-only log_mode change must not trigger adoption at all."""
    f = str(tmp_path / "world.h5")
    p = _make_pipe(models, caching_strategy="indirect", drop_water_pct=0.25)
    p.bind(hdf5_file=f)
    assert p.kwargs["drop_water_pct"] == 0.25
    p.tile_store.close()

    p2 = _make_pipe(models, caching_strategy="indirect", drop_water_pct=0.9,
                    log_mode="verbose")
    p2.bind(hdf5_file=f)
    assert p2.kwargs["drop_water_pct"] == 0.25  # stored wins
    assert p2.log_mode == "verbose"             # runtime knob kept
    assert p2.kwargs["log_mode"] == "verbose"
    assert p2.latent_compression == p2.kwargs["latent_compression"]
    p2.tile_store.close()

    # same params, different log_mode: nothing to adopt (no spurious diff)
    p3 = _make_pipe(models, caching_strategy="indirect", drop_water_pct=0.25,
                    log_mode="verbose")
    p3.bind(hdf5_file=f)
    assert p3.kwargs["drop_water_pct"] == 0.25
    p3.tile_store.close()


def test_change_seed_reuses_compiled_programs(models):
    """Seed is a traced input to every stage program: change_seed() must not
    retrace/recompile anything (jit cache sizes stay fixed), while results
    remain seed-deterministic (round trip reproduces bit-exactly)."""
    p = _make_pipe(models)
    p.bind()
    a = p.get(0, 0, 24, 24)
    sizes = {k: f._cache_size() for k, f in p._compiled.items()
             if hasattr(f, "_cache_size")}
    assert sizes, "expected cached stage programs"
    assert p.change_seed(777)
    b = p.get(0, 0, 24, 24)
    sizes2 = {k: f._cache_size() for k, f in p._compiled.items()
              if hasattr(f, "_cache_size")}
    assert sizes2 == sizes, "seed change retraced stage programs"
    assert not np.allclose(a["elev"], b["elev"])
    assert p.change_seed(1234)
    c = p.get(0, 0, 24, 24)
    np.testing.assert_array_equal(a["elev"], c["elev"])
    np.testing.assert_array_equal(a["climate"], c["climate"])


def test_get_many_coalesces_and_matches_sequential(models):
    """get_many(): one coalesced generation pass over N queries — identical
    results to sequential get(), strictly fewer stage dispatches."""
    queries = [(0, 0, 24, 24), (60, 0, 84, 24), (0, 60, 24, 84), (60, 60, 84, 84)]

    seq = _make_pipe(models)
    seq.bind()
    want = [seq.get(*q) for q in queries]
    seq_calls = sum(v[0] for k, v in seq.stage_timings.items()
                    if k in ("coarse", "latent_init", "latent_step", "decoder"))

    co = _make_pipe(models)
    co.bind()
    got = co.get_many(queries)
    co_calls = sum(v[0] for k, v in co.stage_timings.items()
                   if k in ("coarse", "latent_init", "latent_step", "decoder"))

    # batch composition differs (shared buckets), so executables differ at
    # the ulp level — same tolerance as cross-pipeline determinism above
    for w, g in zip(want, got):
        np.testing.assert_allclose(w["elev"], g["elev"], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(w["climate"], g["climate"], rtol=1e-5, atol=1e-4)
    assert co_calls < seq_calls, (co_calls, seq_calls)


def test_fused_stage_and_composition_path(models):
    """Default (direct-caching, single-device) serving runs the fused
    one-dispatch-per-stage programs + single-dispatch composition; results
    match the unfused staged path and stay bit-deterministic."""
    p = _make_pipe(models)
    p.bind()
    assert p.residual.f_fused is not None and p.latents.f_fused is not None
    a = p.get(0, 0, 24, 24)
    # fused composition was taken (staged timers untouched)
    assert p.stage_timings.get("compose", [0])[0] >= 1
    assert "compose_elev" not in p.stage_timings
    b = p.get(0, 0, 24, 24)
    np.testing.assert_array_equal(a["elev"], b["elev"])
    np.testing.assert_array_equal(a["climate"], b["climate"])

    # unfused staged fallback agrees within executable-level ulp tolerance
    q = _make_pipe(models)
    q.bind()
    for t in (q.coarse, q.latents, q.residual):
        t.f_fused = None
    q._compose_fused = lambda *args, **kw: None
    c = q.get(0, 0, 24, 24)
    assert "compose_elev" in q.stage_timings  # fallback ran
    np.testing.assert_allclose(a["elev"], c["elev"], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(a["climate"], c["climate"], rtol=1e-5, atol=1e-4)

    # with_climate=False fused path
    d = p.get(8, 8, 24, 24, with_climate=False)
    assert d["climate"] is None and d["elev"].shape == (16, 16)


def test_mesh_tile_parallel(models):
    """Tile batches shard across the 8-device CPU mesh; results identical to
    the single-device pipeline."""
    from terrain_diffusion_tpu.parallel import make_mesh

    ref = _make_pipe(models)
    ref.bind()
    want = ref.coarse[:, 0:8, 0:8]

    mesh = make_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8
    p = _make_pipe(models, mesh=mesh, latents_batch_size=[1, 2])
    p.bind()
    got = p.coarse[:, 0:8, 0:8]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    lat = p.latents[:, 0:8, 0:8]
    assert np.isfinite(lat).all()


def test_pack_wire_matches_host_conversion(pipe):
    """pack_wire=True must return int16 elevation bit-identical to the host
    floor/clip conversion and f16 climate within f16 rounding."""
    ref = pipe.get(7, 13, 71, 77)
    packed = pipe.get(7, 13, 71, 77, pack_wire=True)
    assert packed["elev"].dtype == np.int16
    expect = np.clip(np.floor(ref["elev"]), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(packed["elev"], expect)
    assert packed["climate"].dtype == np.float16
    np.testing.assert_allclose(
        packed["climate"].astype(np.float32), ref["climate"],
        rtol=2e-3, atol=1e-3)


def test_spatial_sharded_decode_matches_single_device(rng):
    """Row-sharding a large-map forward over the 8-device mesh (XLA SPMD
    halo exchange) must reproduce the single-device result."""
    import jax
    import jax.numpy as jnp
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
    from terrain_diffusion_tpu.parallel import make_mesh
    from terrain_diffusion_tpu.parallel.mesh import (replicate, shard_spatial,
                                                     spatial_model)

    model = EDMUnet2D(EDMUnetConfig(
        image_size=128, in_channels=3, out_channels=1, model_channels=16,
        model_channel_mults=(1, 2), layers_per_block=1, attn_resolutions=(),
        midblock_attention=False, conditional_inputs=(), fourier_scale="pos",
        disable_out_gain=True, block_kwargs={"block_impl": "pallas"}))
    p = jax.jit(model.init)(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
    nl = jnp.full((1,), 0.8, jnp.float32)
    ref = model.apply(p, x, nl, [])

    mesh = make_mesh()
    sp = spatial_model(model)  # strips block_impl for SPMD partitioning
    assert "block_impl" not in (sp.config.block_kwargs or {})
    xs = shard_spatial(mesh, x, dim=1)
    ps = replicate(mesh, p)
    out = jax.jit(lambda pp, xx, nn: sp.apply(pp, xx, nn, []))(ps, xs, nl)
    assert len(out.sharding.device_set) == len(mesh.devices.ravel())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_latency_harness_knobs(models):
    """run_latency drives TTFT/TTST with the reference harness knobs
    (grid alignment, decoder tile/stride via the pipeline ctor) and
    reports the full stats schema (`/root/reference/terrain_diffusion/
    evaluation/latency.py:19-127`)."""
    from terrain_diffusion_tpu.evaluation.latency import run_latency

    p = _make_pipe(models, decoder_tile_size=64, decoder_tile_stride=48)
    p.bind()
    for aligned in (True, False):
        out = run_latency(p, n_runs=2, tile=24, separation=240, seed=3,
                          with_climate=False, grid_aligned=aligned)
        assert out["grid_aligned"] is aligned
        for section in ("ttft", "ttst"):
            for k in ("mean", "std", "p5", "p50", "p95"):
                assert np.isfinite(out[section][k])


def test_coarse_pooling_geometry_and_pool_modes(models):
    """coarse_pooling=2 (world_pipeline.py:956,998-1016): the pooled coarse
    stage emits TILE/pool windows at STRIDE/pool, and per-channel pool
    modes route elev/p5 through max/avg/min while climate channels always
    avg-pool.  Semantics oracle: with identical seed/models, pooled values
    obey min_pool <= avg_pool <= max_pool elementwise on the moded
    channels, and the always-avg channels are identical across modes."""

    def build(mode):
        p = _make_pipe(models, coarse_pooling=2,
                       elev_coarse_pool_mode=mode, p5_coarse_pool_mode=mode)
        p.bind()
        return p

    pipes = {m: build(m) for m in ("min", "avg", "max")}

    # geometry: pooled output window/stride in pooled cells
    win = pipes["avg"].coarse.output_window
    assert tuple(win.size) == (7, 32, 32)
    assert tuple(win.stride) == (7, 24, 24)

    def norm_region(p):
        raw = np.asarray(p.coarse[:, 0:24, 0:24])
        assert raw.shape == (7, 24, 24)
        w = raw[6]
        assert (w > 0).all(), "blend weight channel must be positive"
        return raw[:6] / w

    maps = {m: norm_region(p) for m, p in pipes.items()}
    eps = 1e-5
    for ch in (0, 1):  # elev (elev_coarse_pool_mode), p5 (p5_coarse_pool_mode)
        assert (maps["min"][ch] <= maps["avg"][ch] + eps).all()
        assert (maps["avg"][ch] <= maps["max"][ch] + eps).all()
        assert float(np.max(maps["max"][ch] - maps["min"][ch])) > 1e-3, \
            f"pool mode must change channel {ch} (max==min everywhere)"
    for ch in range(2, 6):  # climate channels always avg-pool
        np.testing.assert_allclose(maps["min"][ch], maps["max"][ch],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(maps["min"][ch], maps["avg"][ch],
                                   rtol=1e-5, atol=1e-5)
