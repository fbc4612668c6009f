"""Cross-implementation parity vs the actual reference code (/root/reference).

These tests import the reference's own torch modules (through the stub
harness in ``tests/reference_oracle``) and assert the BASELINE.md contract:
bit-equal portable RNG streams and <1e-3 relative RMSE for every numerical
building block (laplacian codec, DPM-Solver trajectories, model forwards
with weights round-tripped through ``nn.torch_compat``).

Unlike tests/test_golden.py (which freezes this repo's own numerics), a
failure here means we built the *wrong function*.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")  # pytest rootdir; reference_oracle lives here
from reference_oracle import import_reference  # noqa: E402

torch = pytest.importorskip("torch")


def rel_rmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-12))


# ---------------------------------------------------------------------------
# Portable RNG: bit-equal streams
# ---------------------------------------------------------------------------

class TestPortableRNG:
    def test_pcg64_next_bit_equal(self):
        ref = import_reference("inference.portable_rng")
        from terrain_diffusion_tpu.ops import rng_portable as mine

        state = 0xDEADBEEF12345678
        for _ in range(200):
            (rs, rout) = ref._pcg64_next(state)
            (ms, mout) = mine.pcg64_next(state)
            assert (rs, rout) == (ms, mout)
            state = rs

    def test_next_seed_bit_equal(self):
        ref = import_reference("inference.portable_rng")
        from terrain_diffusion_tpu.ops import rng_portable as mine

        for seed in [1, 42, 2**31, 2**63 - 1, 0xFFFFFFFFFFFFFFFF]:
            assert ref.next_seed(seed) == mine.next_seed(seed)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_standard_normal_bit_equal(self, dtype):
        ref = import_reference("inference.portable_rng")
        from terrain_diffusion_tpu.ops import rng_portable as mine

        for seed in [7, 123456789, 2**63 + 5]:
            r = ref.standard_normal(seed, 4096, dtype=dtype)
            m = mine.standard_normal(seed, 4096, dtype=dtype)
            if dtype is np.float32:
                # production dtype: bit-equal
                np.testing.assert_array_equal(m, r)
            else:
                # float64 is libm-bound: Marsaglia's sqrt(-2 ln s / s) inherits
                # the log implementation's final ulp (numpy SIMD vs glibc vs
                # numba LLVM each differ); the reference's own "identical in
                # C++/Java" holds only to the same tolerance.
                np.testing.assert_array_max_ulp(m, r, maxulp=2)

    def test_tile_seed_bit_equal(self):
        wp = import_reference("inference.world_pipeline")
        from terrain_diffusion_tpu.ops.rng_portable import tile_seed

        for base, ty, tx in [(5819, 0, 0), (42, -3, 7), (2**62, 1000, -1000),
                             (0xABCDEF, -1, -1)]:
            assert wp._tile_seed(base, ty, tx) == tile_seed(base, ty, tx)

    def test_gaussian_noise_patch_bit_equal(self):
        wp = import_reference("inference.world_pipeline")
        from terrain_diffusion_tpu.ops.noise_field import gaussian_noise_patch

        # spans tile borders and negative coordinates
        r = wp.gaussian_noise_patch(99, -20, -7, 48, 40, channels=3,
                                    tile_h=32, tile_w=32)
        m = gaussian_noise_patch(99, -20, -7, 48, 40, channels=3,
                                 tile_h=32, tile_w=32)
        np.testing.assert_array_equal(m, r)


# ---------------------------------------------------------------------------
# Laplacian codec
# ---------------------------------------------------------------------------

class TestLaplacianParity:
    @pytest.fixture()
    def ref(self):
        return import_reference("data.laplacian_encoder")

    @pytest.mark.parametrize("extrapolate", [False, True])
    def test_encode(self, ref, rng, extrapolate):
        from terrain_diffusion_tpu.ops.laplacian import laplacian_encode

        x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32).cumsum(-1)
        r_res, r_low = ref.laplacian_encode(torch.from_numpy(x), (8, 8), 2.0,
                                            extrapolate=extrapolate)
        m_res, m_low = laplacian_encode(x, (8, 8), 2.0, extrapolate=extrapolate)
        assert rel_rmse(m_low, r_low.numpy()) < 1e-3
        # residual of a smooth signal is near zero -> compare vs signal scale
        assert (np.sqrt(np.mean((np.asarray(m_res) - r_res.numpy()) ** 2))
                / np.sqrt(np.mean(x**2))) < 1e-3

    @pytest.mark.parametrize("extrapolate,pre_padded",
                             [(False, False), (True, False), (True, True)])
    def test_decode(self, ref, rng, extrapolate, pre_padded):
        from terrain_diffusion_tpu.ops.laplacian import laplacian_decode

        res = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
        low_size = 10 if pre_padded else 8  # one halo sample per side
        low = rng.standard_normal((1, 1, low_size, low_size)).astype(np.float32)
        r = ref.laplacian_decode(torch.from_numpy(res), torch.from_numpy(low),
                                 extrapolate=extrapolate, pre_padded=pre_padded)
        m = laplacian_decode(res, low, extrapolate=extrapolate,
                             pre_padded=pre_padded)
        assert rel_rmse(m, r.numpy()) < 1e-3

    def test_denoise(self, ref, rng):
        from terrain_diffusion_tpu.ops.laplacian import laplacian_denoise

        res = (0.01 * rng.standard_normal((1, 1, 64, 64))).astype(np.float32)
        low = rng.standard_normal((1, 1, 8, 8)).astype(np.float32)
        r_res, r_low = ref.laplacian_denoise(torch.from_numpy(res),
                                             torch.from_numpy(low), 2.0)
        m_res, m_low = laplacian_denoise(res, low, 2.0)
        np.testing.assert_array_equal(np.asarray(m_res), r_res.numpy())
        assert rel_rmse(m_low, r_low.numpy()) < 1e-3


# ---------------------------------------------------------------------------
# Latent conditioning vector (incl. the reference's NaN-fill quirk)
# ---------------------------------------------------------------------------

class TestLatentConditioningParity:
    def test_process_latent_conditioning(self, rng):
        """The pipeline builds conditioning per tile (batch of 1); the
        reference's `cond_img[0:1].nan_to_num(cond_means[0])` therefore
        fills EVERY channel's NaNs with cond_means[0] in normalized space.
        Assert our builder reproduces that, NaNs included."""
        import types

        wp = import_reference("inference.world_pipeline")
        from terrain_diffusion_tpu.evaluation.samplers import process_cond_img

        cond_means = np.array([14.99, 11.65, 15.87, 619.26, 833.12, 69.40, 0.66],
                              np.float32)
        cond_stds = np.array([21.72, 21.78, 10.40, 452.29, 738.09, 34.59, 0.47],
                             np.float32)
        hist = np.array([0.1, -0.3, 0.2, 0.05, -0.1], np.float32)

        cond = rng.standard_normal((7, 4, 4)).astype(np.float32) * 20
        cond[0, 0, 1] = np.nan          # elevation NaN
        cond[3, 1, 1] = np.nan          # climate NaN inside the 2x2 crop
        cond[4, :, :] = np.nan          # whole climate channel NaN

        dummy = types.SimpleNamespace(seed=0)
        ref_vec = wp.WorldPipeline._process_latent_conditioning(
            dummy, torch.from_numpy(cond)[None],
            torch.from_numpy(hist)[None],
            torch.from_numpy(cond_means), torch.from_numpy(cond_stds),
            torch.tensor(0.0), seed_offset=12345).numpy()

        my_vec = np.asarray(process_cond_img(
            cond[None], hist, cond_means, cond_stds, noise_level=0.0))
        assert not np.isnan(my_vec).any()
        assert rel_rmse(my_vec, ref_vec) < 1e-3, rel_rmse(my_vec, ref_vec)


# ---------------------------------------------------------------------------
# DPM-Solver trajectories
# ---------------------------------------------------------------------------

def _analytic_model_torch(scaled, sigma):
    return 0.3 * torch.tanh(scaled) - 0.2 * scaled + 0.1 * torch.sin(sigma)


def _analytic_model_jax(scaled, sigma):
    import jax.numpy as jnp

    return 0.3 * jnp.tanh(scaled) - 0.2 * scaled + 0.1 * jnp.sin(sigma)


def _run_reference_trajectory(sch_kwargs, num_steps, x0, sde_seed=None):
    mod = import_reference("scheduler.dpmsolver")
    sch = mod.EDMDPMSolverMultistepScheduler(**sch_kwargs)
    sch.set_timesteps(num_steps)
    x = torch.from_numpy(x0) * sch.sigmas[0]
    gen = torch.Generator().manual_seed(sde_seed) if sde_seed is not None else None
    for t, sigma in zip(sch.timesteps, sch.sigmas):
        scaled = sch.precondition_inputs(x, sigma)
        out = _analytic_model_torch(scaled, sigma)
        x = sch.step(out, t, x, generator=gen).prev_sample
    return x.numpy(), sch


def _run_my_trajectory(sch_kwargs, num_steps, x0, sde_noise=None):
    import jax
    import jax.numpy as jnp

    from terrain_diffusion_tpu.scheduler import dpmsolver as mine

    cfg = mine.EDMSchedulerConfig(**sch_kwargs)
    sigmas = mine.compute_sigmas(cfg, num_steps)
    x_init = jnp.asarray(x0) * jnp.float32(sigmas[0])

    def run(x_init, sde_noise):
        return mine.sample_dpm(_analytic_model_jax, x_init, cfg, num_steps,
                               sde_noise=sde_noise)

    return np.asarray(jax.jit(run)(x_init, sde_noise))


SCHED_CASES = [
    dict(solver_order=2, prediction_type="v_prediction"),
    dict(solver_order=2, prediction_type="epsilon"),
    dict(solver_order=1, prediction_type="v_prediction"),
    dict(solver_order=3, prediction_type="v_prediction"),
    dict(solver_order=2, prediction_type="v_prediction",
         scaling_p=2.0, scaling_t=0.05),
    dict(solver_order=2, prediction_type="v_prediction",
         final_sigmas_type="sigma_min"),
    dict(solver_order=2, prediction_type="v_prediction", solver_type="heun"),
]


class TestSchedulerParity:
    def test_sigma_schedule(self):
        mod = import_reference("scheduler.dpmsolver")
        from terrain_diffusion_tpu.scheduler import dpmsolver as mine

        for kw in [{}, dict(scaling_p=2.0, scaling_t=0.1),
                   dict(sigma_schedule="exponential"),
                   dict(final_sigmas_type="sigma_min")]:
            sch = mod.EDMDPMSolverMultistepScheduler(**kw)
            sch.set_timesteps(20)
            m = mine.compute_sigmas(mine.EDMSchedulerConfig(**kw), 20)
            r = sch.sigmas.numpy()
            if kw.get("scaling_p") is not None:
                # the warp is ill-conditioned at sigma_max: sqrt(1 - u**p)
                # with u = 1 - O(f32 eps) amplifies rounding ~1000x, so the
                # first sigma legitimately differs between any two float32
                # implementations (torch vs numpy pow). scaling_p is unused
                # by every reference config; assert the conditioned part
                # tightly and the ill-conditioned head loosely.
                np.testing.assert_allclose(m[1:], r[1:], rtol=1e-5, atol=1e-7)
                np.testing.assert_allclose(m[0], r[0], rtol=5e-3)
            else:
                np.testing.assert_allclose(m, r, rtol=1e-5, atol=1e-7)

    @pytest.mark.parametrize("kw", SCHED_CASES)
    @pytest.mark.parametrize("num_steps", [8, 20])
    def test_trajectory(self, rng, kw, num_steps):
        x0 = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
        ref_x, _ = _run_reference_trajectory(kw, num_steps, x0)
        my_x = _run_my_trajectory(kw, num_steps, x0)
        assert rel_rmse(my_x, ref_x) < 1e-3, rel_rmse(my_x, ref_x)

    @pytest.mark.parametrize("num_steps", [8, 20])
    def test_sde_trajectory(self, rng, num_steps):
        kw = dict(solver_order=2, prediction_type="v_prediction",
                  algorithm_type="sde-dpmsolver++")
        x0 = rng.standard_normal((1, 2, 16, 16)).astype(np.float32)
        ref_x, _ = _run_reference_trajectory(kw, num_steps, x0, sde_seed=1234)
        gen = torch.Generator().manual_seed(1234)
        noises = np.stack([
            torch.randn(x0.shape, generator=gen).numpy()
            for _ in range(num_steps)
        ])
        my_x = _run_my_trajectory(kw, num_steps, x0, sde_noise=noises)
        assert rel_rmse(my_x, ref_x) < 1e-3, rel_rmse(my_x, ref_x)


# ---------------------------------------------------------------------------
# Model forwards (weights round-tripped through torch_compat)
# ---------------------------------------------------------------------------

def _randomize_parameters(model, seed=7):
    """Give every parameter a random value — fresh reference models have
    zero-init gains (out_gain, emb_gain) that silently zero entire branches,
    which would make a forward comparison vacuous."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.5)
    # Trained checkpoints carry normalized MP weights (training forwards
    # force-normalize in place). MPEmbedding's eval path looks up the RAW
    # weight (reference mp_layers.py:233-244), so unnormalized random
    # embeddings would diverge from our always-normalizing lookup.
    for module in model.modules():
        if module is not model and hasattr(module, "norm_weights"):
            module.norm_weights()


def _torch_state_to_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


UNET_CASES = [
    dict(fourier_scale="pos",
         conditional_inputs=[("tensor", 8, 0.9), ("float", 16, 0.5)]),
    dict(fourier_scale=1,
         conditional_inputs=[("embedding", 10, 1.0)]),
]


class TestUnetForwardParity:
    @pytest.mark.parametrize("case", UNET_CASES)
    def test_forward(self, rng, case):
        ref_mod = import_reference("models.edm_unet")
        from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
        from terrain_diffusion_tpu.nn.torch_compat import params_from_torch_state

        kw = dict(image_size=32, in_channels=5, out_channels=4,
                  model_channels=16, model_channel_mults=[1, 2],
                  layers_per_block=2, attn_resolutions=[16],
                  midblock_attention=True, concat_balance=0.5,
                  logvar_channels=32,
                  block_kwargs={"channels_per_head": 16}, **case)
        torch.manual_seed(0)
        ref = ref_mod.EDMUnet2D(**kw)
        ref.eval()
        _randomize_parameters(ref)
        assert float(ref.out_gain.abs()) > 1e-3  # non-vacuous forward

        jcfg = dict(kw)
        jcfg["model_channel_mults"] = tuple(kw["model_channel_mults"])
        jcfg["attn_resolutions"] = tuple(kw["attn_resolutions"])
        jcfg["conditional_inputs"] = tuple(tuple(c) for c in kw["conditional_inputs"])
        model = EDMUnet2D(EDMUnetConfig(**jcfg))
        params = params_from_torch_state(model, _torch_state_to_numpy(ref))

        x = rng.standard_normal((2, 5, 32, 32)).astype(np.float32)
        nl = np.array([0.4, 1.1], np.float32)
        conds_t, conds_j = [], []
        for typ, dim, _w in kw["conditional_inputs"]:
            if typ == "tensor":
                c = rng.standard_normal((2, dim)).astype(np.float32)
                conds_t.append(torch.from_numpy(c)); conds_j.append(c)
            elif typ == "float":
                c = rng.uniform(0, 1, (2,)).astype(np.float32)
                conds_t.append(torch.from_numpy(c)); conds_j.append(c)
            else:
                c = rng.integers(0, dim, (2,))
                conds_t.append(torch.from_numpy(c)); conds_j.append(c)

        with torch.no_grad():
            r_out, r_logvar = ref(torch.from_numpy(x), torch.from_numpy(nl),
                                  conds_t, return_logvar=True)

        m_out, m_logvar = model.apply(
            params, np.transpose(x, (0, 2, 3, 1)), nl, conds_j,
            return_logvar=True)
        m_out = np.transpose(np.asarray(m_out), (0, 3, 1, 2))
        assert rel_rmse(m_out, r_out.numpy()) < 1e-3, rel_rmse(m_out, r_out.numpy())
        assert rel_rmse(np.asarray(m_logvar).reshape(-1),
                        r_logvar.numpy().reshape(-1)) < 1e-3

    def test_roundtrip_state(self, rng):
        """params -> torch state -> params is the identity."""
        ref_mod = import_reference("models.edm_unet")
        from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
        from terrain_diffusion_tpu.nn.torch_compat import (
            params_from_torch_state, params_to_torch_state)

        kw = UNET_CASES[0]
        model = EDMUnet2D(EDMUnetConfig(
            image_size=32, in_channels=5, model_channels=16,
            model_channel_mults=(1, 2), layers_per_block=1,
            attn_resolutions=(16,), fourier_scale="pos",
            conditional_inputs=tuple(tuple(c) for c in kw["conditional_inputs"])))
        import jax
        params = jax.jit(model.init)(jax.random.key(0))
        state = params_to_torch_state(model, params)
        params2 = params_from_torch_state(model, state)
        flat1 = jax.tree_util.tree_leaves(params)
        flat2 = jax.tree_util.tree_leaves(params2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAutoencoderForwardParity:
    def test_preencode_decode(self, rng):
        ref_mod = import_reference("models.edm_autoencoder")
        from terrain_diffusion_tpu.nn import EDMAutoencoder, EDMAutoencoderConfig
        from terrain_diffusion_tpu.nn.torch_compat import params_from_torch_state

        kw = dict(image_size=32, in_channels=3, out_channels=3,
                  model_channels=16, model_channel_mults=[1, 2],
                  layers_per_block=1, latent_channels=4, direct_skips=[0],
                  attn_resolutions=[16], midblock_attention=True,
                  block_kwargs={"channels_per_head": 16})
        torch.manual_seed(0)
        ref = ref_mod.EDMAutoencoder(**kw)
        ref.eval()
        _randomize_parameters(ref)

        jcfg = dict(kw)
        jcfg["model_channel_mults"] = (1, 2)
        jcfg["direct_skips"] = (0,)
        model = EDMAutoencoder(EDMAutoencoderConfig(**jcfg))
        params = params_from_torch_state(model, _torch_state_to_numpy(ref))

        x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            r_means, r_logvars = ref.preencode(torch.from_numpy(x))
            z = ref.postencode(r_means, r_logvars, use_mode=True)
            r_dec, r_lv = ref.decode(z, include_logvar=True)

        m_means, m_logvars = model.preencode(params, np.transpose(x, (0, 2, 3, 1)))
        assert rel_rmse(np.transpose(np.asarray(m_means), (0, 3, 1, 2)),
                        r_means.numpy()) < 1e-3
        assert rel_rmse(np.transpose(np.asarray(m_logvars), (0, 3, 1, 2)),
                        r_logvars.numpy()) < 1e-3
        mz = model.postencode(m_means, m_logvars, use_mode=True)
        m_dec, m_lv = model.decode(params, mz, include_logvar=True)
        assert rel_rmse(np.transpose(np.asarray(m_dec), (0, 3, 1, 2)),
                        r_dec.numpy()) < 1e-3
        np.testing.assert_allclose(np.asarray(m_lv).reshape(-1),
                                   r_lv.detach().numpy().reshape(-1), atol=1e-6)


# ---------------------------------------------------------------------------
# End-to-end WorldPipeline.get() parity (the reference's own pipeline code
# running on the faithful infinite_tensor stand-in, vs pipeline/world.py)
# ---------------------------------------------------------------------------

@pytest.mark.slow
class TestEndToEndPipelineParity:
    """Runs the reference `WorldPipeline` (world_pipeline.py:1276-1384) and
    ours on the SAME tiny weights, same seed, same synthetic-map stats, and
    asserts <1e-3 relative RMSE on composed elevation AND climate.

    This closes the composition-level correctness gap on top of the
    building-block parity above: stage chaining, window offsets, weight
    blending, seed plumbing, laplacian composition and climate regression
    all execute end-to-end in both implementations.
    """

    PIPE_KW = dict(latents_batch_size=[1, 2, 4],
                   decoder_tile_size=64, decoder_tile_stride=48)
    SEED = 1234

    def _write_stats_json(self, tmp_path):
        """Shared stats cache in the reference JSON format
        (`synthetic_map.py:134-180`), read from CWD by BOTH factories."""
        import json as _json

        from terrain_diffusion_tpu.data.default_stats import default_stats
        from terrain_diffusion_tpu.pipeline import synthetic_map as sm

        freq_mult = [1.5, 3, 3, 3, 3]  # pipeline ctor default
        stats = default_stats(0.5)
        noise_tables, data_tables = [], []
        for i, (fb, octv, lac, gain) in enumerate(sm._MAP_CONFIGS):
            nq = sm._noise_quantiles(fb * freq_mult[i], octv, lac, gain)
            noise_tables.append(np.asarray(nq, np.float64).tolist())
            data_tables.append(np.asarray(
                stats[f"base_image_quantiles_{i}"], np.float64).tolist())
        payload = {
            "n_quantiles": len(noise_tables[0]),
            "noise_quantile_tables": noise_tables,
            "data_quantile_tables": data_tables,
            "a_temp_std": float(stats["a_temp_std"]),
            "b_temp_std": float(stats["b_temp_std"]),
            "temp_std_p1": float(stats["temp_std_p1"]),
            "temp_std_p99": float(stats["temp_std_p99"]),
        }
        d = tmp_path / "data" / "global"
        d.mkdir(parents=True, exist_ok=True)
        (d / "synthetic_map_stats.json").write_text(_json.dumps(payload))

    def _paired_models(self):
        """(ref torch model, (our model, converted params)) per stage."""
        ref_mod = import_reference("models.edm_unet")
        from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig
        from terrain_diffusion_tpu.nn.torch_compat import params_from_torch_state

        cases = {
            "coarse": dict(image_size=16, in_channels=11, out_channels=6,
                           model_channels=8, model_channel_mults=[1],
                           layers_per_block=1, attn_resolutions=[],
                           midblock_attention=False, concat_balance=0.5,
                           conditional_inputs=[("float", 8, 0.2)] * 5,
                           fourier_scale="pos", noise_emb_dims=8,
                           logvar_channels=8),
            "base": dict(image_size=64, in_channels=5, out_channels=5,
                         model_channels=8, model_channel_mults=[1, 2],
                         layers_per_block=1, attn_resolutions=[],
                         midblock_attention=False, concat_balance=0.5,
                         conditional_inputs=[("tensor", 58, 1.0)],
                         fourier_scale="pos", noise_emb_dims=8,
                         logvar_channels=8),
            "decoder": dict(image_size=64, in_channels=5, out_channels=1,
                            model_channels=8, model_channel_mults=[1, 2],
                            layers_per_block=1, attn_resolutions=[],
                            midblock_attention=False, concat_balance=0.5,
                            conditional_inputs=[], fourier_scale="pos",
                            noise_emb_dims=8, logvar_channels=8),
        }
        out = {}
        for si, (name, kw) in enumerate(cases.items()):
            torch.manual_seed(si)
            ref = ref_mod.EDMUnet2D(**kw)
            ref.eval()
            _randomize_parameters(ref, seed=11 + si)
            jcfg = dict(kw)
            jcfg["model_channel_mults"] = tuple(kw["model_channel_mults"])
            jcfg["attn_resolutions"] = tuple(kw["attn_resolutions"])
            jcfg["conditional_inputs"] = tuple(
                tuple(c) for c in kw["conditional_inputs"])
            model = EDMUnet2D(EDMUnetConfig(**jcfg))
            params = params_from_torch_state(model, _torch_state_to_numpy(ref))
            out[name] = (ref, (model, params))
        return out

    def _make_pipes(self, tmp_path, monkeypatch, extra=None):
        """Reference + our pipeline on identical weights/seed/stats, with
        `extra` ctor kwargs applied to BOTH (the configuration axis under
        test)."""
        wp = import_reference("inference.world_pipeline")
        from terrain_diffusion_tpu.pipeline.world import WorldPipeline

        self._write_stats_json(tmp_path)
        monkeypatch.chdir(tmp_path)
        pairs = self._paired_models()
        kw = {**self.PIPE_KW, **(extra or {})}

        ref_pipe = wp.WorldPipeline(seed=self.SEED, **kw)
        ref_pipe.coarse_model = pairs["coarse"][0]
        ref_pipe.base_model = pairs["base"][0]
        ref_pipe.decoder_model = pairs["decoder"][0]
        ref_pipe._apply_dtype_and_compile()
        ref_pipe.bind()

        pipe = WorldPipeline(seed=self.SEED, noise_mode="portable",
                             **kw).set_models(
            pairs["coarse"][1], pairs["base"][1], pairs["decoder"][1])
        pipe.bind()
        return ref_pipe, pipe

    def _assert_get_parity(self, ref_pipe, pipe, box=(0, 0, 24, 24)):
        """<1e-3 rel RMSE on elev AND climate for `box`; returns both outputs
        (reference's as numpy) for extra case-specific checks."""
        with torch.no_grad():
            ref_out = ref_pipe.get(*box)
        out = pipe.get(*box)

        r_elev = ref_out["elev"].numpy()
        r_clim = ref_out["climate"].numpy()
        # non-vacuous: real terrain variation, not an all-zeros degenerate
        assert float(np.std(r_elev)) > 1.0 and np.isfinite(r_elev).all()
        assert float(np.std(r_clim)) > 0.1 and np.isfinite(r_clim).all()
        assert rel_rmse(np.asarray(out["elev"]), r_elev) < 1e-3, \
            rel_rmse(np.asarray(out["elev"]), r_elev)
        assert rel_rmse(np.asarray(out["climate"]), r_clim) < 1e-3, \
            rel_rmse(np.asarray(out["climate"]), r_clim)
        return {"elev": r_elev, "climate": r_clim}, out

    def test_get_parity_vs_reference_pipeline(self, tmp_path, monkeypatch):
        ref_pipe, pipe = self._make_pipes(tmp_path, monkeypatch)
        self._assert_get_parity(ref_pipe, pipe)

    @pytest.mark.parametrize("onestep", [False, True],
                             ids=["T1_twostep", "T1_onestep"])
    def test_T1_latent_parity(self, tmp_path, monkeypatch, onestep):
        """T=1 fuses the latent phases into one tensor; onestep_latent drops
        the intermediate step entirely (world_pipeline.py:1144-1172)."""
        ref_pipe, pipe = self._make_pipes(
            tmp_path, monkeypatch, dict(T=1, onestep_latent=onestep))
        self._assert_get_parity(ref_pipe, pipe)

    def test_coarse_pooling_mixed_pool_modes_parity(self, tmp_path,
                                                    monkeypatch):
        """coarse_pooling=2 with per-channel pool modes: elev max-pooled,
        p5 min-pooled, climate avg (world_pipeline.py:998-1016) — the
        pooled coarse grid then feeds the whole downstream hierarchy."""
        ref_pipe, pipe = self._make_pipes(
            tmp_path, monkeypatch,
            dict(coarse_pooling=2, elev_coarse_pool_mode="max",
                 p5_coarse_pool_mode="min"))
        self._assert_get_parity(ref_pipe, pipe)

    def test_set_cond_snr_rebuild_parity(self, tmp_path, monkeypatch):
        """set_cond_snr rebuilds every stage (world_pipeline.py:764-777);
        regenerated terrain must still match — and must actually differ
        from the old SNR's terrain (the rebuild is not a no-op)."""
        ref_pipe, pipe = self._make_pipes(tmp_path, monkeypatch)
        ref_before, _ = self._assert_get_parity(ref_pipe, pipe)

        new_snr = [0.25, 1.5, 1.5, 1.5, 1.5]
        ref_pipe.set_cond_snr(new_snr)
        pipe.set_cond_snr(new_snr)
        ref_after, _ = self._assert_get_parity(ref_pipe, pipe)
        assert not np.allclose(ref_after["elev"], ref_before["elev"]), \
            "set_cond_snr rebuild must change the generated terrain"

    def test_custom_conditioning_import_parity(self, tmp_path, monkeypatch):
        """set_custom_conditioning_import switches conditioning to the
        raw-Perlin+import merge with sqrt applied to elevation ONLY
        (world_pipeline.py:779-819, :873-903 — the tiff-export path)."""
        ref_pipe, pipe = self._make_pipes(tmp_path, monkeypatch)
        ref_before, _ = self._assert_get_parity(ref_pipe, pipe)

        rng = np.random.default_rng(5)
        elev_raster = (rng.standard_normal((8, 8)) * 900.0 + 400.0
                       ).astype(np.float32)
        precip_raster = np.abs(rng.standard_normal((6, 6)) * 600.0 + 900.0
                               ).astype(np.float32)
        for p in (ref_pipe, pipe):
            # footprint overlaps the queried window's conditioning cells
            p.set_custom_conditioning_import(0, elev_raster, -3, -3)
            # second channel with a default fill outside its footprint
            p.set_custom_conditioning_import(3, precip_raster, 0, 0,
                                             default_value=750.0)
        ref_after, _ = self._assert_get_parity(ref_pipe, pipe)
        assert not np.allclose(ref_after["elev"], ref_before["elev"]), \
            "conditioning import must change the generated terrain"

    def test_supersampled_api_query_parity(self, tmp_path, monkeypatch):
        """scale=2 API supersampling: padded native fetch + bilinear
        upsample + offset crop (reference api.py:103-166) vs our serving
        helper, on an odd-offset box exercising the crop arithmetic."""
        ref_api = import_reference("inference.api")
        from terrain_diffusion_tpu.serving import api as our_api

        ref_pipe, pipe = self._make_pipes(tmp_path, monkeypatch)
        box = (3, 5, 35, 37)  # target (scaled) coords, odd offsets
        with torch.no_grad():
            ref_out = ref_api._get_terrain(ref_pipe, *box, scale=2)
        out = our_api.get_terrain(pipe, *box, scale=2)

        r_elev = np.asarray(ref_out["elev"])
        r_clim = np.asarray(ref_out["climate"])
        assert r_elev.shape == (32, 32) and np.isfinite(r_elev).all()
        assert float(np.std(r_elev)) > 1.0
        assert rel_rmse(np.asarray(out["elev"]), r_elev) < 1e-3, \
            rel_rmse(np.asarray(out["elev"]), r_elev)
        assert rel_rmse(np.asarray(out["climate"]), r_clim) < 1e-3, \
            rel_rmse(np.asarray(out["climate"]), r_clim)
