"""Scheduler tests: scan sampler vs an independent sequential numpy oracle.

The oracle is a direct sequential implementation of the published
DPM-Solver++ multistep update equations (Lu et al. 2022, EDM formulation
with alpha_t = 1) — written from the equations, evaluated step by step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.scheduler import (
    EDMSchedulerConfig,
    compute_sigmas,
    precondition_inputs,
    precondition_outputs,
    sample_dpm,
    trigflow_precondition_noise,
)


def _oracle_sample(model, x, sigmas, cfg):
    """Sequential DPM-Solver++ (alpha=1) with the reference's order policy."""
    n = len(sigmas) - 1
    m_hist = []
    lower_order_nums = 0
    for i in range(n):
        s0, st = sigmas[i], sigmas[i + 1]
        scaled = x / np.sqrt(s0**2 + cfg.sigma_data**2)
        out = model(scaled, s0)
        c_skip = cfg.sigma_data**2 / (s0**2 + cfg.sigma_data**2)
        c_out = s0 * cfg.sigma_data / np.sqrt(s0**2 + cfg.sigma_data**2)
        m0 = c_skip * x + c_out * out
        m_hist.append(m0)
        last = i == n - 1
        second_last = i == n - 2
        use1 = (
            cfg.solver_order == 1
            or lower_order_nums < 1
            or (last and (cfg.final_sigmas_type == "zero" or (cfg.lower_order_final and n < 15)))
        )
        use2 = (cfg.solver_order == 2 or lower_order_nums < 2
                or (second_last and cfg.lower_order_final and n < 15))
        if use1:
            r = st / s0
            x = r * x - (r - 1) * m0
        elif use2:
            s1 = sigmas[i - 1]
            h = np.log(s0 / max(st, 1e-20))
            h0 = np.log(s1 / s0)
            r0 = h0 / h
            D0, D1 = m0, (m0 - m_hist[-2]) / r0
            r = st / s0
            x = r * x - (r - 1) * D0 - 0.5 * (r - 1) * D1
        else:
            s1, s2 = sigmas[i - 1], sigmas[i - 2]
            h = np.log(s0 / max(st, 1e-20))
            h0 = np.log(s1 / s0)
            h1 = np.log(s2 / s1)
            r0, r1 = h0 / h, h1 / h
            D0 = m0
            D1_0 = (m0 - m_hist[-2]) / r0
            D1_1 = (m_hist[-2] - m_hist[-3]) / r1
            D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
            D2 = (D1_0 - D1_1) / (r0 + r1)
            r = st / s0
            x = (r * x - (r - 1) * D0 + ((r - 1) / h + 1.0) * D1
                 - ((r - 1 + h) / h**2 - 0.5) * D2)
        if lower_order_nums < cfg.solver_order:
            lower_order_nums += 1
    return x


def _toy_model(scaled, sigma):
    # arbitrary smooth nonlinear "network"
    return np.tanh(scaled * 1.7) + 0.1 * np.asarray(sigma) ** 0.5


@pytest.mark.parametrize("num_steps,order", [(1, 2), (2, 2), (5, 2), (20, 2),
                                             (20, 3)])
def test_scan_matches_sequential_oracle(num_steps, order, rng):
    cfg = EDMSchedulerConfig(solver_order=order)
    sigmas = compute_sigmas(cfg, num_steps)
    x0 = rng.standard_normal((2, 8, 8)).astype(np.float32) * sigmas[0]

    want = _oracle_sample(_toy_model, x0.astype(np.float64), sigmas, cfg)

    def model_fn(scaled, sigma):
        return jnp.tanh(scaled * 1.7) + 0.1 * jnp.sqrt(sigma)

    got = np.asarray(jax.jit(
        lambda x: sample_dpm(model_fn, x, cfg, num_steps)
    )(jnp.asarray(x0)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_karras_sigmas_monotone_and_warp():
    cfg = EDMSchedulerConfig()
    s = compute_sigmas(cfg, 20)
    assert s[0] == pytest.approx(80.0)
    assert s[-1] == 0.0
    assert np.all(np.diff(s) < 0)
    cfg2 = EDMSchedulerConfig(scaling_p=2.0, scaling_t=0.05)
    s2 = compute_sigmas(cfg2, 20)
    # warp divides by a factor <= 1, so sigmas grow (except endpoints region)
    assert s2[0] >= s[0]


def test_analytic_gaussian_denoising():
    """With the optimal denoiser for N(0, sigma_data^2) data, many-step
    sampling should map noise into samples with roughly sigma_data std."""
    cfg = EDMSchedulerConfig()
    num_steps = 40
    sd = cfg.sigma_data

    def model_fn(scaled, sigma):
        # optimal epsilon-param model for x0 ~ N(0, sd^2):
        # denoised = x * sd^2/(sd^2+sigma^2)  => model_out such that
        # c_skip*x + c_out*out = that  =>  out = 0 ... derive:
        # c_skip = sd^2/(s^2+sd^2) equals the optimal coefficient, so out = 0.
        return jnp.zeros_like(scaled)

    sigmas = compute_sigmas(cfg, num_steps)
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (4096,)) * sigmas[0]
    out = sample_dpm(model_fn, x0, cfg, num_steps)
    # final denoised = E[x0|x_t] trajectory limit: distribution collapses to
    # scaled gaussian; check the map is contraction toward data scale
    assert float(jnp.std(out)) < 2 * sd


def test_preconditioning_formulas():
    s = jnp.asarray(2.0)
    sd = 0.5
    x = jnp.ones((3,))
    np.testing.assert_allclose(
        np.asarray(precondition_inputs(x, s, sd)), 1 / np.sqrt(4 + 0.25), rtol=1e-6)
    np.testing.assert_allclose(
        float(trigflow_precondition_noise(s, sd)), np.arctan(4.0), rtol=1e-6)
    out = precondition_outputs(x, x, s, sd)
    want = 0.25 / 4.25 + 2 * 0.5 / np.sqrt(4.25)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
