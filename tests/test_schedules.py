"""Golden-value tests for sigma schedules vs. the reference formulas
(mdt/models/edm_diffusion/gc_sampling.py:26-88), computed independently with
torch (CPU) to mirror the reference's numerics."""

import math

import numpy as np
import pytest
import torch

from mdt_policy_tpu.diffusion import schedules as S


def test_append_zero():
    out = np.asarray(S.append_zero(np.array([3.0, 2.0, 1.0])))
    assert out.shape == (4,)
    assert out[-1] == 0.0


def test_karras_matches_torch():
    n, smin, smax, rho = 10, 0.001, 80.0, 7.0
    ramp = torch.linspace(0, 1, n)
    min_inv_rho = smin ** (1 / rho)
    max_inv_rho = smax ** (1 / rho)
    ref = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    ref = torch.cat([ref, ref.new_zeros([1])]).numpy()
    ours = np.asarray(S.get_sigmas_karras(n, smin, smax, rho))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_exponential_matches_torch():
    n, smin, smax = 10, 0.001, 80.0
    ref = torch.linspace(math.log(smax), math.log(smin), n).exp()
    ref = torch.cat([ref, ref.new_zeros([1])]).numpy()
    ours = np.asarray(S.get_sigmas_exponential(n, smin, smax))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # endpoints
    assert ours[0] == pytest.approx(smax, rel=1e-5)
    assert ours[-2] == pytest.approx(smin, rel=1e-5)
    assert ours[-1] == 0.0


def test_linear():
    ours = np.asarray(S.get_sigmas_linear(5, 1.0, 9.0))
    np.testing.assert_allclose(ours[:-1], np.linspace(9.0, 1.0, 5), rtol=1e-6)


def test_cosine_beta_matches_reference_formula():
    n, s = 8, 0.008
    steps = n + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    ref = np.append(np.flip(np.clip(betas, 0, 0.999)), 0.0)
    ours = np.asarray(S.cosine_beta_schedule(n, s))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_ve_matches_torch():
    n, smin, smax = 10, 0.02, 100.0
    steps = n + 1
    t = torch.linspace(0, steps, n)
    t = (smax ** 2) * ((smin ** 2 / smax ** 2) ** (t / (n - 1)))
    ref = torch.cat([torch.sqrt(t), torch.zeros(1)]).numpy()
    ours = np.asarray(S.get_sigmas_ve(n, smin, smax))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_iddpm_matches_torch():
    n, smin, smax, M, C_1, C_2 = 10, 0.02, 100.0, 1000, 0.001, 0.008
    step_indices = torch.arange(n, dtype=torch.float64)
    u = torch.zeros(M + 1, dtype=torch.float64)
    alpha_bar = lambda j: (0.5 * np.pi * j / M / (C_2 + 1)).sin() ** 2
    for j in torch.arange(M, 0, -1):
        u[j - 1] = ((u[j] ** 2 + 1) / (alpha_bar(j - 1) / alpha_bar(j)).clip(min=C_1) - 1).sqrt()
    u_filtered = u[torch.logical_and(u >= smin, u <= smax)]
    sigmas = u_filtered[((len(u_filtered) - 1) / (n - 1) * step_indices).round().to(torch.int64)]
    ref = torch.cat([sigmas, sigmas.new_zeros([1])]).to(torch.float32).numpy()
    ours = np.asarray(S.get_iddpm_sigmas(n, smin, smax))
    np.testing.assert_allclose(ours, ref, rtol=3e-4)


def test_vp_matches_torch():
    n = 10
    beta_d, beta_min, eps_s = 19.9, 0.1, 1e-3
    t = torch.linspace(1, eps_s, n)
    ref = torch.sqrt(torch.exp(beta_d * t ** 2 / 2 + beta_min * t) - 1)
    ref = torch.cat([ref, ref.new_zeros([1])]).numpy()
    ours = np.asarray(S.get_sigmas_vp(n))
    np.testing.assert_allclose(ours, ref, rtol=5e-4)


def test_dispatch():
    for name in ["karras", "exponential", "linear", "cosine_beta", "ve", "iddpm", "vp"]:
        out = np.asarray(S.get_noise_schedule(10, name, 0.02, 80.0))
        assert out.shape == (11,)
        assert out[-1] == 0.0
        assert np.all(np.isfinite(out))
    with pytest.raises(ValueError):
        S.get_noise_schedule(10, "nope", 0.02, 80.0)
