"""Sampler-suite tests.

1. Convergence: with a perfect denoiser for a Dirac at mu, every sampler must
   return mu at the terminal sigma=0 step.
2. Numerical parity: deterministic samplers are checked step-by-step against
   independent numpy implementations of the reference update rules
   (gc_sampling.py:164-994).
3. All samplers must compile under jit (scan-based, static shapes).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.diffusion import samplers as SM
from mdt_policy_tpu.diffusion.schedules import get_sigmas_exponential

SIGMAS = np.asarray(get_sigmas_exponential(10, 0.001, 80.0))
MU = 0.7


def dirac_denoiser(x, sigma):
    return jnp.full_like(x, MU)


def nonlinear_denoiser(x, sigma):
    # smooth, sigma-dependent test denoiser
    return jnp.tanh(x) / (1.0 + sigma)


def nonlinear_denoiser_np(x, sigma):
    return np.tanh(x) / (1.0 + sigma)


X0 = np.random.default_rng(7).normal(size=(2, 10, 7)).astype(np.float32) * 80.0


@pytest.mark.parametrize("name", SM.SAMPLER_NAMES)
def test_converges_to_dirac(name):
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(X0)
    if name == "dpm_fast":
        out = SM.sample_dpm_fast(dirac_denoiser, x, 0.001, 80.0, 10, key=key)
        # dpm_fast integrates to sigma_min (not 0); with a Dirac denoiser the
        # remaining deviation is O(sigma_min)
        np.testing.assert_allclose(np.asarray(out), MU, atol=5e-3)
        return
    out = SM.sample_loop(name, dirac_denoiser, x, SIGMAS, key=key)
    # dpm_adaptive also stops at sigma_min, leaving O(sigma_min) deviation
    atol = 5e-3 if name == "dpm_adaptive" else 1e-4
    np.testing.assert_allclose(np.asarray(out), MU, atol=atol)


def test_ddim_matches_reference_rule():
    x = X0.copy()
    for i in range(len(SIGMAS) - 1):
        sigma, sigma_next = SIGMAS[i], SIGMAS[i + 1]
        denoised = nonlinear_denoiser_np(x, sigma)
        t, t_next = -np.log(sigma), -np.log(sigma_next) if sigma_next > 0 else np.inf
        h = t_next - t
        x = (sigma_next / sigma) * x - np.expm1(-h) * denoised
    ours = np.asarray(SM.sample_ddim(nonlinear_denoiser, jnp.asarray(X0), SIGMAS))
    np.testing.assert_allclose(ours, x, rtol=2e-3, atol=2e-3)


def test_euler_matches_reference_rule():
    x = X0.copy()
    for i in range(len(SIGMAS) - 1):
        sigma, sigma_next = SIGMAS[i], SIGMAS[i + 1]
        denoised = nonlinear_denoiser_np(x, sigma)
        d = (x - denoised) / sigma
        x = x + d * (sigma_next - sigma)
    ours = np.asarray(SM.sample_euler(nonlinear_denoiser, jnp.asarray(X0), SIGMAS))
    np.testing.assert_allclose(ours, x, rtol=2e-3, atol=2e-3)


def test_heun_matches_reference_rule():
    x = X0.copy()
    for i in range(len(SIGMAS) - 1):
        sigma, sigma_next = SIGMAS[i], SIGMAS[i + 1]
        denoised = nonlinear_denoiser_np(x, sigma)
        d = (x - denoised) / sigma
        dt = sigma_next - sigma
        if sigma_next == 0:
            x = x + d * dt
        else:
            x_2 = x + d * dt
            denoised_2 = nonlinear_denoiser_np(x_2, sigma_next)
            d_2 = (x_2 - denoised_2) / sigma_next
            x = x + (d + d_2) / 2 * dt
    ours = np.asarray(SM.sample_heun(nonlinear_denoiser, jnp.asarray(X0), SIGMAS))
    np.testing.assert_allclose(ours, x, rtol=2e-3, atol=2e-3)


def test_dpm2_matches_reference_rule():
    x = X0.copy()
    for i in range(len(SIGMAS) - 1):
        sigma, sigma_next = SIGMAS[i], SIGMAS[i + 1]
        denoised = nonlinear_denoiser_np(x, sigma)
        d = (x - denoised) / sigma
        if sigma_next == 0:
            x = x + d * (sigma_next - sigma)
        else:
            sigma_mid = math.exp((math.log(sigma) + math.log(sigma_next)) / 2)
            dt_1 = sigma_mid - sigma
            dt_2 = sigma_next - sigma
            x_2 = x + d * dt_1
            denoised_2 = nonlinear_denoiser_np(x_2, sigma_mid)
            d_2 = (x_2 - denoised_2) / sigma_mid
            x = x + d_2 * dt_2
    ours = np.asarray(SM.sample_dpm_2(nonlinear_denoiser, jnp.asarray(X0), SIGMAS))
    np.testing.assert_allclose(ours, x, rtol=2e-3, atol=2e-3)


def test_dpmpp_2m_matches_reference_rule():
    x = X0.copy()
    old_denoised = None
    for i in range(len(SIGMAS) - 1):
        sigma, sigma_next = SIGMAS[i], SIGMAS[i + 1]
        denoised = nonlinear_denoiser_np(x, sigma)
        t = -np.log(sigma)
        t_next = -np.log(sigma_next) if sigma_next > 0 else np.inf
        h = t_next - t
        if old_denoised is None or sigma_next == 0:
            x = (sigma_next / sigma) * x - np.expm1(-h) * denoised
        else:
            h_last = t - (-np.log(SIGMAS[i - 1]))
            r = h_last / h
            denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x = (sigma_next / sigma) * x - np.expm1(-h) * denoised_d
        old_denoised = denoised
    ours = np.asarray(SM.sample_dpmpp_2m(nonlinear_denoiser, jnp.asarray(X0), SIGMAS))
    np.testing.assert_allclose(ours, x, rtol=2e-3, atol=2e-3)


def test_dpmpp_2s_matches_reference_rule():
    x = X0.copy()
    for i in range(len(SIGMAS) - 1):
        sigma, sigma_next = SIGMAS[i], SIGMAS[i + 1]
        denoised = nonlinear_denoiser_np(x, sigma)
        if sigma_next == 0:
            d = (x - denoised) / sigma
            x = x + d * (sigma_next - sigma)
        else:
            t, t_next = -np.log(sigma), -np.log(sigma_next)
            r = 0.5
            h = t_next - t
            s_mid = t + r * h
            sig_mid = np.exp(-s_mid)
            x_2 = (sig_mid / sigma) * x - np.expm1(-h * r) * denoised
            denoised_2 = nonlinear_denoiser_np(x_2, sig_mid)
            x = (sigma_next / sigma) * x - np.expm1(-h) * denoised_2
    ours = np.asarray(SM.sample_dpmpp_2s(nonlinear_denoiser, jnp.asarray(X0), SIGMAS))
    np.testing.assert_allclose(ours, x, rtol=2e-3, atol=2e-3)


def test_lms_matches_reference_rule():
    from scipy import integrate

    def lms_coeff(order, t, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(order):
                if j == k:
                    continue
                prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
            return prod
        return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]

    order = 4
    x = X0.copy().astype(np.float64)
    s64 = SIGMAS.astype(np.float64)
    ds = []
    for i in range(len(SIGMAS) - 1):
        denoised = nonlinear_denoiser_np(x, s64[i])
        d = (x - denoised) / s64[i]
        ds.append(d)
        if len(ds) > order:
            ds.pop(0)
        cur_order = min(i + 1, order)
        coeffs = [lms_coeff(cur_order, s64, i, j) for j in range(cur_order)]
        x = x + sum(c * dd for c, dd in zip(coeffs, reversed(ds)))
    ours = np.asarray(SM.sample_lms(nonlinear_denoiser, jnp.asarray(X0), SIGMAS))
    np.testing.assert_allclose(ours, x, rtol=5e-4, atol=1e-4)


def test_samplers_jit_compile():
    @jax.jit
    def run(x):
        return SM.sample_ddim(nonlinear_denoiser, x, SIGMAS)

    out = run(jnp.asarray(X0))
    assert out.shape == X0.shape
    # second call hits the cache and must give identical results
    out2 = run(jnp.asarray(X0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_stochastic_samplers_deterministic_given_key():
    key = jax.random.PRNGKey(42)
    for name in ["euler_ancestral", "ancestral", "dpmpp_2s_ancestral", "dpmpp_2m_sde"]:
        a = np.asarray(SM.sample_loop(name, nonlinear_denoiser, jnp.asarray(X0), SIGMAS, key=key))
        b = np.asarray(SM.sample_loop(name, nonlinear_denoiser, jnp.asarray(X0), SIGMAS, key=key))
        np.testing.assert_array_equal(a, b)
        assert np.all(np.isfinite(a))


def test_sampler_vocabulary_covers_reference_dispatch():
    """sample_loop dispatches every name the reference's sample_loop accepts
    (mdt/models/mdtv_agent.py:611-658), including dpm_adaptive."""
    reference_names = {
        "lms", "heun", "euler", "ancestral", "euler_ancestral", "dpm",
        "dpm_adaptive", "dpm_fast", "dpmpp_2s_ancestral", "dpmpp_2m",
        "dpmpp_2m_sde", "ddim", "dpmpp_2s", "dpmpp_2_with_lms",
    }
    assert set(SM.SAMPLER_NAMES) == reference_names

    with pytest.raises(ValueError, match="Unknown sampler"):
        SM.sample_loop("not_a_sampler", dirac_denoiser, jnp.asarray(X0), SIGMAS)


def test_dpmpp_sde_noise_correlation_matches_brownian_tree():
    """The two per-step noise draws must have the BrownianTree joint law
    (ref gc_sampling.py:139-160 + :781,790): unit marginals with
    corr = sqrt((sigma - sig_mid)/(sigma - sigma_next)). The draws are
    recovered algebraically from two sampler runs sharing one key: a ZERO
    denoiser exposes n2, an IDENTITY denoiser exposes a*n1 + b*n2."""
    sigma, sigma_next = 1.0, 0.25
    t, t_next = -np.log(sigma), -np.log(sigma_next)
    sig_mid = float(np.exp(-(t + (t_next - t) * 0.5)))
    rho_expected = np.sqrt((sigma - sig_mid) / (sigma - sigma_next))

    sd1, su1 = (float(v) for v in SM._ancestral_step(
        jnp.asarray(sigma), jnp.asarray(sig_mid), 1.0))
    sd2, su2 = (float(v) for v in SM._ancestral_step(
        jnp.asarray(sigma), jnp.asarray(sigma_next), 1.0))
    t_next_ = -np.log(sd2)
    a = -np.expm1(-t_next_) * su1   # coefficient of n1 in the identity run
    b = su2                          # coefficient of n2

    sigmas = np.asarray([sigma, sigma_next], np.float32)  # single SDE step
    zero = lambda x, s: jnp.zeros_like(x)
    ident = lambda x, s: x
    # one batched call: the per-step noise draw is i.i.d. across the batch
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((4000, 1, 1))
    out0 = np.asarray(SM.sample_dpmpp_sde(zero, x0, sigmas, key=key)).ravel()
    out1 = np.asarray(SM.sample_dpmpp_sde(ident, x0, sigmas, key=key)).ravel()
    n2s = out0 / b
    n1s = (out1 - b * n2s) / a
    n1s, n2s = np.asarray(n1s), np.asarray(n2s)
    assert abs(n1s.std() - 1.0) < 0.12 and abs(n2s.std() - 1.0) < 0.12
    corr = np.corrcoef(n1s, n2s)[0, 1]
    assert abs(corr - rho_expected) < 0.08, (corr, rho_expected)
