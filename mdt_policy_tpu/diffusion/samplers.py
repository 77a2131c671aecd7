"""k-diffusion sampler suite as `lax.scan` programs.

Re-implements the reference sampler family
(`mdt/models/edm_diffusion/gc_sampling.py:164-994`) TPU-first:

* Every fixed-grid sampler is a single `lax.scan` over the sigma schedule —
  one compiled program, no Python loop, no per-step dispatch.
* The denoiser is an abstract `denoise_fn(x, sigma) -> denoised` closure. The
  caller closes over state/goal conditioning and (unlike the reference, which
  recomputes the encoder context inside every sampler call —
  mdtv_transformer.py:209-210) hoists the encoder context OUT of the scan.
* Sigma schedules are **host-side numpy arrays** (static). This lets the LMS
  sampler precompute its scipy quadrature coefficients at trace time and lets
  XLA constant-fold all per-step scalars.
* Stochastic samplers take an explicit `key`. For `dpmpp_sde` the reference
  uses a torchsde BrownianTree; over the disjoint consecutive intervals a
  fixed-grid sampler visits, the tree's increments are independent N(0,1)
  draws, so fresh Gaussians per step are distributionally equivalent.

Terminal-step semantics: schedules end with sigma=0. Branches the reference
guards with `if sigmas[i+1] == 0` become `jnp.where` selects; the denoiser is
protected against sigma=0 by clamping inside the sigma embedding (see
models/mdtv_transformer.py), so the discarded branch never produces NaNs that
could leak through `where` gradients (samplers are inference-only).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .precond import append_dims

__all__ = [
    "sample_ddim",
    "sample_euler",
    "sample_euler_ancestral",
    "sample_heun",
    "sample_dpm_2",
    "sample_dpm_2_ancestral",
    "sample_dpmpp_2m",
    "sample_dpmpp_2s",
    "sample_dpmpp_2s_ancestral",
    "sample_dpmpp_sde",
    "sample_lms",
    "sample_dpm_fast",
    "sample_loop",
    "SAMPLER_NAMES",
]

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def _to_d(x: jax.Array, sigma: jax.Array, denoised: jax.Array) -> jax.Array:
    """Karras ODE derivative (reference: gc_sampling.py:91-93)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def _ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    """(sigma_down, sigma_up) for an ancestral step (reference: gc_sampling.py:102-109)."""
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2)
                       / jnp.maximum(sigma_from ** 2, 1e-20)),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to ** 2 - sigma_up ** 2, 0.0))
    return sigma_down, sigma_up


def _static_sigmas(sigmas) -> np.ndarray:
    s = np.asarray(sigmas, dtype=np.float32)
    if s.ndim != 1 or s.shape[0] < 2:
        raise ValueError("sigmas must be a 1-D schedule with >= 2 entries")
    return s


def _split_keys(key: Optional[jax.Array], n: int) -> jax.Array:
    if key is None:
        key = jax.random.PRNGKey(0)
    return jax.random.split(key, n)


def _gammas(sigmas: np.ndarray, s_churn: float, s_tmin: float, s_tmax: float) -> np.ndarray:
    """Per-step churn factor, computed statically (reference: gc_sampling.py:195)."""
    n = len(sigmas) - 1
    gamma = min(s_churn / n, 2 ** 0.5 - 1) if s_churn else 0.0
    return np.where((sigmas[:-1] >= s_tmin) & (sigmas[:-1] <= s_tmax), gamma, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# First-order / exponential-integrator samplers
# ---------------------------------------------------------------------------

def sample_ddim(denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None, eta: float = 1.0) -> jax.Array:
    """DDIM / DPM-Solver-1 — the production default sampler
    (reference: gc_sampling.py:922-951).

    x_{i+1} = (sigma_{i+1}/sigma_i) * x - expm1(-(t_{i+1}-t_i)) * denoised,
    with t = -log(sigma). At the terminal sigma=0 step the ratio is 0 and
    expm1(-inf) = -1, so x -> denoised exactly (IEEE inf arithmetic, no NaNs).
    """
    s = _static_sigmas(sigmas)

    def step(x, pair):
        sigma, sigma_next = pair
        denoised = denoise_fn(x, sigma)
        t, t_next = -jnp.log(sigma), -jnp.log(sigma_next)
        h = t_next - t
        x = (sigma_next / sigma) * x - jnp.expm1(-h) * denoised
        return x, None

    pairs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]))
    # production schedules are short (10 steps): full unroll removes the
    # while-loop bookkeeping + per-iteration dynamic-slices and lets XLA
    # schedule across iterations — the closed-loop replan's latency path.
    # Long schedules keep the rolled loop (compile-size guard).
    x, _ = jax.lax.scan(step, x, pairs, unroll=len(s) <= 16)
    return x


def sample_euler(
    denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None,
    s_churn: float = 0.0, s_tmin: float = 0.0, s_tmax: float = float("inf"), s_noise: float = 1.0,
) -> jax.Array:
    """Karras Algorithm 2, Euler variant (reference: gc_sampling.py:164-210)."""
    s = _static_sigmas(sigmas)
    gammas = _gammas(s, s_churn, s_tmin, s_tmax)
    keys = _split_keys(key, len(s) - 1)

    def step(x, xs):
        sigma, sigma_next, gamma, k = xs
        sigma_hat = sigma * (gamma + 1)
        eps = jax.random.normal(k, x.shape, x.dtype) * s_noise
        x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0))
        denoised = denoise_fn(x, sigma_hat)
        d = _to_d(x, sigma_hat, denoised)
        x = x + d * (sigma_next - sigma_hat)
        return x, None

    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]), jnp.asarray(gammas), keys)
    x, _ = jax.lax.scan(step, x, xs)
    return x


def sample_euler_ancestral(
    denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None, eta: float = 1.0
) -> jax.Array:
    """Ancestral Euler (reference: gc_sampling.py:213-253)."""
    s = _static_sigmas(sigmas)
    keys = _split_keys(key, len(s) - 1)

    def step(x, xs):
        sigma, sigma_next, k = xs
        denoised = denoise_fn(x, sigma)
        sigma_down, sigma_up = _ancestral_step(sigma, sigma_next, eta)
        d = _to_d(x, sigma, denoised)
        x = x + d * (sigma_down - sigma)
        noise = jax.random.normal(k, x.shape, x.dtype)
        x = jnp.where(sigma_down > 0, x + noise * sigma_up, x)
        return x, None

    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]), keys)
    x, _ = jax.lax.scan(step, x, xs)
    return x


# ---------------------------------------------------------------------------
# Second-order samplers
# ---------------------------------------------------------------------------

def sample_heun(
    denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None,
    s_churn: float = 0.0, s_tmin: float = 0.0, s_tmax: float = float("inf"), s_noise: float = 1.0,
) -> jax.Array:
    """Karras Algorithm 2 with 2nd-order (Heun) correction
    (reference: gc_sampling.py:256-311). Falls back to Euler on the final
    sigma=0 step via a `where` select."""
    s = _static_sigmas(sigmas)
    gammas = _gammas(s, s_churn, s_tmin, s_tmax)
    keys = _split_keys(key, len(s) - 1)

    def step(x, xs):
        sigma, sigma_next, gamma, k = xs
        sigma_hat = sigma * (gamma + 1)
        eps = jax.random.normal(k, x.shape, x.dtype) * s_noise
        x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0))
        denoised = denoise_fn(x, sigma_hat)
        d = _to_d(x, sigma_hat, denoised)
        dt = sigma_next - sigma_hat
        x_euler = x + d * dt
        # 2nd-order correction (discarded when sigma_next == 0)
        denoised_2 = denoise_fn(x_euler, jnp.maximum(sigma_next, 1e-10))
        d_2 = _to_d(x_euler, jnp.maximum(sigma_next, 1e-10), denoised_2)
        x_heun = x + (d + d_2) / 2 * dt
        return jnp.where(sigma_next == 0, x_euler, x_heun), None

    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]), jnp.asarray(gammas), keys)
    x, _ = jax.lax.scan(step, x, xs)
    return x


def sample_dpm_2(
    denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None,
    s_churn: float = 0.0, s_tmin: float = 0.0, s_tmax: float = float("inf"), s_noise: float = 1.0,
) -> jax.Array:
    """DPM-Solver-2 midpoint variant (reference: gc_sampling.py:314-372)."""
    s = _static_sigmas(sigmas)
    gammas = _gammas(s, s_churn, s_tmin, s_tmax)
    keys = _split_keys(key, len(s) - 1)

    def step(x, xs):
        sigma, sigma_next, gamma, k = xs
        sigma_hat = sigma * (gamma + 1)
        eps = jax.random.normal(k, x.shape, x.dtype) * s_noise
        x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0))
        denoised = denoise_fn(x, sigma_hat)
        d = _to_d(x, sigma_hat, denoised)
        x_euler = x + d * (sigma_next - sigma_hat)
        # midpoint in log-sigma space
        safe_next = jnp.maximum(sigma_next, 1e-10)
        sigma_mid = jnp.exp((jnp.log(sigma_hat) + jnp.log(safe_next)) / 2)
        dt_1 = sigma_mid - sigma_hat
        dt_2 = sigma_next - sigma_hat
        x_2 = x + d * dt_1
        denoised_2 = denoise_fn(x_2, sigma_mid)
        d_2 = _to_d(x_2, sigma_mid, denoised_2)
        x_mid = x + d_2 * dt_2
        return jnp.where(sigma_next == 0, x_euler, x_mid), None

    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]), jnp.asarray(gammas), keys)
    x, _ = jax.lax.scan(step, x, xs)
    return x


def sample_dpm_2_ancestral(
    denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None, eta: float = 1.0
) -> jax.Array:
    """Ancestral DPM-Solver-2 — the reference's `'ancestral'` sampler_type
    (reference: gc_sampling.py:375-410)."""
    s = _static_sigmas(sigmas)
    keys = _split_keys(key, len(s) - 1)

    def step(x, xs):
        sigma, sigma_next, k = xs
        denoised = denoise_fn(x, sigma)
        sigma_down, sigma_up = _ancestral_step(sigma, sigma_next, eta)
        d = _to_d(x, sigma, denoised)
        x_euler = x + d * (sigma_down - sigma)
        safe_down = jnp.maximum(sigma_down, 1e-10)
        sigma_mid = jnp.exp((jnp.log(sigma) + jnp.log(safe_down)) / 2)
        dt_1 = sigma_mid - sigma
        dt_2 = sigma_down - sigma
        x_2 = x + d * dt_1
        denoised_2 = denoise_fn(x_2, sigma_mid)
        d_2 = _to_d(x_2, sigma_mid, denoised_2)
        noise = jax.random.normal(k, x.shape, x.dtype)
        x_mid = x + d_2 * dt_2 + noise * sigma_up
        return jnp.where(sigma_down == 0, x_euler, x_mid), None

    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]), keys)
    x, _ = jax.lax.scan(step, x, xs)
    return x


def sample_dpmpp_2m(denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None) -> jax.Array:
    """DPM-Solver++(2M) multistep (reference: gc_sampling.py:699-733).

    Carries the previous denoised estimate through the scan; the first step
    and the terminal sigma=0 step use the single-step update.
    """
    s = _static_sigmas(sigmas)
    n = len(s) - 1
    # sigma_{i-1} stream for h_last (dummy at i=0, masked by is_first)
    sig_prev = np.concatenate([s[:1], s[:-2]]).astype(np.float32)

    def step(carry, xs):
        x, old_denoised = carry
        sigma, sigma_next, sigma_prev, is_first = xs
        denoised = denoise_fn(x, sigma)
        t, t_next = -jnp.log(sigma), -jnp.log(sigma_next)
        h = t_next - t
        single = (sigma_next / sigma) * x - jnp.expm1(-h) * denoised
        h_last = t - (-jnp.log(sigma_prev))
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        multi = (sigma_next / sigma) * x - jnp.expm1(-h) * denoised_d
        use_single = jnp.logical_or(is_first, sigma_next == 0)
        x = jnp.where(use_single, single, multi)
        return (x, denoised), None

    is_first = np.zeros(n, dtype=bool)
    is_first[0] = True
    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]), jnp.asarray(sig_prev), jnp.asarray(is_first))
    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), xs)
    return x


def sample_dpmpp_2s(denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None, eta: float = 1.0) -> jax.Array:
    """DPM-Solver++(2S) (reference: gc_sampling.py:955-994)."""
    s = _static_sigmas(sigmas)

    def step(x, xs):
        sigma, sigma_next = xs
        denoised = denoise_fn(x, sigma)
        # Euler fallback for terminal step
        d = _to_d(x, sigma, denoised)
        x_euler = x + d * (sigma_next - sigma)
        safe_next = jnp.maximum(sigma_next, 1e-10)
        t, t_next = -jnp.log(sigma), -jnp.log(safe_next)
        r = 0.5
        h = t_next - t
        s_mid = t + r * h
        sig_mid = jnp.exp(-s_mid)
        x_2 = (sig_mid / sigma) * x - jnp.expm1(-h * r) * denoised
        denoised_2 = denoise_fn(x_2, sig_mid)
        x_2s = (safe_next / sigma) * x - jnp.expm1(-h) * denoised_2
        return jnp.where(sigma_next == 0, x_euler, x_2s), None

    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]))
    x, _ = jax.lax.scan(step, x, xs)
    return x


def sample_dpmpp_2s_ancestral(
    denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None, eta: float = 1.0, s_noise: float = 1.0
) -> jax.Array:
    """Ancestral DPM-Solver++(2S) (reference: gc_sampling.py:873-919)."""
    s = _static_sigmas(sigmas)
    keys = _split_keys(key, len(s) - 1)

    def step(x, xs):
        sigma, sigma_next, k = xs
        denoised = denoise_fn(x, sigma)
        sigma_down, sigma_up = _ancestral_step(sigma, sigma_next, eta)
        d = _to_d(x, sigma, denoised)
        x_euler = x + d * (sigma_down - sigma)
        safe_down = jnp.maximum(sigma_down, 1e-10)
        t, t_next = -jnp.log(sigma), -jnp.log(safe_down)
        r = 0.5
        h = t_next - t
        s_mid = t + r * h
        sig_mid = jnp.exp(-s_mid)
        x_2 = (sig_mid / sigma) * x - jnp.expm1(-h * r) * denoised
        denoised_2 = denoise_fn(x_2, sig_mid)
        x_2s = (safe_down / sigma) * x - jnp.expm1(-h) * denoised_2
        x = jnp.where(sigma_down == 0, x_euler, x_2s)
        noise = jax.random.normal(k, x.shape, x.dtype)
        x = x + noise * s_noise * sigma_up
        return x, None

    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]), keys)
    x, _ = jax.lax.scan(step, x, xs)
    return x


def sample_dpmpp_sde(
    denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None,
    eta: float = 1.0, s_noise: float = 1.0, r: float = 0.5,
) -> jax.Array:
    """DPM-Solver++ (stochastic) (reference: gc_sampling.py:736-792).

    Noise correlation matches the reference's BrownianTreeNoiseSampler
    (gc_sampling.py:139-160, identity sigma transform): the two draws of a
    step normalize Brownian increments over [sig_mid, sigma] and
    [sigma_next, sigma] — nested intervals sharing the start, so
    corr(n1, n2) = sqrt((sigma - sig_mid) / (sigma - sigma_next)); increments
    of DIFFERENT steps live on disjoint sigma intervals and are independent.
    We draw n1 ~ N(0,1) and n2 = rho*n1 + sqrt(1-rho^2)*z, which has exactly
    that joint law (distribution-tested in tests/test_samplers.py).
    """
    s = _static_sigmas(sigmas)
    keys = _split_keys(key, 2 * (len(s) - 1)).reshape(len(s) - 1, 2, -1)

    def step(x, xs):
        sigma, sigma_next, k2 = xs
        k1, k2 = k2[0], k2[1]
        denoised = denoise_fn(x, sigma)
        # Euler fallback for terminal step
        d = _to_d(x, sigma, denoised)
        x_euler = x + d * (sigma_next - sigma)

        safe_next = jnp.maximum(sigma_next, 1e-10)
        t, t_next = -jnp.log(sigma), -jnp.log(safe_next)
        h = t_next - t
        s_mid = t + h * r
        fac = 1 / (2 * r)
        sig_mid = jnp.exp(-s_mid)

        # Brownian-bridge-consistent pair: shared interval start at sigma
        rho = jnp.sqrt(jnp.clip((sigma - sig_mid) / (sigma - safe_next), 0.0, 1.0))
        n1 = jax.random.normal(k1, x.shape, x.dtype)
        n2 = rho * n1 + jnp.sqrt(1.0 - rho * rho) * jax.random.normal(
            k2, x.shape, x.dtype)

        # Step 1
        sd, su = _ancestral_step(sigma, sig_mid, eta)
        s_ = -jnp.log(jnp.maximum(sd, 1e-10))
        x_2 = (jnp.exp(-s_) / sigma) * x - jnp.expm1(t - s_) * denoised
        x_2 = x_2 + n1 * s_noise * su
        denoised_2 = denoise_fn(x_2, sig_mid)

        # Step 2
        sd, su = _ancestral_step(sigma, safe_next, eta)
        t_next_ = -jnp.log(jnp.maximum(sd, 1e-10))
        denoised_d = (1 - fac) * denoised + fac * denoised_2
        x_sde = (jnp.exp(-t_next_) / sigma) * x - jnp.expm1(t - t_next_) * denoised_d
        x_sde = x_sde + n2 * s_noise * su
        return jnp.where(sigma_next == 0, x_euler, x_sde), None

    xs = (jnp.asarray(s[:-1]), jnp.asarray(s[1:]), keys)
    x, _ = jax.lax.scan(step, x, xs)
    return x


# ---------------------------------------------------------------------------
# Linear multistep
# ---------------------------------------------------------------------------

def _lms_coeff(order: int, t: np.ndarray, i: int, j: int) -> float:
    """Adams-Bashforth coefficient via quadrature (reference: gc_sampling.py:413-426)."""
    from scipy import integrate

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]


def sample_lms(denoise_fn: DenoiseFn, x: jax.Array, sigmas, *, key=None, order: int = 4) -> jax.Array:
    """Linear multistep sampler (reference: gc_sampling.py:429-465).

    The quadrature coefficients depend only on the (static) sigma grid, so they
    are precomputed host-side into an (n, order) matrix; the scan carries a
    fixed-size ring of the last `order` derivatives.
    """
    s = _static_sigmas(sigmas)
    n = len(s) - 1
    coeff_mat = np.zeros((n, order), dtype=np.float32)
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            coeff_mat[i, j] = _lms_coeff(cur_order, s.astype(np.float64), i, j)

    def step(carry, xs):
        x, ds = carry  # ds: (order, *x.shape), most recent first
        sigma, coeffs = xs
        denoised = denoise_fn(x, sigma)
        d = _to_d(x, sigma, denoised)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        x = x + jnp.tensordot(coeffs, ds, axes=1)
        return (x, ds), None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    xs = (jnp.asarray(s[:-1]), jnp.asarray(coeff_mat))
    (x, _), _ = jax.lax.scan(step, (x, ds0), xs)
    return x


# ---------------------------------------------------------------------------
# DPM-Solver fast (fixed NFE, orders 1/2/3)
# ---------------------------------------------------------------------------

def sample_dpm_fast(
    denoise_fn: DenoiseFn, x: jax.Array, sigma_min: float, sigma_max: float, n: int, *, key=None,
) -> jax.Array:
    """DPM-Solver-Fast with a fixed function-evaluation budget
    (reference: gc_sampling.py:524-616, 672-696, eta=0 path).

    The order sequence is static given `n`, so the step loop unrolls at trace
    time into a fixed chain of 1/2/3-order exponential-integrator steps.
    """
    if sigma_min <= 0 or sigma_max <= 0:
        raise ValueError("sigma_min and sigma_max must be > 0")
    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    m = n // 3 + 1
    ts = np.linspace(t_start, t_end, m + 1, dtype=np.float64)
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [n % 3]

    def eps_at(x, t):
        sigma = math.exp(-t)
        denoised = denoise_fn(x, jnp.float32(sigma))
        return (x - denoised) / sigma

    for i, order in enumerate(orders):
        t, t_next = float(ts[i]), float(ts[i + 1])
        h = t_next - t
        eps = eps_at(x, t)
        if order == 1:
            x = x - math.exp(-t_next) * math.expm1(h) * eps
        elif order == 2:
            r1 = 0.5
            s1 = t + r1 * h
            u1 = x - math.exp(-s1) * math.expm1(r1 * h) * eps
            eps_r1 = eps_at(u1, s1)
            x = (x - math.exp(-t_next) * math.expm1(h) * eps
                 - math.exp(-t_next) / (2 * r1) * math.expm1(h) * (eps_r1 - eps))
        else:
            r1, r2 = 1 / 3, 2 / 3
            s1, s2 = t + r1 * h, t + r2 * h
            u1 = x - math.exp(-s1) * math.expm1(r1 * h) * eps
            eps_r1 = eps_at(u1, s1)
            u2 = (x - math.exp(-s2) * math.expm1(r2 * h) * eps
                  - math.exp(-s2) * (r2 / r1) * (math.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps))
            eps_r2 = eps_at(u2, s2)
            x = (x - math.exp(-t_next) * math.expm1(h) * eps
                 - math.exp(-t_next) / r2 * (math.expm1(h) / h - 1) * (eps_r2 - eps))
    return x


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

SAMPLER_NAMES = (
    "ddim", "euler", "euler_ancestral", "heun", "dpm", "ancestral",
    "dpmpp_2m", "dpmpp_2s", "dpmpp_2s_ancestral", "dpmpp_2m_sde",
    "dpmpp_2_with_lms", "lms", "dpm_fast", "dpm_adaptive",
)


def sample_loop(
    sampler_type: str,
    denoise_fn: DenoiseFn,
    x: jax.Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
) -> jax.Array:
    """Sampler dispatch mirroring `MDTVAgent.sample_loop`
    (reference: mdt/models/mdtv_agent.py:593-658). `sampler_type` names follow
    the reference's config vocabulary."""
    s = _static_sigmas(sigmas)
    if sampler_type == "ddim":
        return sample_ddim(denoise_fn, x, s, key=key)
    if sampler_type == "euler":
        return sample_euler(denoise_fn, x, s, key=key, s_churn=s_churn, s_tmin=s_tmin)
    if sampler_type == "euler_ancestral":
        return sample_euler_ancestral(denoise_fn, x, s, key=key)
    if sampler_type == "heun":
        return sample_heun(denoise_fn, x, s, key=key, s_churn=s_churn, s_tmin=s_tmin)
    if sampler_type == "dpm":
        return sample_dpm_2(denoise_fn, x, s, key=key)
    if sampler_type == "ancestral":
        return sample_dpm_2_ancestral(denoise_fn, x, s, key=key)
    if sampler_type == "dpmpp_2m" or sampler_type == "dpmpp_2_with_lms":
        # `dpmpp_2_with_lms` in the reference has an identical body to dpmpp_2m
        # (gc_sampling.py:796-830 vs :699-733).
        return sample_dpmpp_2m(denoise_fn, x, s, key=key)
    if sampler_type == "dpmpp_2s":
        return sample_dpmpp_2s(denoise_fn, x, s, key=key)
    if sampler_type == "dpmpp_2s_ancestral":
        return sample_dpmpp_2s_ancestral(denoise_fn, x, s, key=key)
    if sampler_type == "dpmpp_2m_sde":
        return sample_dpmpp_sde(denoise_fn, x, s, key=key)
    if sampler_type == "lms":
        return sample_lms(denoise_fn, x, s, key=key)
    if sampler_type == "dpm_fast":
        return sample_dpm_fast(denoise_fn, x, float(s[-2]), float(s[0]), len(s), key=key)
    if sampler_type == "dpm_adaptive":
        # ref mdtv_agent.py:637-639: bounds from the schedule's endpoints
        return sample_dpm_adaptive(denoise_fn, x, float(s[-2]), float(s[0]), key=key)
    raise ValueError(f"Unknown sampler type: {sampler_type!r}")


# ---------------------------------------------------------------------------
# DPM-Solver adaptive (PID-controlled step size) and log-likelihood
# ---------------------------------------------------------------------------

def sample_dpm_adaptive(
    denoise_fn: DenoiseFn, x: jax.Array, sigma_min: float, sigma_max: float, *,
    key=None, order: int = 3, rtol: float = 0.05, atol: float = 0.0078,
    h_init: float = 0.05, pcoeff: float = 0.0, icoeff: float = 1.0,
    dcoeff: float = 0.0, accept_safety: float = 0.81, eta: float = 0.0,
    s_noise: float = 1.0, max_steps: int = 256,
) -> jax.Array:
    """DPM-Solver-12/23 with adaptive step size (reference:
    gc_sampling.py:618-669 + PIDStepSizeController :495-521), as a
    `lax.while_loop` — the data-dependent step count lives on-device.

    Note: the reference's `dpm_solver_adaptive` references an undefined
    `noise_sampler` before assignment (gc_sampling.py:619) and crashes when
    called; this is the corrected semantics (fresh Gaussians when eta > 0).
    """
    if order not in (2, 3):
        raise ValueError("order should be 2 or 3")
    if key is None:
        key = jax.random.PRNGKey(0)
    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    pid_order = 1.5 if eta else order
    b1 = (pcoeff + icoeff + dcoeff) / pid_order
    b2 = -(pcoeff + 2 * dcoeff) / pid_order
    b3 = dcoeff / pid_order

    def sigma_of(t):
        return jnp.exp(-t)

    def eps_at(x, t):
        sig = sigma_of(t)
        denoised = denoise_fn(x, jnp.maximum(sig, 1e-10))
        return (x - denoised) / sig

    def solver_1(x, t, t_next, eps):
        h = t_next - t
        return x - sigma_of(t_next) * jnp.expm1(h) * eps

    def solver_2(x, t, t_next, eps, r1=0.5):
        h = t_next - t
        s1 = t + r1 * h
        u1 = x - sigma_of(s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = eps_at(u1, s1)
        return (x - sigma_of(t_next) * jnp.expm1(h) * eps
                - sigma_of(t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps)), eps_r1

    def solver_3(x, t, t_next, eps):
        r1, r2 = 1 / 3, 2 / 3
        h = t_next - t
        s1, s2 = t + r1 * h, t + r2 * h
        u1 = x - sigma_of(s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = eps_at(u1, s1)
        u2 = (x - sigma_of(s2) * jnp.expm1(r2 * h) * eps
              - sigma_of(s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1)
              * (eps_r1 - eps))
        eps_r2 = eps_at(u2, s2)
        return (x - sigma_of(t_next) * jnp.expm1(h) * eps
                - sigma_of(t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps))

    def cond(carry):
        x, x_prev, s, h, errs, k, n = carry
        return jnp.logical_and(s < t_end - 1e-5, n < max_steps)

    def body(carry):
        x, x_prev, s, h, errs, k, n = carry
        k, k_noise = jax.random.split(k)
        t = jnp.minimum(t_end, s + h)
        if eta:
            sd, su = _ancestral_step(sigma_of(s), sigma_of(t), eta)
            t_ = jnp.minimum(t_end, -jnp.log(jnp.maximum(sd, 1e-20)))
            su = jnp.sqrt(jnp.maximum(sigma_of(t) ** 2 - sigma_of(t_) ** 2, 0.0))
        else:
            t_, su = t, jnp.float32(0.0)

        eps = eps_at(x, s)
        if order == 2:
            x_low = solver_1(x, s, t_, eps)
            x_high, _ = solver_2(x, s, t_, eps)
        else:
            x_low, _ = solver_2(x, s, t_, eps, r1=1 / 3)
            x_high = solver_3(x, s, t_, eps)

        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
        error = jnp.linalg.norm((x_low - x_high) / delta) / x.size ** 0.5

        # PID controller (ref :509-521)
        inv_err = 1.0 / (error + 1e-8)
        e0 = inv_err
        factor = e0 ** b1 * errs[0] ** b2 * errs[1] ** b3
        factor = 1 + jnp.arctan(factor - 1)  # limiter (ref :506-507)
        accept = factor >= accept_safety

        noise = jax.random.normal(k_noise, x.shape, x.dtype)
        x_new = jnp.where(accept, x_high + su * s_noise * noise, x)
        x_prev_new = jnp.where(accept, x_low, x_prev)
        s_new = jnp.where(accept, t, s)
        errs_new = jnp.where(accept, jnp.array([e0, errs[0]]), errs)
        h_new = h * factor
        return (x_new, x_prev_new, s_new, h_new, errs_new, k, n + 1)

    init_err = jnp.array([1e8, 1e8], jnp.float32)  # initialized lazily as in ref
    # the reference seeds errs with the first inverse error; approximate by a
    # first half-iteration outside the loop
    eps0 = eps_at(x, jnp.float32(t_start))
    t0 = jnp.minimum(t_end, t_start + abs(h_init))
    if order == 2:
        x_low0 = solver_1(x, jnp.float32(t_start), t0, eps0)
        x_high0, _ = solver_2(x, jnp.float32(t_start), t0, eps0)
    else:
        x_low0, _ = solver_2(x, jnp.float32(t_start), t0, eps0, r1=1 / 3)
        x_high0 = solver_3(x, jnp.float32(t_start), t0, eps0)
    delta0 = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low0), jnp.abs(x)))
    err0 = jnp.linalg.norm((x_low0 - x_high0) / delta0) / x.size ** 0.5
    inv0 = 1.0 / (err0 + 1e-8)
    init_err = jnp.array([inv0, inv0], jnp.float32)

    carry = (x, x, jnp.float32(t_start), jnp.float32(abs(h_init)), init_err,
             key, jnp.int32(0))
    x, *_ = jax.lax.while_loop(cond, body, carry)
    return x


def log_likelihood(
    denoise_fn: DenoiseFn, x: jax.Array, sigma_min: float, sigma_max: float, *,
    key=None, atol: float = 1e-4, rtol: float = 1e-4,
):
    """Exact log-likelihood via the probability-flow ODE + Hutchinson trace
    estimator (reference: gc_sampling.py:468-492, torchdiffeq dopri5 ->
    jax.experimental.ode.odeint dopri5/adaptive here; jvp replaces the
    autograd vjp — same Rademacher estimator)."""
    from jax.experimental.ode import odeint

    if key is None:
        key = jax.random.PRNGKey(0)
    v = jax.random.rademacher(key, x.shape, jnp.float32)

    def ode_fn(state, sigma):
        xt, _ = state
        def d_of(xx):
            denoised = denoise_fn(xx, jnp.maximum(sigma, 1e-10))
            return (xx - denoised) / sigma
        d, jvp_v = jax.jvp(d_of, (xt,), (v,))
        d_ll = jnp.sum((v * jvp_v).reshape(xt.shape[0], -1), axis=1)
        return (d, d_ll)

    init = (x, jnp.zeros((x.shape[0],), jnp.float32))
    ts = jnp.array([sigma_min, sigma_max], jnp.float32)
    latent, delta_ll = jax.tree.map(lambda y: y[-1], odeint(ode_fn, init, ts,
                                                            atol=atol, rtol=rtol))
    # prior log-prob under N(0, sigma_max^2)
    d = np.prod(x.shape[1:])
    ll_prior = (-0.5 * jnp.sum((latent / sigma_max) ** 2, axis=tuple(range(1, x.ndim)))
                - 0.5 * d * math.log(2 * math.pi * sigma_max ** 2))
    return ll_prior + delta_ll
