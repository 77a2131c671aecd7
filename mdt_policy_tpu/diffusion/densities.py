"""Training-time sigma sample densities.

Re-implements the eight density families of the reference
(`mdt/models/edm_diffusion/utils.py:154-203`) as pure `(key, shape) -> sigmas`
functions on `jax.random` keys. These run *inside* the jitted train step, so
they are written in jnp with static shapes.

The production default for MDT is the truncated log-logistic with
loc = log(sigma_data), scale = 0.5, truncated to [sigma_min, sigma_max]
(reference: mdt/models/mdtv_agent.py:552-591).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "rand_log_normal",
    "rand_log_logistic",
    "rand_log_uniform",
    "rand_uniform",
    "rand_v_diffusion",
    "rand_split_log_normal",
    "rand_discrete",
    "make_sample_density",
]

Shape = tuple[int, ...]


def rand_log_normal(key: jax.Array, shape: Shape, loc: float = 0.0, scale: float = 1.0) -> jax.Array:
    """Lognormal sigma density (reference: edm_diffusion/utils.py:154-156)."""
    return jnp.exp(jax.random.normal(key, shape) * scale + loc)


def rand_log_logistic(
    key: jax.Array,
    shape: Shape,
    loc: float = 0.0,
    scale: float = 1.0,
    min_value: float = 0.0,
    max_value: float = float("inf"),
) -> jax.Array:
    """Truncated log-logistic sigma density — the MDT default
    (reference: edm_diffusion/utils.py:159-166).

    The reference computes the CDF bounds in float64; those bounds are static
    Python floats here so we match that precision without needing x64 on TPU.
    """
    min_cdf = _sigmoid_f64((math.log(min_value) if min_value > 0 else -math.inf) - loc, scale)
    max_cdf = _sigmoid_f64((math.log(max_value) if max_value != math.inf else math.inf) - loc, scale)
    u = jax.random.uniform(key, shape) * (max_cdf - min_cdf) + min_cdf
    return jnp.exp(jax.scipy.special.logit(u) * scale + loc)


def _sigmoid_f64(x: float, scale: float) -> float:
    if x == math.inf:
        return 1.0
    if x == -math.inf:
        return 0.0
    return 1.0 / (1.0 + math.exp(-x / scale))


def rand_log_uniform(key: jax.Array, shape: Shape, min_value: float, max_value: float) -> jax.Array:
    """Log-uniform sigma density (reference: edm_diffusion/utils.py:169-173)."""
    lo, hi = math.log(min_value), math.log(max_value)
    return jnp.exp(jax.random.uniform(key, shape) * (hi - lo) + lo)


def rand_uniform(key: jax.Array, shape: Shape, min_value: float, max_value: float) -> jax.Array:
    """Uniform sigma density (reference: edm_diffusion/utils.py:201-203)."""
    return jax.random.uniform(key, shape) * (max_value - min_value) + min_value


def rand_v_diffusion(
    key: jax.Array,
    shape: Shape,
    sigma_data: float = 1.0,
    min_value: float = 0.0,
    max_value: float = float("inf"),
) -> jax.Array:
    """Truncated v-diffusion timestep density (reference: edm_diffusion/utils.py:176-181)."""
    min_cdf = math.atan(min_value / sigma_data) * 2 / math.pi
    max_cdf = math.atan(max_value / sigma_data) * 2 / math.pi if max_value != math.inf else 1.0
    u = jax.random.uniform(key, shape) * (max_cdf - min_cdf) + min_cdf
    return jnp.tan(u * math.pi / 2) * sigma_data


def rand_split_log_normal(
    key: jax.Array, shape: Shape, loc: float, scale_1: float, scale_2: float
) -> jax.Array:
    """Split lognormal sigma density (reference: edm_diffusion/utils.py:184-191)."""
    k_n, k_u = jax.random.split(key)
    n = jnp.abs(jax.random.normal(k_n, shape))
    u = jax.random.uniform(k_u, shape)
    n_left = n * -scale_1 + loc
    n_right = n * scale_2 + loc
    ratio = scale_1 / (scale_1 + scale_2)
    return jnp.exp(jnp.where(u < ratio, n_left, n_right))


def rand_discrete(key: jax.Array, shape: Shape, values: jax.Array) -> jax.Array:
    """Uniform draw over a discrete sigma grid (reference: edm_diffusion/utils.py:194-198)."""
    idx = jax.random.randint(key, shape, 0, len(values))
    return jnp.take(values, idx)


def make_sample_density(
    density_type: str,
    sigma_data: float,
    sigma_min: float,
    sigma_max: float,
    *,
    loc: float | None = None,
    scale: float | None = None,
    scale_1: float | None = None,
    scale_2: float | None = None,
    discrete_values: jax.Array | None = None,
) -> Callable[[jax.Array, Shape], jax.Array]:
    """Dispatch mirroring `MDTVAgent.make_sample_density`
    (reference: mdt/models/mdtv_agent.py:552-591). Returns a `(key, shape)` fn."""
    if density_type == "lognormal":
        return partial(rand_log_normal, loc=loc if loc is not None else 0.0,
                       scale=scale if scale is not None else 1.0)
    if density_type == "loglogistic":
        return partial(
            rand_log_logistic,
            loc=loc if loc is not None else math.log(sigma_data),
            scale=scale if scale is not None else 0.5,
            min_value=sigma_min,
            max_value=sigma_max,
        )
    if density_type == "loguniform":
        return partial(rand_log_uniform, min_value=sigma_min, max_value=sigma_max)
    if density_type == "uniform":
        return partial(rand_uniform, min_value=sigma_min, max_value=sigma_max)
    if density_type == "v-diffusion":
        return partial(rand_v_diffusion, sigma_data=sigma_data,
                       min_value=sigma_min, max_value=sigma_max)
    if density_type == "discrete":
        if discrete_values is None:
            raise ValueError("discrete density needs discrete_values")
        return partial(rand_discrete, values=discrete_values)
    if density_type == "split-lognormal":
        if loc is None or scale_1 is None or scale_2 is None:
            raise ValueError("split-lognormal needs loc, scale_1, scale_2")
        return partial(rand_split_log_normal, loc=loc, scale_1=scale_1, scale_2=scale_2)
    raise ValueError(f"Unknown sample density type: {density_type!r}")
