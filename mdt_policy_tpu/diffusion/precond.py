"""Karras (EDM) preconditioner — the functional core of the score model.

Replaces the reference's `GCDenoiser` nn.Module wrapper
(`mdt/models/edm_diffusion/score_wrappers.py:18-100`) with pure functions over
an abstract `inner_fn(actions, sigma) -> model_out` closure. The caller closes
the state/goal conditioning (and, on TPU, hoists the encoder context out of the
sampler scan — fixing the reference's per-step encoder recompute, SURVEY §3.2).

Scalings (score_wrappers.py:40-43):
    c_skip = sigma_data^2 / (sigma^2 + sigma_data^2)
    c_out  = sigma * sigma_data / sqrt(sigma^2 + sigma_data^2)
    c_in   = 1 / sqrt(sigma^2 + sigma_data^2)
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["append_dims", "get_scalings", "precond_loss", "precond_denoise"]

# inner_fn(noised_actions_scaled, sigma) -> model raw output, same shape as actions
InnerFn = Callable[[jax.Array, jax.Array], jax.Array]


def append_dims(x: jax.Array, target_ndim: int) -> jax.Array:
    """Appends trailing singleton dims (reference: edm_diffusion/utils.py:146-151)."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def get_scalings(sigma: jax.Array, sigma_data: float) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(c_skip, c_out, c_in) — reference: score_wrappers.py:31-43."""
    var = sigma ** 2 + sigma_data ** 2
    c_skip = sigma_data ** 2 / var
    c_out = sigma * sigma_data * jax.lax.rsqrt(var)
    c_in = jax.lax.rsqrt(var)
    return c_skip, c_out, c_in


def precond_loss(
    inner_fn: InnerFn,
    actions: jax.Array,
    noise: jax.Array,
    sigma: jax.Array,
    sigma_data: float,
) -> Tuple[jax.Array, jax.Array]:
    """Score-matching loss in preconditioned space
    (reference: score_wrappers.py:45-63).

    loss = mean over batch of flatten(model_out - (a - c_skip*noised)/c_out)^2
    Returns (loss, model_output).
    """
    c_skip, c_out, c_in = (append_dims(c, actions.ndim) for c in get_scalings(sigma, sigma_data))
    noised = actions + noise * append_dims(sigma, actions.ndim)
    model_out = inner_fn(noised * c_in, sigma)
    target = (actions - c_skip * noised) / c_out
    loss = jnp.mean(jnp.square(model_out - target))
    return loss, model_out


def precond_denoise(
    inner_fn: InnerFn,
    actions: jax.Array,
    sigma: jax.Array,
    sigma_data: float,
) -> jax.Array:
    """Preconditioned denoiser D(x, sigma) = c_out * F(c_in * x, sigma) + c_skip * x
    (reference: score_wrappers.py:65-80)."""
    c_skip, c_out, c_in = (append_dims(c, actions.ndim) for c in get_scalings(sigma, sigma_data))
    return inner_fn(actions * c_in, sigma) * c_out + actions * c_skip
