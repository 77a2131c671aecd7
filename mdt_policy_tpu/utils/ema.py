"""Exponential moving average over the parameter pytree.

Re-implements the reference's NeMo-derived EMA callback
(`mdt/callbacks/ema.py:36-211`) functionally: the warmup decay schedule

    decay(step) = clamp(1 - (1 + step/inv_gamma)^(-power), min_value, max_value)

with the production config power=2/3, inv_gamma=1.0, min 0.0, max 0.9999
(conf/callbacks/calvin.yaml). The update is

    ema <- ema - (1 - decay) * (ema - params)        (ref ema.py:119-125)

applied every step from step 0. EMA state lives in the TrainState and is
updated inside the jitted train step (no callback machinery needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_decay", "ema_update"]


def ema_decay(step: jax.Array, *, inv_gamma: float = 1.0, power: float = 2.0 / 3.0,
              min_value: float = 0.0, max_value: float = 0.9999,
              start_step: int = 0) -> jax.Array:
    """Warmup decay schedule (ref ema.py:84-91). `step` is the optimization step."""
    eff = jnp.maximum(0, step - start_step - 1).astype(jnp.float32)
    value = 1.0 - (1.0 + eff / inv_gamma) ** (-power)
    return jnp.clip(value, min_value, max_value)


def ema_update(ema_params, params, decay):
    """ema <- ema - (1-decay)*(ema - params), pytree-wise."""
    one_minus = 1.0 - decay
    return jax.tree.map(lambda e, p: e - one_minus * (e - p), ema_params, params)
