"""Pallas MLP HALF-BLOCK kernel (EXPERIMENTAL, NOT production-routed):
    out = x + [gamma *] W2( act( W1(norm(x)) ) )
with the hidden dimension processed in VMEM tiles — the companion of
ops/attention_halfblock.py (stage 2b of the tower-fusion experiment).

Not routed for the same reason as the attention half-block (docs/PALLAS.md):
in-kernel Dense matmuls schedule worse than XLA's pipelined equivalents at
these shapes, so the saved activation traffic does not pay for itself.
Hidden-dim tiling keeps the working set inside the 16 MiB scoped-VMEM
budget: for each tile t the kernel computes act(xn @ W1[:, t]) @ W2[t, :]
and accumulates in f32. Kept numerics-tested for reproducibility.

Activations:
* "swishglu": blocks.SwishGLU — W1 packs [projected | gate] along the
  output axis (2*hidden wide), act = projected * silu(gate).
* "quickgelu": CLIP MLP — W1 is hidden wide, act = x * sigmoid(1.702 x).

Norms and dot numerics exactly as ops/attention_halfblock.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_halfblock import _dot, _norm

__all__ = ["mlp_halfblock"]


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref,
            o_ref, *, act: str, norm: str, eps: float, has_bias: bool,
            has_gamma: bool, hidden_tile: int):
    x = x_ref[:]                              # (bB, T, C)
    bB, T, C = x.shape
    g = g_ref[0]
    b = b_ref[0] if has_bias else None
    xn = _norm(x, g, b, norm, eps).reshape(bB * T, C)
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    b1 = b1_ref[0]
    H = w2.shape[0]
    acc = jnp.zeros((bB * T, C), jnp.float32)
    n_tiles = H // hidden_tile
    for t in range(n_tiles):
        sl = slice(t * hidden_tile, (t + 1) * hidden_tile)
        if act == "swishglu":
            # W1 = [projected | gate] (2H wide); act = proj * silu(gate)
            proj = _dot(xn, w1[:, sl]) + b1[sl]
            gate_sl = slice(H + t * hidden_tile, H + (t + 1) * hidden_tile)
            gate = _dot(xn, w1[:, gate_sl]) + b1[gate_sl]
            h = proj * jax.nn.silu(gate)
        else:
            h = _dot(xn, w1[:, sl]) + b1[sl]
            h = h * jax.nn.sigmoid(1.702 * h)
        acc = acc + lax.dot_general(
            h, w2[sl, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = acc.astype(x.dtype).reshape(bB, T, C) + b2_ref[0]
    if has_gamma:
        out = out * gamma_ref[0]
    o_ref[:] = x + out


def _reference(x, g, b, w1, b1, w2, b2, gamma, act, norm, eps):
    """XLA reference — numerics oracle + custom-VJP backward (mirrors the
    unfused RMSNorm/LayerNorm + SwishGLU/QuickGELU module path)."""
    xn = _norm(x, g, b, norm, eps)
    h = _dot(xn, w1) + b1
    if act == "swishglu":
        proj, gate = jnp.split(h, 2, axis=-1)
        h = proj * jax.nn.silu(gate)
    else:
        h = h * jax.nn.sigmoid(1.702 * h)
    out = _dot(h, w2) + b2
    if gamma is not None:
        out = out * gamma
    return x + out


def _auto_block_b(T: int, C: int, hidden_tile: int, itemsize: int = 2) -> int:
    per_img = (2 * 2 * T * C + 2 * T * C) * itemsize  # dbuf io + xn temp
    per_img += T * C * 4                              # f32 accumulator
    per_img += 2 * T * hidden_tile * itemsize         # tile activations
    return max(1, min(8, (6 << 20) // per_img))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def mlp_halfblock(x, g, b, w1, b1, w2, b2, gamma, act: str = "swishglu",
                  norm: str = "rms", eps: float = 1e-8,
                  hidden_tile: int = 512, block_b: int = 0,
                  interpret: bool = False):
    """x: (B, T, C); g/b: norm scale/bias (b=None for RMSNorm);
    w1: (C, 2H) for swishglu / (C, H) for quickgelu; w2: (H, C);
    gamma: LayerScale vector or None."""
    return _impl(x, g, b, w1, b1, w2, b2, gamma, act, norm, eps,
                 hidden_tile, block_b, interpret)


def _fwd(x, g, b, w1, b1, w2, b2, gamma, act, norm, eps, ht, bb, interp):
    out = _impl(x, g, b, w1, b1, w2, b2, gamma, act, norm, eps, ht, bb, interp)
    return out, (x, g, b, w1, b1, w2, b2, gamma)


def _bwd(act, norm, eps, ht, bb, interp, res, grad):
    x, g, b, w1, b1, w2, b2, gamma = res
    has_b, has_gamma = b is not None, gamma is not None
    args = [x, g, w1, b1, w2, b2] + ([b] if has_b else []) \
        + ([gamma] if has_gamma else [])

    def fn(x_, g_, w1_, b1_, w2_, b2_, *rest):
        i = 0
        b_ = rest[i] if has_b else None
        i += has_b
        gam = rest[i] if has_gamma else None
        return _reference(x_, g_, b_, w1_, b1_, w2_, b2_, gam, act, norm, eps)

    _, vjp = jax.vjp(fn, *args)
    grads = list(vjp(grad))
    dx, dg, dw1, db1, dw2, db2 = grads[:6]
    rest = grads[6:]
    db = rest[0] if has_b else None
    dgam = rest[has_b] if has_gamma else None
    return dx, dg, db, dw1, db1, dw2, db2, dgam


mlp_halfblock.defvjp(_fwd, _bwd)


@functools.partial(jax.jit, static_argnames=("act", "norm", "eps",
                                             "hidden_tile", "block_b",
                                             "interpret"))
def _impl(x, g, b, w1, b1, w2, b2, gamma, act, norm, eps, hidden_tile,
          block_b, interpret):
    B, T, C = x.shape
    H = w2.shape[0]
    hidden_tile = min(hidden_tile, H)
    assert H % hidden_tile == 0, (H, hidden_tile)
    if not block_b:
        block_b = _auto_block_b(T, C, hidden_tile, x.dtype.itemsize)
    Bp = (B + block_b - 1) // block_b * block_b
    xp = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0))) if Bp != B else x

    has_bias = b is not None
    has_gamma = gamma is not None
    row = lambda v: v.reshape(1, -1)
    dummy = jnp.zeros((1, C), x.dtype)
    W1out = w1.shape[1]
    inputs = (xp, row(g), row(b) if has_bias else dummy, w1, row(b1), w2,
              row(b2), row(gamma) if has_gamma else dummy)
    bcast = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    specs = [
        pl.BlockSpec((block_b, T, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        bcast((1, C)), bcast((1, C)),
        bcast((C, W1out)), bcast((1, W1out)),
        bcast((H, C)), bcast((1, C)),
        bcast((1, C)),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, act=act, norm=norm, eps=eps,
                          has_bias=has_bias, has_gamma=has_gamma,
                          hidden_tile=hidden_tile),
        out_shape=jax.ShapeDtypeStruct((Bp, T, C), x.dtype),
        grid=(Bp // block_b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((block_b, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)
    return out[:B]
