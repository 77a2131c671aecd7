"""Pallas fused attention for the MDT regime: TINY sequences (T <= 32),
LARGE batch*heads.

The denoiser decoder attends over 10 action tokens, the encoder over ~4-23
tokens, the perceiver over 3 latents — per-sample score matrices of a few
hundred elements. The win here is not flash-style tiling (nothing to tile)
but FUSION: one kernel keeps q/k/v, the TxT scores, the softmax and the
output entirely in VMEM per batch block, avoiding the HBM round-trips of an
unfused qk^T -> softmax -> v chain and per-op launch overhead.

Layout: (B, H, T, D) is flattened to rows (B*H, T, D); T is padded to the
sublane quantum and D to the 128-lane quantum; the grid walks batch blocks.
Padded key positions are masked before the softmax; padded D lanes are zeros
and contribute nothing.

Numerics match ops.attention.sdpa (float32 softmax) — tested in interpret
mode on CPU and used on TPU behind `use_pallas=True` / MDT_TPU_PALLAS=1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["small_seq_mha", "pallas_enabled"]


def pallas_enabled() -> bool:
    return os.environ.get("MDT_TPU_PALLAS", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, causal: bool):
    q = q_ref[:]  # (TB, Tp, Dp); q pre-scaled by D^-0.5 at the call site
    k = k_ref[:]
    v = v_ref[:]
    # scores: batched (TB, Tp, Tp)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    tp = q.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < t_real  # mask padded keys
    if causal:
        mask = jnp.logical_and(mask, col <= row)
    scores = jnp.where(mask[None], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _sdpa_reference(q, k, v, causal):
    """XLA einsum attention — the backward path for the custom VJP."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("...qd,...kd->...qk", q, k).astype(jnp.float32) * scale
    if causal:
        T = q.shape[-2]
        cm = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(cm, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def small_seq_mha(q: jax.Array, k: jax.Array, v: jax.Array,
                  causal: bool = False, block_rows: int = 16,
                  interpret: bool = False) -> jax.Array:
    """Fused attention over (B, H, T, D) with T == key length (self-attn).
    Scale = D^-0.5 applied to q up front (so padding D doesn't change it).

    Differentiable: forward runs the Pallas kernel; backward differentiates
    the XLA reference (identical math) — the standard custom-VJP pattern for
    Pallas forwards (pallas guide, Patterns: Custom VJP)."""
    return _small_seq_mha_impl(q, k, v, causal, block_rows, interpret)


def _small_seq_mha_fwd(q, k, v, causal, block_rows, interpret):
    return _small_seq_mha_impl(q, k, v, causal, block_rows, interpret), (q, k, v)


def _small_seq_mha_bwd(causal, block_rows, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _sdpa_reference(q_, k_, v_, causal), q, k, v)
    return vjp(g)


small_seq_mha.defvjp(_small_seq_mha_fwd, _small_seq_mha_bwd)


@functools.partial(jax.jit, static_argnames=("causal", "block_rows", "interpret"))
def _small_seq_mha_impl(q: jax.Array, k: jax.Array, v: jax.Array,
                        causal: bool = False, block_rows: int = 16,
                        interpret: bool = False) -> jax.Array:
    B, H, T, D = q.shape
    assert k.shape == v.shape == (B, H, T, D), "self-attention shapes only"
    scale = D ** -0.5
    q = (q * scale).reshape(B * H, T, D)
    k = k.reshape(B * H, T, D)
    v = v.reshape(B * H, T, D)

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    Tp = _round_up(T, sub)
    Dp = _round_up(D, 128)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, Tp - T), (0, Dp - D)))
    qp, kp, vp = pad(q), pad(k), pad(v)
    rows = B * H
    rows_p = _round_up(rows, block_rows)
    if rows_p != rows:
        grow = lambda x: jnp.pad(x, ((0, rows_p - rows), (0, 0), (0, 0)))
        qp, kp, vp = grow(qp), grow(kp), grow(vp)

    grid = (rows_p // block_rows,)
    spec = pl.BlockSpec((block_rows, Tp, Dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, t_real=T, causal=causal),
        out_shape=jax.ShapeDtypeStruct((rows_p, Tp, Dp), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qp, kp, vp)
    return out[:rows, :T, :D].reshape(B, H, T, D)
