"""Pallas attention HALF-BLOCK kernel (EXPERIMENTAL, NOT production-routed):
    out = x + [gamma *] proj(attention(qkv(norm(x))))
computed entirely in VMEM per image-block — the stage-2 fusion attempt on
top of ops/fused_qkv_attention.py.

MEASURED RESULT (docs/PALLAS.md): LOSES to the stage-1 qkv kernel on the
real chip — 141.5 ms vs 118.0 ms per Voltron tower call at B=1024. Pulling
the two Dense matmuls inside the kernel removes ~1.5 GB/layer of HBM
traffic but costs more than it saves: Mosaic's in-kernel dot scheduling
does not overlap the norm -> qkv -> attention -> proj dependency chain as
well as XLA pipelines the equivalent ops across grid-free graph regions.
The CLIP variant (T=197) additionally hits a Mosaic reshape limitation
(odd second-minor dim merge). Kept numerics-tested
(tests/test_fused_attention.py) so the experiment is reproducible; the
production tower path is the stage-1 kernel.

Numerics match the unfused modules op-for-op:
* norm="rms": mdt_policy_tpu.models.blocks.RMSNorm — f32 L2 norm,
  max(norm, eps) clamp, division in the input dtype, learned gain `g`.
* norm="ln": flax LayerNorm(eps) with scale+bias, f32 statistics.
* dots accumulate f32 on the MXU and cast to the input dtype, exactly as
  XLA lowers nn.Dense on bf16 inputs.
* optional LayerScale gamma (Voltron) before the residual add.

Differentiable via custom VJP over the XLA reference (identical math); the
production towers are frozen behind stop_gradient so backward is dead code.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attention_halfblock"]


def _norm(x, g, b, norm: str, eps: float):
    """Shared by kernel and reference; x (..., C) input-dtype, g/b 1-D."""
    xf = x.astype(jnp.float32)
    if norm == "rms":
        # blocks.RMSNorm: ||x||_2 * C^-0.5, clamped, division in x.dtype
        r = jnp.linalg.norm(xf, axis=-1, keepdims=True) * x.shape[-1] ** -0.5
        return (x / jnp.maximum(r, eps).astype(x.dtype)) * g
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y.astype(x.dtype) * g
    return y + b if b is not None else y


def _dot(a, w):
    """bf16 dot with f32 MXU accumulation, output in a.dtype (the XLA
    lowering of nn.Dense on low-precision inputs)."""
    return lax.dot_general(a, w, (((a.ndim - 1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32).astype(a.dtype)


def _kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            gamma_ref, o_ref, *, n_heads: int, norm: str, eps: float,
            causal: bool, has_bias: bool, has_gamma: bool):
    x = x_ref[:]                              # (bB, T, C)
    bB, T, C = x.shape
    dh = C // n_heads
    scale = dh ** -0.5
    g = g_ref[0]
    b = b_ref[0] if has_bias else None
    xn = _norm(x, g, b, norm, eps)
    qkv = _dot(xn.reshape(bB * T, C), wqkv_ref[:]) + bqkv_ref[0]
    qkv = qkv.reshape(bB, T, 3 * C)
    if causal:
        row = lax.broadcasted_iota(jnp.int32, (T, T), 0)
        col = lax.broadcasted_iota(jnp.int32, (T, T), 1)
        cmask = (col <= row)[None]
    acc = jnp.zeros((bB, T, C), jnp.float32)
    wproj = wproj_ref[:]
    for h in range(n_heads):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, C + h * dh:C + (h + 1) * dh]
        v = qkv[:, :, 2 * C + h * dh:2 * C + (h + 1) * dh]
        scores = lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if causal:
            scores = jnp.where(cmask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1)
        att_h = lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype)
        # partial projection: att_h @ Wproj[h*dh:(h+1)*dh, :], f32 accumulate
        acc = acc + lax.dot_general(
            att_h, wproj[h * dh:(h + 1) * dh, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    proj = acc.astype(x.dtype) + bproj_ref[0]
    if has_gamma:
        proj = proj * gamma_ref[0]
    o_ref[:] = x + proj


def _reference(x, g, b, w_qkv, b_qkv, w_proj, b_proj, gamma, n_heads, norm,
               eps, causal):
    """XLA reference — numerics oracle + custom-VJP backward. Mirrors the
    unfused module path (norm -> Dense -> sdpa bthd -> Dense [-> LayerScale]
    -> residual)."""
    B, T, C = x.shape
    dh = C // n_heads
    xn = _norm(x, g, b, norm, eps)
    qkv = _dot(xn, w_qkv) + b_qkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, n_heads, dh)
    k = k.reshape(B, T, n_heads, dh)
    v = v.reshape(B, T, n_heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * dh ** -0.5
    if causal:
        cm = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(cm, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, C)
    proj = _dot(att, w_proj) + b_proj
    if gamma is not None:
        proj = proj * gamma
    return x + proj


def _auto_block_b(T: int, C: int, itemsize: int = 2) -> int:
    """Image-block sizing under the 16 MiB scoped-VMEM budget: double-
    buffered x-in/out + qkv intermediate + f32 proj accumulator + score
    scratch, leaving room for the grid-invariant weights (~5 MB at CLIP
    width)."""
    per_img = (2 * 2 * T * C           # x in + out, double-buffered
               + T * 3 * C             # qkv intermediate
               + 2 * T * C) * itemsize  # xn + att_h temporaries
    per_img += T * C * 4 + T * T * 6   # f32 accumulator + score scratch
    return max(1, min(8, (7 << 20) // per_img))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def attention_halfblock(x, g, b, w_qkv, b_qkv, w_proj, b_proj, gamma,
                        n_heads: int, norm: str = "rms", eps: float = 1e-8,
                        causal: bool = False, block_b: int = 0,
                        interpret: bool = False):
    """x: (B, T, C); g/b: norm scale/bias (b=None for RMSNorm);
    w_qkv: (C, 3C); w_proj: (C, C); gamma: LayerScale vector or None.
    Returns x + [gamma*] proj(attention(qkv(norm(x)))).
    """
    return _impl(x, g, b, w_qkv, b_qkv, w_proj, b_proj, gamma,
                 n_heads, norm, eps, causal, block_b, interpret)


def _fwd(x, g, b, w_qkv, b_qkv, w_proj, b_proj, gamma,
         n_heads, norm, eps, causal, block_b, interpret):
    out = _impl(x, g, b, w_qkv, b_qkv, w_proj, b_proj, gamma,
                n_heads, norm, eps, causal, block_b, interpret)
    return out, (x, g, b, w_qkv, b_qkv, w_proj, b_proj, gamma)


def _bwd(n_heads, norm, eps, causal, block_b, interpret, res, grad):
    x, g, b, w_qkv, b_qkv, w_proj, b_proj, gamma = res
    diff = [x, g, w_qkv, b_qkv, w_proj, b_proj]
    has_b, has_gamma = b is not None, gamma is not None

    def f(x_, g_, wq, bq, wp, bp, b_=None, gam=None):
        return _reference(x_, g_, b_, wq, bq, wp, bp, gam,
                          n_heads, norm, eps, causal)

    if has_b and has_gamma:
        fn = lambda x_, g_, wq, bq, wp, bp, b_, gam: f(x_, g_, wq, bq, wp, bp, b_, gam)
        _, vjp = jax.vjp(fn, x, g, w_qkv, b_qkv, w_proj, b_proj, b, gamma)
        dx, dg, dwq, dbq, dwp, dbp, db, dgam = vjp(grad)
    elif has_b:
        fn = lambda x_, g_, wq, bq, wp, bp, b_: f(x_, g_, wq, bq, wp, bp, b_, None)
        _, vjp = jax.vjp(fn, x, g, w_qkv, b_qkv, w_proj, b_proj, b)
        dx, dg, dwq, dbq, dwp, dbp, db = vjp(grad)
        dgam = None
    elif has_gamma:
        fn = lambda x_, g_, wq, bq, wp, bp, gam: f(x_, g_, wq, bq, wp, bp, None, gam)
        _, vjp = jax.vjp(fn, x, g, w_qkv, b_qkv, w_proj, b_proj, gamma)
        dx, dg, dwq, dbq, dwp, dbp, dgam = vjp(grad)
        db = None
    else:
        fn = lambda x_, g_, wq, bq, wp, bp: f(x_, g_, wq, bq, wp, bp, None, None)
        _, vjp = jax.vjp(fn, x, g, w_qkv, b_qkv, w_proj, b_proj)
        dx, dg, dwq, dbq, dwp, dbp = vjp(grad)
        db = dgam = None
    return dx, dg, db, dwq, dbq, dwp, dbp, dgam


attention_halfblock.defvjp(_fwd, _bwd)


@functools.partial(jax.jit, static_argnames=("n_heads", "norm", "eps",
                                             "causal", "block_b", "interpret"))
def _impl(x, g, b, w_qkv, b_qkv, w_proj, b_proj, gamma,
          n_heads, norm, eps, causal, block_b, interpret):
    B, T, C = x.shape
    assert C % n_heads == 0
    if not block_b:
        block_b = _auto_block_b(T, C, x.dtype.itemsize)
    Bp = (B + block_b - 1) // block_b * block_b
    xp = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0))) if Bp != B else x

    has_bias = b is not None
    has_gamma = gamma is not None
    # 1-D vectors go in as (1, C)/(1, 3C) rows, broadcast to every grid cell
    row = lambda v: v.reshape(1, -1)
    dummy = jnp.zeros((1, C), x.dtype)
    inputs = (xp, row(g), row(b) if has_bias else dummy, w_qkv, row(b_qkv),
              w_proj, row(b_proj), row(gamma) if has_gamma else dummy)

    bcast = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    specs = [
        pl.BlockSpec((block_b, T, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        bcast((1, C)), bcast((1, C)),
        bcast((C, 3 * C)), bcast((1, 3 * C)),
        bcast((C, C)), bcast((1, C)),
        bcast((1, C)),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, norm=norm, eps=eps,
                          causal=causal, has_bias=has_bias,
                          has_gamma=has_gamma),
        out_shape=jax.ShapeDtypeStruct((Bp, T, C), x.dtype),
        grid=(Bp // block_b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((block_b, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)
    return out[:B]
