"""Single-pass Pallas norm kernels for the frozen-tower regime.

Why (docs/BENCHMARKING.md profiler breakdown): after the fused attention
kernel, ~26% of the production train step is LayerNorm/RMSNorm reduce
passes running at ~16% of HBM peak — XLA lowers each norm as separate
mean/variance reduce fusions plus a normalize pass, so the activation
tensor crosses HBM several times per norm, and the lane-dim (feature)
reduction itself runs on the VPU's slow cross-lane path. These kernels do
the whole norm in ONE HBM round trip: a row block is read into VMEM once,
mean/variance (or the L2 norm) are computed in-register in f32, and the
normalized, weighted output is written back once.

Shapes: x is (..., D) with D a lane multiple (384/512/768 in the towers);
rows are flattened and the grid walks row blocks. Like the attention
kernel (ops/fused_qkv_attention.py) these are differentiable via custom
VJP with the XLA reference as backward — in production they sit behind
the towers' stop_gradient, so backward is dead code.

DECISION (docs/PALLAS.md): NOT routed into the towers. On-chip measurement
(tools/norm_experiment.py, row blocks swept 256-2048) shows XLA's own norm
emission streaming at 252 GB/s vs 85-93 GB/s for this kernel — the
single-HBM-round-trip premise loses to Mosaic's slower cross-lane
reduction path. Kept as a numerics-tested standalone so the measurement
stays reproducible.

Reference semantics:
* fused_layer_norm == flax nn.LayerNorm(eps, use_scale, use_bias) — the
  CLIP towers' ln_1/ln_2/ln_pre/ln_post/ln_final (models/clip.py), ref
  torch nn.LayerNorm in mdt/models/networks/clip.py:163.
* fused_rms_norm == models.blocks.RMSNorm: y = x / max(||x||_2 * D**-0.5,
  eps) * g — the Voltron blocks' norm (ref transformer_blocks.py:43-51).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_layer_norm", "fused_rms_norm"]


# ---------------------------------------------------------------------------
# kernels (operate on a (block_rows, D) VMEM tile)
# ---------------------------------------------------------------------------

def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # (rows, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    w = w_ref[:].astype(jnp.float32)  # (1, D)
    b = b_ref[:].astype(jnp.float32)
    o_ref[:] = (y * w + b).astype(o_ref.dtype)


def _rms_kernel(x_ref, g_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # (rows, D)
    d = x.shape[-1]
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) * d ** -0.5
    y = x / jnp.maximum(norm, eps)
    o_ref[:] = (y * g_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# references (numerics oracle + backward)
# ---------------------------------------------------------------------------

def _ln_reference(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _rms_reference(x, g, eps):
    xf = x.astype(jnp.float32)
    d = x.shape[-1]
    norm = jnp.linalg.norm(xf, axis=-1, keepdims=True) * d ** -0.5
    return ((xf / jnp.maximum(norm, eps)) * g.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _auto_block_rows(d: int, itemsize: int) -> int:
    """Row block sized for the 16 MiB scoped-VMEM budget: double-buffered
    in/out tiles plus the f32 working copy."""
    per_row = d * (2 * 2 * itemsize + 4)
    rows = (12 << 20) // per_row
    return max(64, min(2048, rows // 64 * 64))


def _call_norm(kernel, x, params, block_rows, interpret):
    """Flatten x to rows, pad to a block multiple, run the row-block grid."""
    d = x.shape[-1]
    lead = x.shape[:-1]
    n = 1
    for s in lead:
        n *= s
    xf = x.reshape(n, d)
    if not block_rows:
        block_rows = _auto_block_rows(d, x.dtype.itemsize)
    np_ = (n + block_rows - 1) // block_rows * block_rows
    if np_ != n:
        xf = jnp.pad(xf, ((0, np_ - n), (0, 0)))
    row_spec = pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # weights: one (1, D) tile, same block for every grid cell
    w_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_, d), x.dtype),
        grid=(np_ // block_rows,),
        in_specs=[row_spec] + [w_spec] * len(params),
        out_specs=row_spec,
        interpret=interpret,
    )(xf, *(p.reshape(1, d) for p in params))
    return out[:n].reshape(*lead, d)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_layer_norm(x: jax.Array, w: jax.Array, b: jax.Array,
                     eps: float = 1e-5, block_rows: int = 0,
                     interpret: bool = False) -> jax.Array:
    """LayerNorm over the last axis, f32 statistics, one HBM round trip.

    x: (..., D); w, b: (D,). Matches flax nn.LayerNorm(epsilon=eps).
    """
    return _call_norm(functools.partial(_ln_kernel, eps=eps),
                      x, (w, b), block_rows, interpret)


def _ln_fwd(x, w, b, eps, block_rows, interpret):
    return fused_layer_norm(x, w, b, eps, block_rows, interpret), (x, w, b)


def _ln_bwd(eps, block_rows, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda xx, ww, bb: _ln_reference(xx, ww, bb, eps), x, w, b)
    return vjp(g)


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_rms_norm(x: jax.Array, g: jax.Array, eps: float = 1e-8,
                   block_rows: int = 0, interpret: bool = False) -> jax.Array:
    """models.blocks.RMSNorm semantics (L2 norm, clamped denominator) in one
    HBM round trip. x: (..., D); g: (D,)."""
    return _call_norm(functools.partial(_rms_kernel, eps=eps),
                      x, (g,), block_rows, interpret)


def _rms_fwd(x, g, eps, block_rows, interpret):
    return fused_rms_norm(x, g, eps, block_rows, interpret), (x, g)


def _rms_bwd(eps, block_rows, interpret, res, grad):
    x, g = res
    _, vjp = jax.vjp(lambda xx, gg: _rms_reference(xx, gg, eps), x, g)
    return vjp(grad)


fused_rms_norm.defvjp(_rms_fwd, _rms_bwd)
