"""Norm layers whose statistic reductions run on the MXU.

Motivation (tools/trace_ops.py, production B=512 train step): the norm
stat reductions cost ~278 ms/step (33% of device time) at ~30-74 GB/s
effective — the feature axis is the lane dimension, cross-lane reduction is
the VPU's slow path, and XLA builds mega-fusions around each norm (the
trace shows them re-reading both MLP kernels, i.e. recomputing neighbor
matmuls inline) that crawl far below HBM rate. Computing sum and
sum-of-squares as `dot_general` contractions against a constant (d, 128)
selector matrix moves the reduction onto the MXU, which streams the
operand from HBM at full rate, and forcibly breaks the pathological fusion:
producers terminate cleanly, the stats dots read the activation once, and
the normalize/apply stays an ordinary elementwise consumer fusion.

Numerics: the MXU accumulates in float32, so the mean is the exact f32 sum
of the input values; the square is taken in the input dtype (bf16 in the
frozen towers) before accumulation, adding ~0.4% relative error to the
variance — bf16-ULP-level on the normalized output (measured max|diff|
6.25e-2 on unit-normal data, the same as bf16 output quantization;
tools/mxu_norm_experiment.py). Use in frozen towers; default off elsewhere.

Used behind the towers' `mxu_norm` flag (models/clip.py,
models/voltron_vit.py), resolved like fused_tower_attention
(agents/mdtv_agent.py). Standalone microbench ties XLA (0.8-1.0x,
tools/mxu_norm_experiment.py) — the decision measurement is end-to-end
(docs/BENCHMARKING.md).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

__all__ = ["mxu_sum_lastdim", "MXULayerNorm", "MXURMSNorm"]


def _selector(d: int, dtype) -> jax.Array:
    """(d, 128) matrix whose first column is ones: x @ S sums the lane dim.

    128 columns (one MXU tile) instead of 1 so XLA cannot strength-reduce
    the dot back into the VPU reduce this module exists to avoid.
    """
    s = np.zeros((d, 128), np.float32)
    s[:, 0] = 1.0
    return jnp.asarray(s, dtype)


def mxu_sum_lastdim(x: jax.Array) -> jax.Array:
    """sum(x, axis=-1) computed on the MXU, f32 accumulation. Each element
    is multiplied by 1.0 and accumulated in float32; the contraction order
    differs from jnp.sum's, so results agree to f32-rounding level
    (rel ~1e-6), not bit-exactly."""
    s = _selector(x.shape[-1], x.dtype)
    return lax.dot_general(
        x, s, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., 0]


class MXULayerNorm(nn.Module):
    """Drop-in for `nn.LayerNorm(epsilon=eps)` (same param tree: scale/bias)
    with MXU statistic reduction."""
    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        mean = mxu_sum_lastdim(x) / d
        meansq = mxu_sum_lastdim(x * x) / d
        var = jnp.maximum(meansq - mean * mean, 0.0)
        inv = lax.rsqrt(var + self.epsilon)
        y = (x.astype(jnp.float32) - mean[..., None]) * inv[..., None]
        out_dtype = x.dtype
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (d,))
            out_dtype = jnp.promote_types(out_dtype, scale.dtype)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (d,))
            out_dtype = jnp.promote_types(out_dtype, bias.dtype)
            y = y + bias
        return y.astype(out_dtype)


class MXURMSNorm(nn.Module):
    """Drop-in for models.blocks.RMSNorm (param `g`, L2 norm with clamped
    denominator — ref transformer_blocks.py:43-51) with MXU reduction."""
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,))
        # reference: ||x||_2 / sqrt(d), clamped at eps
        norm = jnp.sqrt(jnp.maximum(mxu_sum_lastdim(x * x), 0.0)) * dim ** -0.5
        return (x / jnp.maximum(norm, self.eps)[..., None].astype(x.dtype)) * g
