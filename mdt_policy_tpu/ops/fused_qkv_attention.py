"""Fused qkv-attention Pallas kernel for the frozen-tower regime:
mid sequences (~196 tokens), head_dim 64, thousands of images per call.

Why this shape of kernel (tools/perf_probe.py + trace evidence):
the ViT towers are 82% of the production train step, and XLA's attention
lowering spends ~a third of tower time on HBM traffic that isn't matmuls —
head-major layout copies of q/k/v, materialized score/prob matrices, and
the attention-output relayout. This kernel consumes the fused qkv
projection output `(B, T, 3C)` EXACTLY as the Dense layer writes it and
produces the attention output `(B, T, C)` exactly as the out-projection
wants it: per-head slicing, QK^T, softmax (f32, in-register), and PV all
happen in VMEM. Per tower layer the only attention HBM traffic left is one
read of qkv and one write of the output.

Contrast with ops/pallas_attention.small_seq_mha (the tiny-seq kernel):
that one requires pre-transposed (B, H, T, D) inputs padded to 128 lanes —
at tower scale the padding/transpose prep alone costs more than XLA's
whole attention (measured: 229 ms vs 189 ms per voltron call). This kernel
has no prep: the grid walks image blocks, T and C stay logical, Mosaic
handles the sublane padding internally.

Differentiable via custom VJP with the XLA einsum reference as backward
(identical math); in the production train step the towers sit behind
stop_gradient, so the backward is dead code XLA removes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_qkv_attention"]


def _kernel(qkv_ref, o_ref, *, n_heads: int, causal: bool):
    qkv = qkv_ref[:]  # (bB, T, 3C)
    T = qkv.shape[1]
    C = qkv.shape[2] // 3
    dh = C // n_heads
    scale = dh ** -0.5
    if causal:
        row = lax.broadcasted_iota(jnp.int32, (T, T), 0)
        col = lax.broadcasted_iota(jnp.int32, (T, T), 1)
        cmask = (col <= row)[None]
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
        out = lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * dh:(h + 1) * dh] = out.astype(o_ref.dtype)


def _kernel_pair(q_ref, k_ref, v_ref, o_ref, *, causal: bool):
    """Head-pair grid cell: the BlockSpec index maps already selected one
    128-lane pair of 64-wide heads, so the only in-register slicing is the
    two halves of a single lane tile. Measured 1.09-1.12x over the head-loop
    kernel at tower shapes (tools/attn_kernel_experiment.py, bB=16; 20 is
    0.7x — keep the block a power of two)."""
    q = q_ref[:]  # (bB, T, 128)
    k = k_ref[:]
    v = v_ref[:]
    T = q.shape[1]
    if causal:
        row = lax.broadcasted_iota(jnp.int32, (T, T), 0)
        col = lax.broadcasted_iota(jnp.int32, (T, T), 1)
        cmask = (col <= row)[None]
    for h in range(2):
        sl = slice(h * 64, (h + 1) * 64)
        qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
        scores = lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (64 ** -0.5)
        if causal:
            scores = jnp.where(cmask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1)
        out = lax.dot_general(
            probs.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _reference(qkv, n_heads, causal):
    """XLA einsum attention on the packed qkv — backward path + numerics
    oracle (same math as ops.attention.sdpa layout='bthd')."""
    B, T, C3 = qkv.shape
    C = C3 // 3
    dh = C // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, n_heads, dh)
    k = k.reshape(B, T, n_heads, dh)
    v = v.reshape(B, T, n_heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * dh ** -0.5
    if causal:
        cm = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(cm, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, C)


def _auto_block_b(T: int, C: int, itemsize: int = 2) -> int:
    """Largest image-block that keeps the kernel inside the default 16 MiB
    scoped-VMEM budget: double-buffered qkv-in + out blocks plus the f32
    score/prob scratch per image. Measured sweet spot caps at 8."""
    per_img = 2 * (T * 3 * C + T * C) * itemsize + T * T * 6
    return max(1, min(8, (12 << 20) // per_img))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fused_qkv_attention(qkv: jax.Array, n_heads: int, causal: bool = False,
                        block_b: int = 0, interpret: bool = False,
                        variant: str = "auto") -> jax.Array:
    """Attention over the packed projection output.

    qkv: (B, T, 3C) laid out [q | k | v] along the channel axis, each C wide
    with n_heads interleaved head slices of C // n_heads.
    block_b: images per grid cell; 0 = auto (VMEM-budget heuristic).
    variant: "auto" | "pair" | "head_loop". "auto" resolves to "pair"
    when eligible (dh=64 / C%128==0 / even heads — all three towers
    qualify; 1.09-1.12x in tower-shape microbenches, 829.7 vs 837.4
    ms/step end-to-end on the full B=512 dual-modality train step with
    identical loss) and to the head-loop kernel otherwise.
    MDT_ATTN_VARIANT env overrides at trace time (measurement hook).
    Returns (B, T, C) — the head-concatenated attention output.
    """
    return _impl(qkv, n_heads, causal, block_b, interpret, variant)


def _fwd(qkv, n_heads, causal, block_b, interpret, variant):
    return _impl(qkv, n_heads, causal, block_b, interpret, variant), (qkv,)


def _bwd(n_heads, causal, block_b, interpret, variant, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda x: _reference(x, n_heads, causal), qkv)
    return vjp(g)


fused_qkv_attention.defvjp(_fwd, _bwd)


def _pair_eligible(C: int, n_heads: int) -> bool:
    return C % 128 == 0 and n_heads % 2 == 0 and C // n_heads == 64


@functools.partial(jax.jit, static_argnames=("n_heads", "causal", "block_b",
                                             "interpret", "variant"))
def _impl(qkv, n_heads, causal, block_b, interpret, variant="auto"):
    B, T, C3 = qkv.shape
    C = C3 // 3
    assert C % n_heads == 0, (C, n_heads)
    variant = os.environ.get("MDT_ATTN_VARIANT", variant)
    if variant == "auto":
        # pair is 1.09-1.12x in tower-shape microbenches
        # (tools/attn_kernel_experiment.py) and confirmed end-to-end:
        # 829.7 vs 837.4 ms/step on the full B=512 dual-modality step
        # (tools/ab_step.py, identical loss) — production where eligible.
        variant = "pair" if _pair_eligible(C, n_heads) else "head_loop"
    if variant == "pair":
        assert _pair_eligible(C, n_heads), (C, n_heads)
        bB = block_b or 16  # power of two; 20 measured 0.7x, 24+ overflows
        Bp = (B + bB - 1) // bB * bB
        if Bp != B:
            qkv = jnp.pad(qkv, ((0, Bp - B), (0, 0), (0, 0)))
        cb = C // 128
        q_spec = pl.BlockSpec((bB, T, 128), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
        k_spec = pl.BlockSpec((bB, T, 128), lambda i, j: (i, 0, cb + j),
                              memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec((bB, T, 128), lambda i, j: (i, 0, 2 * cb + j),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((bB, T, 128), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_pair, causal=causal),
            out_shape=jax.ShapeDtypeStruct((Bp, T, C), qkv.dtype),
            grid=(Bp // bB, n_heads // 2),
            in_specs=[q_spec, k_spec, v_spec],
            out_specs=o_spec,
            interpret=interpret,
        )(qkv, qkv, qkv)
        return out[:B]
    if not block_b:
        block_b = _auto_block_b(T, C, qkv.dtype.itemsize)
    Bp = (B + block_b - 1) // block_b * block_b
    if Bp != B:
        qkv = jnp.pad(qkv, ((0, Bp - B), (0, 0), (0, 0)))
    spec_in = pl.BlockSpec((block_b, T, C3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((block_b, T, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, causal=causal),
        out_shape=jax.ShapeDtypeStruct((Bp, T, C), qkv.dtype),
        grid=(Bp // block_b,),
        in_specs=[spec_in],
        out_specs=spec_out,
        interpret=interpret,
    )(qkv)
    return out[:B]
