"""Scaled-dot-product attention for the MDT regime: tiny sequences (<= ~23
tokens), large batch. XLA fuses the whole qk^T -> softmax -> v chain on the
MXU/VPU; at these sequence lengths a hand-rolled flash kernel buys nothing
(the score matrix is a few KB), so the einsum path IS the fast path. Softmax
statistics are accumulated in float32 regardless of input dtype.

Replaces torch F.scaled_dot_product_attention usage in the reference
(mdt/models/networks/transformers/transformer_blocks.py:140-142).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["sdpa", "causal_mask"]


def causal_mask(q_len: int, k_len: int) -> jax.Array:
    """Lower-triangular boolean mask (True = attend)."""
    return jnp.tril(jnp.ones((q_len, k_len), dtype=bool))


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    layout: str = "bhtd",
) -> jax.Array:
    """Attention over (B, H, T, D) tensors (layout="bhtd", default) or
    (B, T, H, D) tensors (layout="bthd").

    The "bthd" layout computes q/k/v contractions directly on the
    head-interleaved tensors — no (B,T,H,D)->(B,H,T,D) transpose copies in
    or out. For the frozen ViT towers (196-token grids at thousands of
    images) those four transposes are ~0.6 GB of pure HBM traffic per layer;
    the einsum form lets XLA feed the dots without them.

    mask: optional boolean array broadcastable to (B, H, Tq, Tk); True = keep.

    dropout_rate/dropout_rng/deterministic: attention-PROBABILITY dropout,
    exactly the reference's regularizer (transformer_blocks.py:95-100,140-142 —
    torch inverted dropout on the post-softmax matrix): each prob is zeroed
    with p=rate and survivors are rescaled by 1/(1-rate). Train-mode only;
    requires an explicit rng.

    There is deliberately NO Pallas route here: measured end-to-end, inserting
    the fused small-seq kernel into the jitted train step is an ~11x
    regression (the pallas_call is an opaque fusion boundary for XLA) even
    though it wins isolated microbenches — see docs/PALLAS.md for the full
    measurement table. ops/pallas_attention.py remains available as a
    numerics-tested standalone kernel.
    """
    drop_active = dropout_rate > 0.0 and not deterministic
    if layout == "bthd":
        q_len, k_len = q.shape[-3], k.shape[-3]
        head_dim = q.shape[-1]
        qk_eq, av_eq = "bqhd,bkhd->bhqk", "bhqk,bkhd->bqhd"
    else:
        q_len, k_len = q.shape[-2], k.shape[-2]
        head_dim = q.shape[-1]
        qk_eq, av_eq = "...qd,...kd->...qk", "...qk,...kd->...qd"
    scale = head_dim ** -0.5
    low_precision = q.dtype in (jnp.bfloat16, jnp.float16)
    if low_precision:
        # materialize the score matrix in the compute dtype — softmax still
        # accumulates in float32 (the astype below fuses into the softmax
        # pass, so f32 lives in registers only). Halves the dominant HBM
        # traffic of large-seq attention; for f32 inputs the exact reference
        # numerics are preserved.
        scores = jnp.einsum(qk_eq, q, k) * jnp.asarray(scale, q.dtype)
    else:
        scores = jnp.einsum(qk_eq, q, k).astype(jnp.float32) * scale
    if causal:
        cmask = causal_mask(q_len, k_len)
        mask = cmask if mask is None else jnp.logical_and(mask, cmask)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if drop_active:
        if dropout_rng is None:
            raise ValueError("sdpa dropout needs an explicit dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0).astype(q.dtype)
    return jnp.einsum(av_eq, probs, v)
