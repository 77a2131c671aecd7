"""Positional-embedding library: rotary (with xpos decay), T5-style relative
position bias, and dynamic position bias.

Functional re-design of the reference's position embedding module
(`mdt/models/networks/transformers/position_embeddings.py:33-260`, itself
lucidrains' rotary-embedding-torch). Production MDT configs run with
`use_rot_embed: False`, but the flag is part of the model surface; rotary is
wired into models.blocks.Attention.

All functions are pure; frequencies are computed host-side where static.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["rotate_half", "apply_rotary_emb", "rotary_frequencies",
           "RotaryEmbedding", "RelativePositionBias", "DynamicPositionBias"]


def rotate_half(x: jax.Array) -> jax.Array:
    """Interleaved (-x2, x1) rotation (ref :56-60; pairs-of-adjacent layout)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack((-x2, x1), axis=-1).reshape(*x.shape[:-2], -1)


def apply_rotary_emb(freqs: jax.Array, t: jax.Array, scale=1.0) -> jax.Array:
    """(ref :62-69) rotate the leading `freqs.shape[-1]` channels of t."""
    rot_dim = freqs.shape[-1]
    t_rot, t_rest = t[..., :rot_dim], t[..., rot_dim:]
    t_rot = (t_rot * jnp.cos(freqs) * scale) + (rotate_half(t_rot) * jnp.sin(freqs) * scale)
    return jnp.concatenate([t_rot, t_rest], axis=-1)


def rotary_frequencies(dim: int, *, theta: float = 10000.0,
                       theta_rescale_factor: float = 1.0) -> jnp.ndarray:
    """Base inverse-frequency vector ('lang' mode, ref :102-107) with the
    NTK-aware rescale hook."""
    theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    return 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32)[: dim // 2] / dim))


class RotaryEmbedding(nn.Module):
    """Rotary position embedding with optional xpos length-decay
    (ref :83-189). Call with q/k of shape (B, H, T, D)."""
    dim: int
    theta: float = 10000.0
    use_xpos: bool = False
    xpos_scale_base: float = 512.0
    interpolate_factor: float = 1.0

    def _freqs_for(self, seq_len: int) -> jax.Array:
        pos = jnp.arange(seq_len, dtype=jnp.float32) / self.interpolate_factor
        inv = rotary_frequencies(self.dim, theta=self.theta)
        freqs = pos[:, None] * inv[None, :]
        return jnp.repeat(freqs, 2, axis=-1)  # (T, dim)

    def _scale_for(self, seq_len: int) -> jax.Array:
        scale = (jnp.arange(0, self.dim, 2) + 0.4 * self.dim) / (1.4 * self.dim)
        power = (jnp.arange(seq_len) - seq_len // 2) / self.xpos_scale_base
        s = scale[None, :] ** power[:, None]
        return jnp.concatenate([s, s], axis=-1)

    def rotate_queries_or_keys(self, t: jax.Array) -> jax.Array:
        assert not self.use_xpos, "xpos needs rotate_queries_and_keys"
        return apply_rotary_emb(self._freqs_for(t.shape[-2]), t)

    def rotate_queries_and_keys(self, q: jax.Array, k: jax.Array
                                ) -> Tuple[jax.Array, jax.Array]:
        seq_len = q.shape[-2]
        freqs = self._freqs_for(seq_len)
        scale = self._scale_for(seq_len)
        return (apply_rotary_emb(freqs, q, scale=scale),
                apply_rotary_emb(freqs, k, scale=scale ** -1))

    def __call__(self, q, k):
        if self.use_xpos:
            return self.rotate_queries_and_keys(q, k)
        return self.rotate_queries_or_keys(q), self.rotate_queries_or_keys(k)


def _relative_position_bucket(relative_position, causal: bool, num_buckets: int,
                              max_distance: int):
    """T5 bucket function (ref :202-221)."""
    ret = 0
    n = -relative_position
    if not causal:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """T5-style bucketed relative attention bias (ref :192-236)."""
    scale: float = 1.0
    causal: bool = False
    num_buckets: int = 32
    max_distance: int = 128
    heads: int = 8

    @nn.compact
    def __call__(self, q_len: int, k_len: int) -> jax.Array:
        emb = nn.Embed(self.num_buckets, self.heads,
                       embedding_init=nn.initializers.normal(0.02),
                       name="relative_attention_bias")
        q_pos = jnp.arange(q_len)[:, None]
        k_pos = jnp.arange(k_len)[None, :]
        rel = k_pos - q_pos
        buckets = _relative_position_bucket(rel, self.causal, self.num_buckets,
                                            self.max_distance)
        bias = emb(buckets)  # (q, k, h)
        return bias.transpose(2, 0, 1)[None] * self.scale  # (1, h, q, k)


class DynamicPositionBias(nn.Module):
    """MLP over log-distance producing per-head biases (ref :238-260)."""
    dim: int
    heads: int = 8
    depth: int = 2
    log_distance: bool = True

    @nn.compact
    def __call__(self, q_len: int, k_len: int) -> jax.Array:
        rel = (jnp.arange(k_len)[None, :] - jnp.arange(q_len)[:, None]).astype(jnp.float32)
        if self.log_distance:
            rel = jnp.sign(rel) * jnp.log1p(jnp.abs(rel))
        h = rel[..., None]
        for i in range(self.depth):
            h = nn.silu(nn.Dense(self.dim, name=f"fc{i}")(h))
        bias = nn.Dense(self.heads, name="out")(h)  # (q, k, h)
        return bias.transpose(2, 0, 1)[None]
