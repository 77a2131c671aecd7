"""Transformer building blocks for the MDT denoiser family.

Functional Flax re-design of the reference block library
(`mdt/models/networks/transformers/transformer_blocks.py:29-880`). Parity
details preserved deliberately:

* LayerNorm is biasless (weight-only) with eps=1e-5 (ref :29-38); the
  cross-attention pre-norm `ln3` inside `Block` is a *full* LayerNorm with
  bias (ref :205, torch default).
* Attention q/k/v projections carry bias (torch nn.Linear default, ref :86-88);
  the output projection bias follows the `bias` flag (ref :90).
* MLP uses exact (erf) GELU (torch nn.GELU default, ref :171).
* RMSNorm normalizes by the L2 norm * d^-1/2 clamped at eps (ref :43-51) —
  NOT the usual mean-square formulation.
* AdaLN-Zero is NOT zero-initialized (the reference comments the zero-init
  out, ref :256-257); all Linear kernels are N(0, 0.02), biases 0 — the
  reference's `_init_weights` (mdtv_transformer.py:197-206).
* `modulate(x, shift, scale) = shift + x * scale` (ref :262) — note: NOT the
  DiT `x * (1 + scale)` convention.

Dropout rngs use the 'dropout' collection; pass `deterministic=True` at eval.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from mdt_policy_tpu.ops.attention import sdpa

__all__ = [
    "dense_init",
    "mish",
    "BiaslessLayerNorm",
    "RMSNorm",
    "SwishGLU",
    "Attention",
    "MLP",
    "Block",
    "CrossAttentionOnlyBlock",
    "AdaLNZero",
    "modulate",
    "ConditionedBlock",
    "NoiseBlock",
    "TransformerEncoder",
    "TransformerDecoder",
    "TransformerFiLMDecoder",
    "MAPAttention",
    "MAPBlock",
    "MeanPooling",
    "ClipStyleProjection",
    "SinusoidalPosEmb",
    "SigmaEmbedding",
]

dense_init = nn.initializers.normal(stddev=0.02)


def _dense(features: int, use_bias: bool = True, name: Optional[str] = None,
           dtype=None) -> nn.Dense:
    return nn.Dense(features, use_bias=use_bias, kernel_init=dense_init,
                    bias_init=nn.initializers.zeros, name=name, dtype=dtype)


def mish(x: jax.Array) -> jax.Array:
    """Mish activation (torch nn.Mish; used by sigma/proprio MLPs)."""
    return x * jnp.tanh(jax.nn.softplus(x))


class BiaslessLayerNorm(nn.Module):
    """Weight-only LayerNorm, eps 1e-5 (ref transformer_blocks.py:29-38)."""
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, use_bias=self.use_bias,
                            use_scale=True)(x)


class RMSNorm(nn.Module):
    """L2-norm RMSNorm with clamped denominator (ref :43-51).

    `dtype` (None = promote normally): computation dtype — the f32 master
    param `g` is cast to it, so a bf16 input stays bf16 end to end (the
    frozen towers get this implicitly from bf16-cast params; trainable
    consumers like the gen decoder need the explicit cast)."""
    eps: float = 1e-8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,))
        if self.dtype is not None:
            g = g.astype(self.dtype)
        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True) * dim ** -0.5
        return (x / jnp.maximum(norm, self.eps).astype(x.dtype)) * g


class SwishGLU(nn.Module):
    """Gated linear unit with Swish gate (ref :55-62)."""
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        projected, gate = jnp.split(
            _dense(2 * self.out_dim, name="project", dtype=self.dtype)(x),
            2, axis=-1)
        return projected * jax.nn.silu(gate)


class Attention(nn.Module):
    """Unified self/cross attention (ref :66-158).

    Self-attention when `context is None`, cross-attention otherwise (q from x,
    k/v from context). q/k/v have bias; output projection bias = `bias` flag.
    """
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    causal: bool = False
    bias: bool = False
    use_rot_embed: bool = False
    rotary_xpos: bool = False
    # computation dtype (None = promote normally, the bit-parity default):
    # params stay f32; GEMMs/attention run in `dtype` and the caller's f32
    # residual stream re-promotes on the residual add — the TPU-native
    # analogue of the reference's AMP-16 training (conf/config.yaml:46)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True,
                 custom_attn_mask=None):
        B, T, C = x.shape
        hd = C // self.n_head
        kv_src = x if context is None else context
        q = _dense(C, name="query", dtype=self.dtype)(x)
        k = _dense(C, name="key", dtype=self.dtype)(kv_src)
        v = _dense(C, name="value", dtype=self.dtype)(kv_src)
        q = q.reshape(B, T, self.n_head, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, self.n_head, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, self.n_head, hd).transpose(0, 2, 1, 3)
        if self.use_rot_embed:
            # rotary over max(n_head//2, 32) dims (ref transformer_blocks.py:111)
            from .position_embeddings import RotaryEmbedding
            rot = RotaryEmbedding(max(self.n_head // 2, 32),
                                  use_xpos=self.rotary_xpos, name="rotary")
            q, k = rot(q, k)
            if self.dtype is not None:  # rotary tables are f32
                q, k = q.astype(self.dtype), k.astype(self.dtype)
        drop_active = self.attn_pdrop > 0 and not deterministic
        y = sdpa(q, k, v, causal=self.causal, mask=custom_attn_mask,
                 dropout_rate=self.attn_pdrop,
                 dropout_rng=self.make_rng("dropout") if drop_active else None,
                 deterministic=deterministic)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
        y = _dense(C, use_bias=self.bias, name="c_proj", dtype=self.dtype)(y)
        return nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)


class MLP(nn.Module):
    """4x GELU MLP (ref :161-180); exact erf GELU."""
    n_embd: int
    bias: bool = False
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None  # see Attention.dtype

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _dense(4 * self.n_embd, use_bias=self.bias, name="c_fc",
                   dtype=self.dtype)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = _dense(self.n_embd, use_bias=self.bias, name="c_proj",
                   dtype=self.dtype)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class Block(nn.Module):
    """Pre-LN block with optional cross-attention (ref :183-214)."""
    n_embd: int
    n_heads: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    causal: bool = False
    use_cross_attention: bool = False
    bias: bool = False
    dtype: Optional[jnp.dtype] = None  # see Attention.dtype

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True,
                 custom_attn_mask=None):
        x = x + Attention(self.n_embd, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                          causal=self.causal, bias=self.bias, dtype=self.dtype,
                          name="attn")(
            BiaslessLayerNorm(self.bias, name="ln_1")(x),
            deterministic=deterministic, custom_attn_mask=custom_attn_mask)
        if self.use_cross_attention and context is not None:
            # ln3 is a full (biased) LayerNorm in the reference (:205)
            x = x + Attention(self.n_embd, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                              causal=self.causal, bias=self.bias, dtype=self.dtype,
                              name="cross_att")(
                nn.LayerNorm(name="ln3")(x), context,
                deterministic=deterministic, custom_attn_mask=custom_attn_mask)
        x = x + MLP(self.n_embd, self.bias, self.mlp_pdrop, dtype=self.dtype,
                    name="mlp")(
            BiaslessLayerNorm(self.bias, name="ln_2")(x), deterministic=deterministic)
        return x


class CrossAttentionOnlyBlock(nn.Module):
    """Cross-attention + MLP block (ref :218-242)."""
    n_embd: int
    n_heads: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    causal: bool = False
    bias: bool = False
    dtype: Optional[jnp.dtype] = None  # see Attention.dtype

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True,
                 custom_attn_mask=None):
        x = x + Attention(self.n_embd, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                          causal=self.causal, bias=self.bias, dtype=self.dtype,
                          name="cross_att")(
            BiaslessLayerNorm(self.bias, name="ln_1")(x), context,
            deterministic=deterministic, custom_attn_mask=custom_attn_mask)
        x = x + MLP(self.n_embd, self.bias, self.mlp_pdrop, dtype=self.dtype,
                    name="mlp")(
            BiaslessLayerNorm(self.bias, name="ln_2")(x), deterministic=deterministic)
        return x


class AdaLNZero(nn.Module):
    """SiLU + Linear -> 6-way modulation chunk (ref :245-260).

    Deliberately NOT zero-initialized: the reference comments the zero-init
    out, and the published checkpoints were trained with N(0, 0.02) init.
    """
    hidden_size: int

    @nn.compact
    def __call__(self, c):
        mod = _dense(6 * self.hidden_size, name="modulation")(jax.nn.silu(c))
        return jnp.split(mod, 6, axis=-1)


def modulate(x, shift, scale):
    """shift + x*scale — the reference's convention (ref :262-263)."""
    return shift + x * scale


class ConditionedBlock(nn.Module):
    """Block with AdaLN(-Zero) conditioning on self-attn + MLP; plain
    cross-attention (ref :266-309)."""
    n_embd: int
    n_heads: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    causal: bool = False
    use_cross_attention: bool = False
    bias: bool = False
    film_cond_dim: int = 0
    dtype: Optional[jnp.dtype] = None  # see Attention.dtype

    @nn.compact
    def __call__(self, x, c, context=None, *, deterministic: bool = True,
                 custom_attn_mask=None):
        cond_dim = self.film_cond_dim or self.n_embd
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            AdaLNZero(cond_dim, name="adaLN_zero")(c)

        x_attn = modulate(BiaslessLayerNorm(self.bias, name="ln_1")(x), shift_msa, scale_msa)
        x = x + gate_msa * Attention(self.n_embd, self.n_heads, self.attn_pdrop,
                                     self.resid_pdrop, causal=self.causal, bias=self.bias,
                                     dtype=self.dtype, name="attn")(
            x_attn, deterministic=deterministic, custom_attn_mask=custom_attn_mask)

        if self.use_cross_attention and context is not None:
            x = x + Attention(self.n_embd, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                              causal=self.causal, bias=self.bias, dtype=self.dtype,
                              name="cross_att")(
                nn.LayerNorm(name="ln3")(x), context,
                deterministic=deterministic, custom_attn_mask=custom_attn_mask)

        x_mlp = modulate(BiaslessLayerNorm(self.bias, name="ln_2")(x), shift_mlp, scale_mlp)
        x = x + gate_mlp * MLP(self.n_embd, self.bias, self.mlp_pdrop,
                               dtype=self.dtype, name="mlp")(
            x_mlp, deterministic=deterministic)
        return x


class NoiseBlock(nn.Module):
    """Additive sigma-token conditioning alternative (ref :311-341)."""
    n_embd: int
    n_heads: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    causal: bool = False
    use_cross_attention: bool = False
    bias: bool = False
    dtype: Optional[jnp.dtype] = None  # see Attention.dtype

    @nn.compact
    def __call__(self, x, c, context=None, *, deterministic: bool = True,
                 custom_attn_mask=None):
        x = x + Attention(self.n_embd, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                          causal=self.causal, bias=self.bias, dtype=self.dtype,
                          name="attn")(
            BiaslessLayerNorm(self.bias, name="ln_1")(x) + c,
            deterministic=deterministic, custom_attn_mask=custom_attn_mask)
        if self.use_cross_attention and context is not None:
            x = x + Attention(self.n_embd, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                              causal=self.causal, bias=self.bias, dtype=self.dtype,
                              name="cross_att")(
                nn.LayerNorm(name="ln3")(x) + c, context,
                deterministic=deterministic, custom_attn_mask=custom_attn_mask)
        x = x + MLP(self.n_embd, self.bias, self.mlp_pdrop, dtype=self.dtype,
                    name="mlp")(
            BiaslessLayerNorm(self.bias, name="ln_2")(x), deterministic=deterministic)
        return x


class TransformerEncoder(nn.Module):
    """Non-causal block stack + final biasless LN (ref :344-380)."""
    embed_dim: int
    n_heads: int
    n_layers: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False
    dtype: Optional[jnp.dtype] = None  # see Attention.dtype

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, custom_attn_mask=None):
        for i in range(self.n_layers):
            x = Block(self.embed_dim, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                      self.mlp_pdrop, causal=False, bias=self.bias,
                      dtype=self.dtype, name=f"block_{i}")(
                x, deterministic=deterministic, custom_attn_mask=custom_attn_mask)
        return BiaslessLayerNorm(self.bias, name="ln")(x)


class TransformerDecoder(nn.Module):
    """Causal block stack with cross-attention (ref :467-505)."""
    embed_dim: int
    n_heads: int
    n_layers: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False
    use_cross_attention: bool = True
    dtype: Optional[jnp.dtype] = None  # see Attention.dtype

    @nn.compact
    def __call__(self, x, cond=None, *, deterministic: bool = True, custom_attn_mask=None):
        for i in range(self.n_layers):
            x = Block(self.embed_dim, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                      self.mlp_pdrop, causal=True, use_cross_attention=self.use_cross_attention,
                      bias=self.bias, dtype=self.dtype, name=f"block_{i}")(
                x, cond, deterministic=deterministic, custom_attn_mask=custom_attn_mask)
        return BiaslessLayerNorm(self.bias, name="ln")(x)


class TransformerFiLMDecoder(nn.Module):
    """Causal AdaLN-conditioned decoder (ref :509-569); NoiseBlock variant via
    `use_noise_encoder`."""
    embed_dim: int
    n_heads: int
    n_layers: int
    film_cond_dim: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False
    use_cross_attention: bool = True
    use_noise_encoder: bool = False
    dtype: Optional[jnp.dtype] = None  # see Attention.dtype

    @nn.compact
    def __call__(self, x, c, cond=None, *, deterministic: bool = True, custom_attn_mask=None):
        block_cls = NoiseBlock if self.use_noise_encoder else ConditionedBlock
        for i in range(self.n_layers):
            kwargs = {} if self.use_noise_encoder else {"film_cond_dim": self.film_cond_dim}
            x = block_cls(self.embed_dim, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                          self.mlp_pdrop, causal=True,
                          use_cross_attention=self.use_cross_attention,
                          bias=self.bias, dtype=self.dtype,
                          name=f"block_{i}", **kwargs)(
                x, c, cond, deterministic=deterministic, custom_attn_mask=custom_attn_mask)
        return BiaslessLayerNorm(self.bias, name="ln")(x)


class MAPAttention(nn.Module):
    """Multihead attention pooling attention (Set Transformer; ref :718-744)."""
    embed_dim: int
    n_heads: int

    @nn.compact
    def __call__(self, seed, x):
        B, K, C = seed.shape
        hd = C // self.n_heads
        q = nn.Dense(C, use_bias=False, kernel_init=dense_init, name="q")(seed)
        kv = nn.Dense(2 * C, use_bias=False, kernel_init=dense_init, name="kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, K, self.n_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, self.n_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, self.n_heads, hd).transpose(0, 2, 1, 3)
        out = sdpa(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, K, C)
        return _dense(C, name="proj")(out)


class MAPBlock(nn.Module):
    """Multiheaded attention pooling block with post-norm (ref :747-791)."""
    n_latents: int
    embed_dim: int
    n_heads: int
    output_dim: int
    mlp_ratio: float = 4.0
    do_rms_norm: bool = True
    do_swish_glu: bool = True

    @nn.compact
    def __call__(self, x):
        d = self.output_dim
        latents = self.param("latents", dense_init, (self.n_latents, d))
        latents = jnp.broadcast_to(latents[None], (x.shape[0], self.n_latents, d))
        projected = _dense(d, name="projection")(x)
        norm = (lambda n: RMSNorm(name=n)) if self.do_rms_norm else \
               (lambda n: nn.LayerNorm(epsilon=1e-6, name=n))
        latents = norm("attn_norm")(
            latents + MAPAttention(d, self.n_heads, name="attn")(latents, projected))
        hidden = int(self.mlp_ratio * d)
        if self.do_swish_glu:
            mlp_out = _dense(d, name="mlp_out")(SwishGLU(hidden, name="mlp_glu")(latents))
        else:
            mlp_out = _dense(d, name="mlp_out")(
                jax.nn.gelu(_dense(hidden, name="mlp_in")(latents), approximate=False))
        latents = norm("mlp_norm")(latents + mlp_out)
        return latents.squeeze(axis=1) if self.n_latents == 1 else latents


class MeanPooling(nn.Module):
    """Token-mean pooling (ref :873-879)."""
    token_dim: int

    def __call__(self, x):
        return jnp.mean(x, axis=1).reshape(-1, self.token_dim)


class ClipStyleProjection(nn.Module):
    """Latent -> contrastive-embedding head (ref :835-870).

    Styles: 'map' (default for MDT-V, token_dim=latent, 8 heads),
    'map_state_only', 'mean_pooling', 'mean_pool_state_only', 'mlp',
    'single_token', 'multihead'.
    """
    clip_style: str = "map"
    token_dim: int = 384
    clip_token_index: int = 0
    num_token: int = 4

    @nn.compact
    def __call__(self, x):
        style = self.clip_style
        if style == "single_token":
            return x[:, self.clip_token_index, :]
        if style in ("map_state_only", "mean_pool_state_only"):
            x = x[:, 1:]
        if style in ("map", "map_state_only"):
            return MAPBlock(1, self.token_dim, 8, output_dim=self.token_dim,
                            name="latent_proj")(x)
        if style in ("mean_pooling", "mean_pool_state_only"):
            return MeanPooling(self.token_dim, name="latent_proj")(x)
        if style == "mlp":
            x = x.reshape(x.shape[0], -1)
            x = _dense(self.token_dim, name="latent_proj")(x)
            return jnp.tanh(nn.LayerNorm(name="latent_norm")(x))
        if style == "multihead":
            return x
        raise ValueError(f"Invalid clip_style: {style!r}")


class SinusoidalPosEmb(nn.Module):
    """log-spaced sinusoidal embedding (ref mdtv_transformer.py:13-25)."""
    dim: int

    def __call__(self, x):
        half_dim = self.dim // 2
        emb_scale = jnp.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_scale)
        emb = x[..., None] * freqs
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class SigmaEmbedding(nn.Module):
    """Sinusoidal -> Linear(2d) -> Mish -> Linear(d) sigma embedding
    (ref mdtv_transformer.py:169-174)."""
    embed_dim: int

    @nn.compact
    def __call__(self, log_sigma):
        # log_sigma: (B, 1); output (B, 1, embed_dim)
        x = SinusoidalPosEmb(self.embed_dim, name="sin")(log_sigma)
        x = _dense(2 * self.embed_dim, name="fc1")(x)
        x = mish(x)
        return _dense(self.embed_dim, name="fc2")(x)


class TransformerEncoderInterleaved(nn.Module):
    """Encoder returning per-layer outputs for interleaved cross-attention
    decoders (ref transformer_blocks.py:383-423). The last entry is the
    final-LN output."""
    embed_dim: int
    n_heads: int
    n_layers: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        outputs = []
        for i in range(self.n_layers):
            x = Block(self.embed_dim, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                      self.mlp_pdrop, causal=False, bias=self.bias, name=f"block_{i}")(
                x, deterministic=deterministic)
            outputs.append(x)
        outputs[-1] = BiaslessLayerNorm(self.bias, name="ln")(x)
        return outputs


class TransformerFiLMEncoder(nn.Module):
    """Non-causal AdaLN-conditioned encoder (ref transformer_blocks.py:426-464)."""
    embed_dim: int
    n_heads: int
    n_layers: int
    film_cond_dim: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, x, c, *, deterministic: bool = True):
        for i in range(self.n_layers):
            x = ConditionedBlock(self.embed_dim, self.n_heads, self.attn_pdrop,
                                 self.resid_pdrop, self.mlp_pdrop, causal=False,
                                 bias=self.bias, film_cond_dim=self.film_cond_dim,
                                 name=f"block_{i}")(x, c, deterministic=deterministic)
        return BiaslessLayerNorm(self.bias, name="ln")(x)


class TransformerCrossAttentionEncoder(nn.Module):
    """Non-causal blocks with self+cross attention (ref :636-674)."""
    embed_dim: int
    n_heads: int
    n_layers: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, x, cond=None, *, deterministic: bool = True):
        for i in range(self.n_layers):
            x = Block(self.embed_dim, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                      self.mlp_pdrop, causal=False, use_cross_attention=True,
                      bias=self.bias, name=f"block_{i}")(
                x, cond, deterministic=deterministic)
        return BiaslessLayerNorm(self.bias, name="ln")(x)


class TransformerCrossAttentionOnlyEncoder(nn.Module):
    """Cross-attention-only block stack (ref :677-714)."""
    embed_dim: int
    n_heads: int
    n_layers: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, x, cond=None, *, deterministic: bool = True):
        for i in range(self.n_layers):
            x = CrossAttentionOnlyBlock(self.embed_dim, self.n_heads, self.attn_pdrop,
                                        self.resid_pdrop, self.mlp_pdrop, causal=False,
                                        bias=self.bias, name=f"block_{i}")(
                x, cond, deterministic=deterministic)
        return BiaslessLayerNorm(self.bias, name="ln")(x)


class SiamneseDecoder(nn.Module):
    """Non-causal cross-attention decoder (ref :794-832; reference spelling
    kept for API parity)."""
    embed_dim: int
    n_heads: int
    n_layers: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, x, cond=None, *, deterministic: bool = True):
        for i in range(self.n_layers):
            x = Block(self.embed_dim, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                      self.mlp_pdrop, causal=False, use_cross_attention=True,
                      bias=self.bias, name=f"block_{i}")(
                x, cond, deterministic=deterministic)
        return BiaslessLayerNorm(self.bias, name="ln")(x)


class TransformerFiLMDecoderInterleaved(nn.Module):
    """Causal AdaLN decoder cross-attending to per-layer encoder outputs
    (ref :572-633)."""
    embed_dim: int
    n_heads: int
    n_layers: int
    film_cond_dim: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_pdrop: float = 0.0
    bias: bool = False
    use_noise_encoder: bool = False

    @nn.compact
    def __call__(self, x, c, conds, *, deterministic: bool = True):
        block_cls = NoiseBlock if self.use_noise_encoder else ConditionedBlock
        for i in range(self.n_layers):
            kwargs = {} if self.use_noise_encoder else {"film_cond_dim": self.film_cond_dim}
            x = block_cls(self.embed_dim, self.n_heads, self.attn_pdrop,
                          self.resid_pdrop, self.mlp_pdrop, causal=True,
                          use_cross_attention=True, bias=self.bias,
                          name=f"block_{i}", **kwargs)(
                x, c, conds[i], deterministic=deterministic)
        return BiaslessLayerNorm(self.bias, name="ln")(x)
