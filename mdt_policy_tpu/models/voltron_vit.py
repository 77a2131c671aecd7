"""Voltron-style ViT components: RMSNorm + SwishGLU + LayerScale blocks,
patch embedding, 2D sin-cos position embeddings, and a ViT token encoder.

The reference consumes these from the external `voltron-robotics` package
(`mdt/models/img_generation/masked_transformer_decoder.py:12` imports
`voltron.models.util.transformer.Block`; `mdt/models/perceptual_encoders/
voltron_encoder.py` wraps the frozen `v-cond` ViT-S). This module provides
TPU-native equivalents: NHWC convolutions, float32 softmax, and a weight
layout designed for straightforward porting of the published Voltron
checkpoints.

Architecture (Karamcheti et al. 2023, Voltron):
  Block(x) = x + LayerScale1(Attn(RMSNorm(x)))
             x + LayerScale2(MLP(RMSNorm(x)))
  with MLP = SwishGLU(d -> mlp_ratio*d) -> Linear(-> d).

ViT-S/16 config (v-cond): depth 12, dim 384, heads 6, patch 16, input 224.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mdt_policy_tpu.ops.attention import sdpa
from .blocks import RMSNorm, SwishGLU

__all__ = [
    "get_1d_sincos_pos_embed",
    "get_2d_sincos_pos_embed",
    "PatchEmbed",
    "LayerScale",
    "VoltronBlock",
    "VoltronViT",
]


def _get_1d_sincos(dim: int, pos: np.ndarray) -> np.ndarray:
    """(ref masked_transformer_decoder.py:16-21)."""
    omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
    omega = 1.0 / (10000 ** omega)
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_1d_sincos_pos_embed(embed_dim: int, length: int) -> np.ndarray:
    return _get_1d_sincos(embed_dim, np.arange(length))


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """MAE-style 2D sin-cos PE (ref masked_transformer_decoder.py:29-42)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _get_1d_sincos(embed_dim // 2, grid[0])
    emb_w = _get_1d_sincos(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


class PatchEmbed(nn.Module):
    """Conv patchifier over NHWC images -> (B, n_patches, embed_dim)
    (ref masked_transformer_decoder.py:46-66, NHWC here for TPU layout)."""
    patch_size: int
    embed_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        # images: (B, H, W, C)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="proj", dtype=self.dtype)(images)
        B, h, w, d = x.shape
        return x.reshape(B, h * w, d)


class LayerScale(nn.Module):
    """Per-channel residual-branch scaling (CaiT); Voltron initializes at 0.1."""
    dim: int
    init_value: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (self.dim,))
        if self.dtype is not None:
            gamma = gamma.astype(self.dtype)
        return x * gamma


class _ViTAttention(nn.Module):
    """Fused-QKV multi-head attention (timm/Voltron layout for weight porting)."""
    dim: int
    n_heads: int
    fused_kernel: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        hd = C // self.n_heads
        qkv = nn.Dense(3 * C, use_bias=True, name="qkv", dtype=self.dtype)(x)
        if self.fused_kernel:
            # Pallas: per-head slicing + scores + softmax + PV all in VMEM,
            # straight off the packed qkv tensor (ops/fused_qkv_attention.py)
            from mdt_policy_tpu.ops.fused_qkv_attention import fused_qkv_attention
            y = fused_qkv_attention(qkv, self.n_heads)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            # bthd layout: no head transposes — the einsum attention contracts
            # the interleaved tensors directly (saves 4 full-activation copies
            # per layer at tower scale)
            q = q.reshape(B, T, self.n_heads, hd)
            k = k.reshape(B, T, self.n_heads, hd)
            v = v.reshape(B, T, self.n_heads, hd)
            y = sdpa(q, k, v, layout="bthd").reshape(B, T, C)
        return nn.Dense(C, use_bias=True, name="proj", dtype=self.dtype)(y)


class VoltronBlock(nn.Module):
    """RMSNorm + SwishGLU + LayerScale transformer block (Voltron's
    `models/util/transformer.Block`, consumed by the reference at
    masked_transformer_decoder.py:108-120)."""
    dim: int
    n_heads: int
    mlp_ratio: float = 4.0
    do_rms_norm: bool = True
    do_swish_glu: bool = True
    do_layer_scale: bool = True
    fused_kernel: bool = False
    mxu_norm: bool = False
    # computation dtype (None = promote normally). The frozen towers run
    # bf16 via bf16-CAST params; trainable consumers (gen decoder) keep f32
    # master params and set dtype=bf16 to compute in bf16.
    dtype: Optional[jnp.dtype] = None
    # flatten (B,T,C)->(B*T,C) for the norm/MLP segment, 3-D only around
    # attention. On TPU the 3-D mlp_out dot gets fused with the NEXT block's
    # RMSNorm stats into a kOutput fusion whose output layout is BATCH-MINOR
    # ({0,2,1}) — measured ~2.11 ms vs ~1.2 ms ideal per layer at the
    # production batch, plus layout-fix copies before the attention
    # custom-call. 2-D operands leave layout assignment only row-major-ish
    # choices. Pure reshapes: identical math, identical param tree.
    two_d: bool = False

    @nn.compact
    def __call__(self, x):
        if self.mxu_norm:
            # MXU-stats drop-ins (ops/mxu_norm.py): same param trees
            from mdt_policy_tpu.ops.mxu_norm import MXULayerNorm, MXURMSNorm
            norm = (lambda n: MXURMSNorm(name=n)) if self.do_rms_norm else \
                   (lambda n: MXULayerNorm(epsilon=1e-6, name=n))
        else:
            norm = (lambda n: RMSNorm(name=n, dtype=self.dtype)) \
                if self.do_rms_norm else \
                   (lambda n: nn.LayerNorm(epsilon=1e-6, name=n, dtype=self.dtype))
        B, T, C = x.shape
        two_d = self.two_d
        if two_d:
            x = x.reshape(B * T, C)
        to3 = (lambda v: v.reshape(B, T, C)) if two_d else (lambda v: v)
        to2 = (lambda v: v.reshape(B * T, C)) if two_d else (lambda v: v)
        attn_out = to2(_ViTAttention(self.dim, self.n_heads,
                         fused_kernel=self.fused_kernel, dtype=self.dtype,
                         name="attn")(to3(norm("norm1")(x))))
        if self.do_layer_scale:
            attn_out = LayerScale(self.dim, name="ls1", dtype=self.dtype)(attn_out)
        x = x + attn_out
        h = norm("norm2")(x)
        hidden = int(self.mlp_ratio * self.dim)
        if self.do_swish_glu:
            h = SwishGLU(hidden, name="mlp_glu", dtype=self.dtype)(h)
        else:
            h = jax.nn.gelu(nn.Dense(hidden, name="mlp_in", dtype=self.dtype)(h),
                            approximate=False)
        mlp_out = nn.Dense(self.dim, name="mlp_out", dtype=self.dtype)(h)
        if self.do_layer_scale:
            mlp_out = LayerScale(self.dim, name="ls2", dtype=self.dtype)(mlp_out)
        return to3(x + mlp_out)


class _VoltronScanShim(nn.Module):
    """nn.scan carrier: (carry, None) -> (carry, None) around VoltronBlock.
    Params live under <scan>/block/... stacked on a leading depth axis
    (models/layer_stack.py converts to/from the per-layer layout)."""
    dim: int
    n_heads: int
    mlp_ratio: float
    fused_kernel: bool
    two_d: bool = False

    @nn.compact
    def __call__(self, x, _):
        y = VoltronBlock(self.dim, self.n_heads, self.mlp_ratio,
                         fused_kernel=self.fused_kernel, two_d=self.two_d,
                         name="block")(x)
        return y, None


class VoltronViT(nn.Module):
    """ViT token encoder standing in for the frozen Voltron `v-cond` backbone
    (ref mdt/models/perceptual_encoders/voltron_encoder.py:72-105): returns the
    full patch-token grid, e.g. (B, 196, 384) for 224px/16 ViT-S.

    scan_layers: run the depth-12 stack as ONE block under lax.scan over
    stacked params (same math, smaller/faster-to-trace program;
    models/layer_stack.py has the param-layout converters and the
    measured numbers)."""
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    n_heads: int = 6
    mlp_ratio: float = 4.0
    img_size: int = 224
    fused_attention: bool = False
    mxu_norm: bool = False
    scan_layers: bool = False
    blocks_2d: bool = False  # see VoltronBlock.two_d

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        # images: (B, H, W, C) in [0,1]-normalized space
        x = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")(images)
        grid = self.img_size // self.patch_size
        pe = get_2d_sincos_pos_embed(self.embed_dim, grid)
        # keep the compute dtype (bf16 path): a float32 constant would silently
        # upcast every downstream op
        x = x + jnp.asarray(pe, x.dtype)[None]
        if self.scan_layers:
            assert not self.mxu_norm, "scan_layers + mxu_norm not wired"
            scan = nn.scan(_VoltronScanShim,
                           variable_axes={"params": 0},
                           split_rngs={"params": True},
                           length=self.depth)
            x, _ = scan(self.embed_dim, self.n_heads, self.mlp_ratio,
                        fused_kernel=self.fused_attention,
                        two_d=self.blocks_2d, name="blocks")(x, None)
        else:
            for i in range(self.depth):
                x = VoltronBlock(self.embed_dim, self.n_heads, self.mlp_ratio,
                                 fused_kernel=self.fused_attention,
                                 mxu_norm=self.mxu_norm,
                                 two_d=self.blocks_2d,
                                 name=f"block_{i}")(x)
        if self.mxu_norm:
            from mdt_policy_tpu.ops.mxu_norm import MXULayerNorm
            return MXULayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)
