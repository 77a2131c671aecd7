"""CLIP text + vision towers (goal encoders), TPU-native.

The reference vendors the full OpenAI CLIP model and uses it frozen:
* visual goal  = `DefaultVisionClip` — CLIP ViT-B/16 `encode_image` -> 512-d
  (`mdt/models/perceptual_encoders/vision_clip.py:33-47`, conf/config.yaml
  `vis_clip_model_name: ViT-B/16`)
* language goal = `LangClip` — CLIP ViT-B/32 text tower `encode_text`
  (`mdt/models/networks/clip_lang_encoder.py:9-28`).

This module implements both towers in Flax with the standard CLIP
architecture (pre-LN transformer, QuickGELU, packed-qkv attention) so
published weights port 1:1. No weights are downloaded: use
`mdt_policy_tpu.utils.torch_port.port_clip_weights` with a local OpenAI
checkpoint, or random init for smoke tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from mdt_policy_tpu.ops.attention import sdpa

__all__ = ["CLIPVisionTower", "CLIPTextTower", "CLIPResNetTower",
           "AttentionPool2d", "CLIP_CONFIGS", "clip_config_from_state_dict",
           "quick_gelu"]


# Tower hyperparameters of the OpenAI releases the reference uses
# (mdt/models/networks/clip.py:467-517 derives these from checkpoint shapes).
# `vision_layers` as a tuple marks the ModifiedResNet family (per-stage
# Bottleneck counts); an int marks a ViT tower — the same convention the
# reference's build_model uses.
CLIP_CONFIGS = {
    "ViT-B/16": dict(embed_dim=512, image_resolution=224, vision_layers=12,
                     vision_width=768, vision_patch_size=16, context_length=77,
                     vocab_size=49408, transformer_width=512, transformer_heads=8,
                     transformer_layers=12),
    "ViT-B/32": dict(embed_dim=512, image_resolution=224, vision_layers=12,
                     vision_width=768, vision_patch_size=32, context_length=77,
                     vocab_size=49408, transformer_width=512, transformer_heads=8,
                     transformer_layers=12),
    "RN50": dict(embed_dim=1024, image_resolution=224,
                 vision_layers=(3, 4, 6, 3), vision_width=64,
                 vision_patch_size=None, context_length=77, vocab_size=49408,
                 transformer_width=512, transformer_heads=8,
                 transformer_layers=12),
    "RN101": dict(embed_dim=512, image_resolution=224,
                  vision_layers=(3, 4, 23, 3), vision_width=64,
                  vision_patch_size=None, context_length=77, vocab_size=49408,
                  transformer_width=512, transformer_heads=8,
                  transformer_layers=12),
}


def clip_config_from_state_dict(sd) -> dict:
    """Derive the tower hyperparameters from an OpenAI CLIP checkpoint's
    tensor shapes — the reference's `build_model` logic
    (mdt/models/networks/clip.py:467-495) without constructing any module.

    Works on both families: `visual.proj` marks a ViT tower; otherwise the
    per-stage Bottleneck counts are recovered from the `visual.layerN.*`
    key numbering and the stem width from `visual.conv1`."""
    import re

    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len([k for k in sd
                             if re.fullmatch(r"visual\.transformer\.resblocks"
                                             r"\.\d+\.attn\.in_proj_weight", k)])
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        # round() like the reference build_model (clip.py:469): int() would
        # truncate a float-imprecise sqrt of a large perfect square to grid-1
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
        embed_dim = sd["visual.proj"].shape[1]
    else:
        counts = [len(set(re.findall(rf"visual\.layer{b}\.(\d+)", " ".join(sd))))
                  for b in (1, 2, 3, 4)]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        vision_patch_size = None
        output_width = round(  # round(), not int(): see grid above (ref :479)
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = output_width * 32
        embed_dim = sd["visual.attnpool.c_proj.weight"].shape[0]
    return dict(
        embed_dim=embed_dim, image_resolution=image_resolution,
        vision_layers=vision_layers, vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len([k for k in sd
                                if re.fullmatch(r"transformer\.resblocks\.\d+"
                                                r"\.attn\.in_proj_weight", k)]),
    )


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(name: str, mxu: bool) -> nn.Module:
    """LayerNorm factory: flax lowering or the MXU-stats drop-in
    (ops/mxu_norm.py — identical param tree, bf16-ULP-level numerics)."""
    if mxu:
        from mdt_policy_tpu.ops.mxu_norm import MXULayerNorm
        return MXULayerNorm(epsilon=1e-5, name=name)
    return nn.LayerNorm(epsilon=1e-5, name=name)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False
    fused_kernel: bool = False
    mxu_norm: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        h = _ln("ln_1", self.mxu_norm)(x)
        qkv = nn.Dense(3 * C, name="in_proj")(h)
        if self.fused_kernel:
            # Pallas: per-head slicing + scores + softmax + PV in VMEM off
            # the packed qkv tensor (ops/fused_qkv_attention.py)
            from mdt_policy_tpu.ops.fused_qkv_attention import fused_qkv_attention
            attn = fused_qkv_attention(qkv, self.heads, self.causal)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hd = C // self.heads
            # bthd layout: contract head-interleaved tensors directly (no
            # transpose copies — tower-scale HBM savings, identical numerics)
            q = q.reshape(B, T, self.heads, hd)
            k = k.reshape(B, T, self.heads, hd)
            v = v.reshape(B, T, self.heads, hd)
            attn = sdpa(q, k, v, causal=self.causal, layout="bthd").reshape(B, T, C)
        x = x + nn.Dense(C, name="out_proj")(attn)
        h = _ln("ln_2", self.mxu_norm)(x)
        h = nn.Dense(4 * C, name="c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(C, name="c_proj")(h)
        return x


class _CLIPScanShim(nn.Module):
    """nn.scan carrier around ResidualAttentionBlock; params stack under
    <scan>/block/... on a leading depth axis (models/layer_stack.py)."""
    width: int
    heads: int
    causal: bool
    fused_kernel: bool

    @nn.compact
    def __call__(self, x, _):
        y = ResidualAttentionBlock(self.width, self.heads, causal=self.causal,
                                   fused_kernel=self.fused_kernel,
                                   name="block")(x)
        return y, None


def _apply_blocks(x, *, layers, width, heads, causal, fused, mxu_norm,
                  scan_layers, name_prefix="resblock_"):
    """The 12-block stack: unrolled (per-layer params, checkpoint layout)
    or one lax.scan block over stacked params (smaller/faster-to-trace
    program; measured numbers in models/layer_stack.py)."""
    if scan_layers:
        assert not mxu_norm, "scan_layers + mxu_norm not wired"
        scan = nn.scan(_CLIPScanShim,
                       variable_axes={"params": 0},
                       split_rngs={"params": True},
                       length=layers)
        x, _ = scan(width, heads, causal, fused, name="blocks")(x, None)
        return x
    for i in range(layers):
        x = ResidualAttentionBlock(width, heads, causal=causal,
                                   fused_kernel=fused, mxu_norm=mxu_norm,
                                   name=f"{name_prefix}{i}")(x)
    return x


class CLIPVisionTower(nn.Module):
    """CLIP ViT image encoder -> (B, embed_dim) (ref clip.py:266-307)."""
    embed_dim: int = 512
    image_resolution: int = 224
    layers: int = 12
    width: int = 768
    patch_size: int = 16
    heads: int = 0  # 0 -> width // 64 (the OpenAI convention)
    fused_attention: bool = False
    mxu_norm: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        # images: (B, H, W, C), CLIP-normalized
        B = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", use_bias=False, name="conv1")(images)
        x = x.reshape(B, -1, self.width)
        scale = self.width ** -0.5
        cls = self.param("class_embedding", nn.initializers.normal(scale), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], axis=1)
        n_pos = (self.image_resolution // self.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(scale),
                         (n_pos, self.width))
        x = x + pos[None]
        x = _ln("ln_pre", self.mxu_norm)(x)
        heads = self.heads or max(self.width // 64, 1)
        x = _apply_blocks(x, layers=self.layers, width=self.width, heads=heads,
                          causal=False, fused=self.fused_attention,
                          mxu_norm=self.mxu_norm, scan_layers=self.scan_layers)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(scale),
                          (self.width, self.embed_dim))
        return x @ proj


class CLIPTextTower(nn.Module):
    """CLIP text encoder -> (B, embed_dim), pooled at the EOT (argmax) token
    (ref clip.py:310-466 encode_text path)."""
    embed_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    fused_attention: bool = False
    mxu_norm: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        # tokens: (B, context_length) int32
        tok_emb = nn.Embed(self.vocab_size, self.width,
                           embedding_init=nn.initializers.normal(0.02),
                           name="token_embedding")
        x = tok_emb(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = x + pos[None]
        x = _apply_blocks(x, layers=self.layers, width=self.width,
                          heads=self.heads, causal=True,
                          fused=self.fused_attention, mxu_norm=self.mxu_norm,
                          scan_layers=self.scan_layers)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # pool at EOT token = highest token id per sequence
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1).squeeze(1)
        proj = self.param("text_projection", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.embed_dim))
        return pooled @ proj


class _FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d with running statistics stored as plain
    params (scale, bias, mean, var). The RN towers are only ever used frozen
    (goal encoders), so there is no train-mode statistics update and no
    mutable `batch_stats` collection — the whole tower stays a pure function
    of its params, like every other frozen tower here. Port maps torch's
    weight/bias/running_mean/running_var 1:1."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        inv = (scale / jnp.sqrt(var + self.epsilon)).astype(x.dtype)
        return x * inv + (bias - mean * scale
                          / jnp.sqrt(var + self.epsilon)).astype(x.dtype)


def _avg_pool(x, stride: int):
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class _Bottleneck(nn.Module):
    """CLIP's anti-aliased Bottleneck (ref clip.py:43-91): all convs stride
    1; when stride > 1 an avgpool runs after conv2 and prefixes the
    downsample branch."""
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        out_ch = self.planes * self.expansion
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = jax.nn.relu(_FrozenBatchNorm(name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = jax.nn.relu(_FrozenBatchNorm(name="bn2")(h))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = _FrozenBatchNorm(name="bn3")(h)
        if self.stride > 1 or inplanes != out_ch:
            idn = _avg_pool(x, self.stride) if self.stride > 1 else x
            idn = nn.Conv(out_ch, (1, 1), use_bias=False,
                          name="downsample_conv")(idn)
            idn = _FrozenBatchNorm(name="downsample_norm")(idn)
        else:
            idn = x
        return jax.nn.relu(h + idn)


class AttentionPool2d(nn.Module):
    """CLIP's QKV attention pool (ref clip.py:93-130): tokens = [mean; grid]
    + learned positions, multi-head attention, output = attended mean token.

    TPU shape: only the mean token is ever read out, so the query block is
    computed for that ONE token (q length 1) instead of materializing the
    full (HW+1)^2 score matrix the torch module builds and throws away —
    identical math for the returned row."""
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    spacial_dim: int = 7

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens],
                                 axis=1)  # (B, HW+1, C)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(C ** -0.5),
                         (self.spacial_dim ** 2 + 1, self.embed_dim))
        tokens = tokens + pos[None].astype(tokens.dtype)
        q = nn.Dense(self.embed_dim, name="q_proj")(tokens[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, name="v_proj")(tokens)
        hd = self.embed_dim // self.num_heads
        q = q.reshape(B, 1, self.num_heads, hd)
        k = k.reshape(B, -1, self.num_heads, hd)
        v = v.reshape(B, -1, self.num_heads, hd)
        out = sdpa(q, k, v, layout="bthd").reshape(B, self.embed_dim)
        return nn.Dense(self.output_dim or self.embed_dim, name="c_proj")(out)


class CLIPResNetTower(nn.Module):
    """CLIP's ModifiedResNet image encoder (RN50-family) -> (B, embed_dim)
    (ref clip.py:134-206): 3-conv anti-aliased stem with avgpool, four
    Bottleneck stages, attention pooling instead of global average. NHWC
    throughout; always used frozen (see _FrozenBatchNorm)."""
    embed_dim: int = 1024
    layers: tuple = (3, 4, 6, 3)
    width: int = 64
    image_resolution: int = 224
    heads: int = 0  # 0 -> width * 32 // 64 (the OpenAI convention)

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        # images: (B, H, W, 3), CLIP-normalized
        x = images
        for i, ch in ((1, self.width // 2), (2, self.width // 2),
                      (3, self.width)):
            x = nn.Conv(ch, (3, 3), strides=2 if i == 1 else 1, padding=1,
                        use_bias=False, name=f"conv{i}")(x)
            x = jax.nn.relu(_FrozenBatchNorm(name=f"bn{i}")(x))
        x = _avg_pool(x, 2)
        for stage, blocks in enumerate(self.layers):
            planes = self.width * (2 ** stage)
            for b in range(blocks):
                x = _Bottleneck(planes, stride=2 if (b == 0 and stage > 0)
                                else 1, name=f"layer{stage + 1}_{b}")(x)
        feat_dim = self.width * 32
        return AttentionPool2d(
            embed_dim=feat_dim, num_heads=self.heads or feat_dim // 64,
            output_dim=self.embed_dim, spacial_dim=self.image_resolution // 32,
            name="attnpool")(x)


# CLIP preprocessing constants (ref clip.py preprocessing / masked decoder :321-322)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(images: jax.Array) -> jax.Array:
    """Normalize [0,1] NHWC images with CLIP statistics."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (images - mean) / std
