"""Small perceptual-encoder components completing the SURVEY §2.4 inventory.

* NoEncoder — identity marker used to disable a goal/img-gen head; agents
  gate aux losses on it (ref mdt/models/perceptual_encoders/no_encoder.py,
  mdt_agent.py:239,314,352).
* VisionClipHead — CLIP image tower + 2-layer ReLU head (ref
  vision_clip.py:8-31 `VisionClip`).
* TokenVisionClip behavior (intermediate token features) is covered by
  CLIPVisionTower with pooling disabled — see `CLIPVisionTokens`.
* VoltronMAPEncoder — Voltron tokens + MAP extractor head (ref
  voltron_encoder.py:21-70 `VoltronEncoder`).
* Time-embedding modules from the EDM utils (GaussianFourier, FourierFeatures;
  ref mdt/models/edm_diffusion/utils.py:22-115).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import MAPBlock, SinusoidalPosEmb, mish
from .clip import CLIPVisionTower
from .voltron_vit import VoltronViT

__all__ = ["NoEncoder", "VisionClipHead", "CLIPVisionTokens",
           "VoltronMAPEncoder", "GaussianFourierEmbedding", "FourierFeatures",
           "SinusoidalTimeEmbedding"]


class NoEncoder(nn.Module):
    """Identity passthrough; `isinstance(x, NoEncoder)` disables the
    corresponding aux loss in agents."""

    def __call__(self, x=None, *args, **kwargs):
        return x


class VisionClipHead(nn.Module):
    """Frozen CLIP image tower + trainable fc head (ref vision_clip.py:8-31
    `VisionClip`). The reference defaults to model_name='RN50' (1024-d
    tower output, fc1 1024->512) with 'ViT-B/32' (512-d, fc1 512->256) as
    the alternative; `family` selects the tower and the matching head
    widths."""
    visual_features: int = 64
    clip_embed_dim: int = 512
    family: str = "vit"   # "vit" | "resnet" (the reference's RN50 default)
    tower_kwargs: dict = None

    @nn.compact
    def __call__(self, images):
        if self.family == "resnet":
            from .clip import CLIPResNetTower
            tower = CLIPResNetTower(embed_dim=self.clip_embed_dim,
                                    **(self.tower_kwargs or {}), name="clip")
            fc1_width = 512   # ref: nn.Linear(1024, 512) for RN50
        else:
            tower = CLIPVisionTower(embed_dim=self.clip_embed_dim,
                                    **(self.tower_kwargs or {}), name="clip")
            fc1_width = 256   # ref: nn.Linear(512, 256) for ViT-B/32
        x = jax.lax.stop_gradient(tower(images))
        x = jax.nn.relu(nn.Dense(fc1_width, name="fc1")(x))
        return nn.Dense(self.visual_features, name="fc2")(x)


class CLIPVisionTokens(nn.Module):
    """CLIP ViT token grid without pooling (the `TokenVisionClip` role,
    ref vision_clip.py:50-64)."""
    width: int = 768
    layers: int = 12
    patch_size: int = 16
    image_resolution: int = 224

    @nn.compact
    def __call__(self, images):
        from .clip import ResidualAttentionBlock
        B = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    use_bias=False, name="conv1")(images)
        x = x.reshape(B, -1, self.width)
        scale = self.width ** -0.5
        cls = self.param("class_embedding", nn.initializers.normal(scale), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], axis=1)
        n_pos = (self.image_resolution // self.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(scale),
                         (n_pos, self.width))
        x = x + pos[None]
        x = nn.LayerNorm(name="ln_pre")(x)
        heads = max(self.width // 64, 1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, heads, name=f"resblock_{i}")(x)
        return x  # (B, 1+n_patches, width)


class VoltronMAPEncoder(nn.Module):
    """Frozen Voltron tokens + trainable MAP pooling head to `latent_dim`
    (ref voltron_encoder.py:21-70)."""
    latent_dim: int = 512
    n_latents: int = 1
    vit_kwargs: dict = None

    @nn.compact
    def __call__(self, images):
        vit = VoltronViT(**(self.vit_kwargs or {}), name="vcond")
        tokens = jax.lax.stop_gradient(vit(images))
        return MAPBlock(self.n_latents, tokens.shape[-1], 8,
                        output_dim=self.latent_dim, name="vector_extractor")(tokens)


class GaussianFourierEmbedding(nn.Module):
    """Gaussian random features + MLP time embedding
    (ref edm_diffusion/utils.py:22-63)."""
    time_embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, t):
        W = self.param("W", nn.initializers.normal(self.scale),
                       (self.time_embed_dim // 2,))
        W = jax.lax.stop_gradient(W)  # fixed random features
        proj = t[..., None] * W * 2 * jnp.pi
        h = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        h = nn.Dense(2 * self.time_embed_dim, name="fc1")(h)
        return nn.Dense(self.time_embed_dim, name="fc2")(mish(h))


class FourierFeatures(nn.Module):
    """Unit-normal Fourier features (ref edm_diffusion/utils.py:35-47)."""
    time_embed_dim: int
    std: float = 1.0

    @nn.compact
    def __call__(self, t):
        if t.ndim == 1:
            t = t[:, None]
        W = self.param("weight", nn.initializers.normal(self.std),
                       (self.time_embed_dim // 2, t.shape[-1]))
        f = 2 * jnp.pi * t @ jax.lax.stop_gradient(W).T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class SinusoidalTimeEmbedding(nn.Module):
    """Sinusoidal + Linear-Mish-Linear (ref edm_diffusion/utils.py:66-79)."""
    time_embed_dim: int

    @nn.compact
    def __call__(self, t):
        h = SinusoidalPosEmb(self.time_embed_dim, name="sin")(t)
        h = nn.Dense(2 * self.time_embed_dim, name="fc1")(h)
        return nn.Dense(self.time_embed_dim, name="fc2")(mish(h))
