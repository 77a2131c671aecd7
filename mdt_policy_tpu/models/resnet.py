"""ResNet-18 with GroupNorm — the MDT per-camera perceptual encoder.

TPU-native re-design of `BesoResNetEncoder`
(`mdt/models/perceptual_encoders/resnets.py:100-155`): torchvision resnet18
with every BatchNorm swapped for GroupNorm(C/16) (EMA-friendliness, ref
:119-126), global average pool, and a linear head to `latent_dim`.

NHWC layout throughout (TPU conv layout); weight names mirror torchvision's
module tree (conv1, layer{1..4}.{0,1}.conv{1,2}/downsample) so a checkpoint
converter can map published weights 1:1.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["ResNet18GN", "BesoResNetEncoder", "SpatialSoftmax"]


def _gn(channels: int, name: str) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=channels // 16, epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, name="conv1")(x)
        out = _gn(self.channels, "bn1")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = _gn(self.channels, "bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = _gn(self.channels, "downsample_norm")(identity)
        return jax.nn.relu(out + identity)


class ResNet18GN(nn.Module):
    """Headless resnet18 trunk with GroupNorm; input NHWC, output (B, 512)."""
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    channels: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = _gn(64, "bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, ch) in enumerate(zip(self.stage_sizes, self.channels)):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = BasicBlock(ch, stride, name=f"layer{stage + 1}_{b}")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool


class BesoResNetEncoder(nn.Module):
    """ResNet18-GN trunk + linear head to latent_dim (ref resnets.py:100-155).
    Accepts (B, H, W, C) or (B, T, H, W, C); returns (B, latent) / (B, T, latent)."""
    latent_dim: int = 512
    use_mlp: bool = True

    @nn.compact
    def __call__(self, x):
        time_series = x.ndim == 5
        if time_series:
            B, T = x.shape[:2]
            x = x.reshape((B * T,) + x.shape[2:])
        feats = ResNet18GN(name="backbone")(x)
        if self.use_mlp:
            feats = nn.Dense(self.latent_dim, name="fc")(feats)
        if time_series:
            feats = feats.reshape(B, T, -1)
        return feats


class SpatialSoftmax(nn.Module):
    """Spatial-softmax keypoint head (ref resnets.py:62-96): per-channel
    softmax over H*W, returns expected (x, y) per channel -> (B, C*2)."""
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        pos_x, pos_y = jnp.meshgrid(
            jnp.linspace(-1.0, 1.0, W), jnp.linspace(-1.0, 1.0, H))
        flat = x.transpose(0, 3, 1, 2).reshape(B * C, H * W)
        attn = jax.nn.softmax(flat / self.temperature, axis=1)
        ex = jnp.sum(pos_x.reshape(-1) * attn, axis=1)
        ey = jnp.sum(pos_y.reshape(-1) * attn, axis=1)
        return jnp.stack([ex, ey], axis=1).reshape(B, C * 2)
