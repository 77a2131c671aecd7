"""On-device batch preprocessing — the TPU replacement for the reference's
CPU torchvision transform pipelines (`mdt/utils/transforms.py`,
conf/datamodule/transforms/calvin_transforms.yaml).

The host loader ships raw uint8 NHWC frames; everything below is jnp and jits
into (or fuses with) the train step: resize, DrQ-v2 random shift aug, /255
scaling, CLIP normalization, Gaussian noise, proprio normalization. This
removes the documented CPU dataloader bottleneck (README.md:79-80 — ~2 GB of
decoded pixels per iteration through torchvision).

Production pipelines (calvin_transforms.yaml):
  rgb_static : Resize 224 -> RandomShift(pad 10) -> /255 -> CLIP-normalize
  rgb_gripper: Resize 84  -> RandomShift(pad 4)  -> /255 -> CLIP-normalize
  gen_static : Resize 112 -> /255 -> CLIP-normalize
  gen_gripper: Resize 112 -> /255 -> CLIP-normalize
  robot_obs  : NormalizeVector -> +N(0, 0.01)
(val pipelines: same without aug/noise; gripper val size 84.)
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mdt_policy_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

__all__ = [
    "resize_batch",
    "random_shift_aug",
    "scale_and_normalize",
    "add_gaussian_noise",
    "add_depth_noise",
    "normalize_vector",
    "relative_actions",
    "preprocess_rgb_train",
    "preprocess_rgb_eval",
]


def resize_batch(images: jax.Array, size: int) -> jax.Array:
    """Bilinear antialiased resize of (..., H, W, C) to (..., size, size, C)
    (torchvision Resize(size, antialias=True) equivalent)."""
    *lead, H, W, C = images.shape
    if H == size and W == size:
        return images.astype(jnp.float32)
    flat = images.reshape((-1, H, W, C)).astype(jnp.float32)
    out = jax.image.resize(flat, (flat.shape[0], size, size, C), method="linear",
                           antialias=True)
    return out.reshape((*lead, size, size, C))


def random_shift_aug(key: jax.Array, images: jax.Array, pad: int) -> jax.Array:
    """DrQ-v2 random shift (ref transforms.py:73-96): replicate-pad by `pad`,
    per-sample random integer crop back to (H, W). The reference samples
    integer shifts in [0, 2*pad] of a replicate-padded image and bilinearly
    samples on exact pixel centers — i.e. an integer crop, implemented here
    with vmapped dynamic_slice (cheaper than a gather-based grid sample).

    images: (B, H, W, C) float or uint8; returns float32 (B, H, W, C)."""
    B, H, W, C = images.shape
    assert H == W, "RandomShiftsAug expects square images"
    x = jnp.pad(images.astype(jnp.float32),
                ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    shifts = jax.random.randint(key, (B, 2), 0, 2 * pad + 1)

    def crop(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (H, W, C))

    return jax.vmap(crop)(x, shifts)


def scale_and_normalize(images: jax.Array,
                        mean: Tuple[float, ...] = CLIP_IMAGE_MEAN,
                        std: Tuple[float, ...] = CLIP_IMAGE_STD) -> jax.Array:
    """uint8-range -> [0,1] -> channel-normalized (ScaleImageTensor +
    Normalize, ref transforms.py:7-18 + yaml)."""
    x = images.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


def add_gaussian_noise(key: jax.Array, x: jax.Array, std: float = 0.01,
                       mean: float = 0.0) -> jax.Array:
    """(ref transforms.py:37-47)"""
    return x + jax.random.normal(key, x.shape, x.dtype) * std + mean


def normalize_vector(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """(ref transforms.py:21-34); zero stds are treated as 1."""
    std = jnp.where(std == 0.0, 1.0, std)
    return (x - mean) / std


def add_depth_noise(key: jax.Array, depth: jax.Array, shape: float = 1000.0,
                    rate: float = 1000.0,
                    sample_shape: Tuple[int, ...] = ()) -> jax.Array:
    """Multiplicative gamma noise on depth images (DexNet 2.0 style,
    ref transforms.py:50-70). The reference draws ONE gamma per transform
    call, i.e. per dataset sample (__getitem__ applies the pipeline
    per-sample); a batched caller passes sample_shape=(B,) to reproduce
    per-sample draws. Gamma(shape, rate) has mean shape/rate (=1 at
    defaults)."""
    noise = jax.random.gamma(key, shape, sample_shape) / rate
    noise = noise.reshape(sample_shape + (1,) * (depth.ndim - len(sample_shape)))
    return depth * noise.astype(depth.dtype)


def relative_actions(actions: jax.Array, robot_obs: jax.Array,
                     max_pos: float, max_orn: float) -> jax.Array:
    """Absolute -> relative actions (ref transforms.py:99-123)."""
    rel_pos = jnp.clip(actions[..., :3] - robot_obs[..., :3], -max_pos, max_pos) / max_pos
    diff = actions[..., 3:6] - robot_obs[..., 3:6]
    rel_orn = (diff + jnp.pi) % (2 * jnp.pi) - jnp.pi
    rel_orn = jnp.clip(rel_orn, -max_orn, max_orn) / max_orn
    return jnp.concatenate([rel_pos, rel_orn, actions[..., -1:]], axis=-1)


# ---------------------------------------------------------------------------
# Full camera pipelines
# ---------------------------------------------------------------------------

def _flatten_time(x):
    if x.ndim == 5:
        B, T = x.shape[:2]
        return x.reshape((B * T,) + x.shape[2:]), (B, T)
    return x, None


def _unflatten_time(x, bt):
    if bt is None:
        return x
    B, T = bt
    return x.reshape((B, T) + x.shape[1:])


def preprocess_rgb_train(key: jax.Array, images: jax.Array, *, size: int,
                         shift_pad: Optional[int],
                         out_dtype=jnp.bfloat16) -> jax.Array:
    """Train-time camera pipeline: resize -> random shift -> scale+normalize.
    images: (B, H, W, C) or (B, T, H, W, C) uint8. Output defaults to bf16 —
    camera frames feed the bf16 frozen towers and at production batch sizes
    float32 frames alone would cost ~GBs of HBM."""
    flat, bt = _flatten_time(images)
    x = resize_batch(flat, size)
    if shift_pad:
        x = random_shift_aug(key, x, shift_pad)
    x = scale_and_normalize(x).astype(out_dtype)
    return _unflatten_time(x, bt)


def preprocess_rgb_eval(images: jax.Array, *, size: int) -> jax.Array:
    """Eval-time camera pipeline: resize -> scale+normalize."""
    flat, bt = _flatten_time(images)
    x = scale_and_normalize(resize_batch(flat, size))
    return _unflatten_time(x, bt)
