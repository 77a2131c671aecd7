"""Masked generative foresight decoder (MAE-style).

Functional Flax re-design of the reference `MaskedTransformerImgDecoder`
(`mdt/models/img_generation/masked_transformer_decoder.py:69-302`): given the
denoiser's encoder context, reconstruct masked patches of TWO future camera
frames (gen_static + gen_gripper @ 112px, patch 16 -> 49 patches each).

TPU-first changes:
* images are NHWC;
* the random symmetric mask uses argsort of uniform noise with a static
  `n_keep` — fixed shapes under jit, explicit 'mask' rng (the SURVEY §7
  "masked foresight under jit" hard part);
* the decoder returns (reconstructions, mask, restore_idxs, visible) as
  values, no module state.

Parity details kept: decoder PE is added twice (pre-mask at ref :221 and
post-unshuffle at ref :254-256 — faithful to the reference); mask convention
0=keep / 1=masked; per-image ctx embedding `ctx_dec_pe`; loss is per-patch MSE
on masked patches, averaged over the two frames (ref :274-302).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from .voltron_vit import PatchEmbed, VoltronBlock, get_2d_sincos_pos_embed
from .blocks import RMSNorm, dense_init


class MaskedTransformerImgDecoder(nn.Module):
    resolution: int = 112
    patch_size: int = 16
    decoder_depth: int = 6
    decoder_embed_dim: int = 192
    decoder_n_heads: int = 8
    context_dim: int = 384
    mlp_ratio: float = 4.0
    in_channels: int = 3
    mask_ratio: float = 0.75
    num_images: int = 2
    norm_pixel_loss: bool = True
    # computation dtype (None = float32 promotion, the parity default).
    # bfloat16 halves the decoder's HBM traffic; master params stay f32 and
    # the loss always accumulates in f32 (compute_loss casts).
    dtype: "jnp.dtype | None" = None

    @property
    def num_patches(self) -> int:
        return (self.resolution // self.patch_size) ** 2

    @property
    def n_keep(self) -> int:
        return int(self.num_patches * (1 - self.mask_ratio))

    def setup(self):
        self.patch2embed = PatchEmbed(self.patch_size, self.decoder_embed_dim,
                                      dtype=self.dtype, name="patch2embed")
        self.encoder2decoder = nn.Dense(self.decoder_embed_dim,
                                        kernel_init=nn.initializers.xavier_uniform(),
                                        dtype=self.dtype, name="encoder2decoder")
        self.mask_token = self.param("mask_token", dense_init,
                                     (1, 1, self.decoder_embed_dim))
        self.ctx_dec_pe = self.param("ctx_dec_pe", nn.initializers.normal(1.0),
                                     (1, 2, 1, self.decoder_embed_dim))
        self.decoder_blocks = [
            VoltronBlock(self.decoder_embed_dim, self.decoder_n_heads, self.mlp_ratio,
                         do_rms_norm=True, do_swish_glu=True, do_layer_scale=True,
                         dtype=self.dtype, name=f"block_{i}")
            for i in range(self.decoder_depth)
        ]
        self.decoder_norm = RMSNorm(dtype=self.dtype, name="decoder_norm")
        self.decoder_patch_prediction = nn.Dense(
            (self.patch_size ** 2) * self.in_channels,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="decoder_patch_prediction")

    def _decoder_pe(self) -> jax.Array:
        grid = self.resolution // self.patch_size
        return jnp.asarray(get_2d_sincos_pos_embed(self.decoder_embed_dim, grid))[None]

    def patchify(self, imgs: jax.Array) -> jax.Array:
        """(B, ctx, H, W, C) -> (B, ctx, n_patches, ph*pw*C), channel-last
        ordering matching the reference's '(ph pw c)' target layout (ref :195-202)."""
        return rearrange(
            imgs,
            "b t (h ph) (w pw) c -> b t (h w) (ph pw c)",
            ph=self.patch_size, pw=self.patch_size,
        )

    def mask(self, ctx_patches: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Symmetric per-context random masking via argsort (ref :126-149).
        Returns (visible (B,ctx,n_keep,d), mask (B,n_patches) 0=keep,
        restore_idxs (B,n_patches))."""
        B, ctx_len, n_patches, d = ctx_patches.shape
        noise = jax.random.uniform(self.make_rng("mask"), (B, n_patches))
        shuffle_idxs = jnp.argsort(noise, axis=1)
        restore_idxs = jnp.argsort(shuffle_idxs, axis=1)
        keep = shuffle_idxs[:, : self.n_keep]
        visible = jnp.take_along_axis(ctx_patches, keep[:, None, :, None], axis=2)
        mask = jnp.ones((B, n_patches), ctx_patches.dtype).at[:, : self.n_keep].set(0.0)
        mask = jnp.take_along_axis(mask, restore_idxs, axis=1)
        return visible, mask, restore_idxs

    def __call__(self, context: jax.Array, target_images: jax.Array,
                 img_gen_frame_diff: int = 3):
        """context: (B, ctx_tokens, context_dim); target_images:
        (B, num_images, H, W, C). Returns (recon, mask, restore_idxs, visible)
        (ref :204-272)."""
        B = context.shape[0]
        cast = (lambda a: a.astype(self.dtype)) if self.dtype is not None \
            else (lambda a: a)
        emb_context = self.encoder2decoder(context)

        flat = rearrange(target_images, "b t h w c -> (b t) h w c")
        patches = self.patch2embed(flat)
        dec_pe = cast(self._decoder_pe())
        ctx_patches = rearrange(patches + dec_pe, "(b t) s d -> b t s d",
                                t=self.num_images)
        visible_ctx, mask, restore_idxs = self.mask(ctx_patches)

        n_masked = self.num_patches - self.n_keep
        mask_tokens = jnp.broadcast_to(
            cast(self.mask_token)[:, None],
            (B, self.num_images, n_masked, self.decoder_embed_dim))
        concatenated = jnp.concatenate([visible_ctx, mask_tokens], axis=2)
        unshuffled = jnp.take_along_axis(
            concatenated, restore_idxs[:, None, :, None], axis=2)

        # PE added a second time + per-image context embedding (ref :254-257)
        dec_patches = unshuffled + dec_pe[None] \
            + cast(self.ctx_dec_pe[:, : self.num_images])
        dec_patches = rearrange(dec_patches, "b t s d -> b (t s) d")
        x = jnp.concatenate([emb_context, dec_patches], axis=1)
        for block in self.decoder_blocks:
            x = block(x)
        tokens = self.decoder_norm(x)
        recon = self.decoder_patch_prediction(tokens[:, emb_context.shape[1]:])
        recon = rearrange(recon, "b (t s) d -> b t s d", t=self.num_images)
        visible = rearrange(visible_ctx, "b t s d -> b (t s) d")
        return recon, mask, restore_idxs, visible

    def compute_loss(self, imgs: jax.Array, reconstructions: jax.Array,
                     mask: jax.Array) -> jax.Array:
        """Per-patch MSE on masked patches, averaged over the 2 frames
        (ref :274-302). Always accumulates in f32 regardless of the
        decoder's computation dtype."""
        targets = self.patchify(imgs).astype(jnp.float32)
        reconstructions = reconstructions.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        zero_t, k_t = targets[:, 0], targets[:, 1]
        zero_r, k_r = reconstructions[:, 0], reconstructions[:, 1]
        zero_per_patch = jnp.mean(jnp.square(zero_r - zero_t), axis=-1)
        k_per_patch = jnp.mean(jnp.square(k_r - k_t), axis=-1)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        zero_loss = jnp.sum(zero_per_patch * mask) / denom
        k_loss = jnp.sum(k_per_patch * mask) / denom
        return (zero_loss + k_loss) / 2


def reconstruct_images(decoder: "MaskedTransformerImgDecoder",
                       predictions, goal_images, mask, file_path=None):
    """Visualize reconstructions: masked patches replaced by predictions,
    visible patches kept from the target (ref reconstruct_image,
    masked_transformer_decoder.py:304-373). Host-side numpy + PIL.

    predictions: (B, num_images, n_patches, ph*pw*C); goal_images:
    (B, num_images, H, W, C) CLIP-normalized; mask: (B, n_patches), 1=masked.
    Returns the PIL image (saved to file_path when given).
    """
    import numpy as np
    from PIL import Image
    from mdt_policy_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    preds = np.asarray(predictions, np.float32)
    targets = np.asarray(decoder.patchify(jnp.asarray(goal_images)), np.float32)
    mask_np = np.asarray(mask)
    B, n_img, n_patches, d = preds.shape
    ph = pw = decoder.patch_size
    grid = decoder.resolution // decoder.patch_size
    c = decoder.in_channels

    tiles = []
    for img_idx in range(n_img):
        combined = targets[0, img_idx].copy()
        combined[mask_np[0] == 1] = preds[0, img_idx][mask_np[0] == 1]
        img = combined.reshape(grid, grid, ph, pw, c)
        img = img.transpose(0, 2, 1, 3, 4).reshape(grid * ph, grid * pw, c)
        img = img * np.asarray(CLIP_IMAGE_STD) + np.asarray(CLIP_IMAGE_MEAN)
        tiles.append(np.clip(img, 0, 1))
    out = (np.concatenate(tiles, axis=1) * 255).astype(np.uint8)
    pil = Image.fromarray(out)
    if file_path is not None:
        pil.save(file_path)
    return pil
