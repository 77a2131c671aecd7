"""Masked-decoder port validation (closes the round-1 "best-effort" caveat).

Reconstructs the reference `MaskedTransformerImgDecoder` in torch from its
published layout (masked_transformer_decoder.py:69-124: voltron PatchEmbed
conv + encoder2decoder linear + mask_token + ctx_dec_pe + voltron Blocks +
RMSNorm + patch-prediction linear) and checks `port_masked_decoder` forward
parity.

Determinism trick: at mask_ratio=0 every patch is kept — the shuffle selects
all patches and the unshuffle restores their order, so the forward output is
independent of the mask noise and the torch/flax RNGs need not match. Only
`mask_token` is unexercised (it multiplies zero mask slots); its port is a
direct copy.
"""

import numpy as np
import torch
import torch.nn as nn

from mdt_policy_tpu.models.masked_decoder import MaskedTransformerImgDecoder
from mdt_policy_tpu.models.voltron_vit import get_2d_sincos_pos_embed
from mdt_policy_tpu.utils.torch_port import port_masked_decoder

from test_voltron_port import TorchRMSNorm, TorchVoltronBlock, _randomize

RES, PATCH, DEPTH, DIM, HEADS, CTX_DIM = 32, 16, 2, 32, 2, 16


class TorchMaskedDecoder(nn.Module):
    """Reference layout (masked_transformer_decoder.py:69-124), symmetric
    mask path, restricted to the mask_ratio=0 regime for determinism."""

    def __init__(self):
        super().__init__()
        self.num_patches = (RES // PATCH) ** 2
        self.patch2embed = nn.ModuleDict({"proj": nn.Conv2d(3, DIM, PATCH, PATCH)})
        self.encoder2decoder = nn.Linear(CTX_DIM, DIM)
        self.mask_token = nn.Parameter(torch.zeros(1, 1, DIM))
        self.ctx_dec_pe = nn.Parameter(torch.randn(1, 2, 1, DIM))
        pe = get_2d_sincos_pos_embed(DIM, RES // PATCH)
        self.register_buffer("decoder_pe",
                             torch.tensor(pe, dtype=torch.float32)[None])
        self.decoder_blocks = nn.ModuleList(
            [TorchVoltronBlock(DIM, HEADS) for _ in range(DEPTH)])
        self.decoder_norm = TorchRMSNorm(DIM)
        self.decoder_patch_prediction = nn.Linear(DIM, PATCH * PATCH * 3)

    def forward(self, context, target_images_nhwc):
        # context: (B, n_ctx, CTX_DIM); targets: (B, 2, H, W, 3)
        B = context.shape[0]
        emb_context = self.encoder2decoder(context)
        flat = target_images_nhwc.reshape(-1, RES, RES, 3).permute(0, 3, 1, 2)
        patches = self.patch2embed["proj"](flat).flatten(2).transpose(1, 2)
        ctx_patches = (patches + self.decoder_pe).reshape(
            B, 2, self.num_patches, DIM)
        # mask_ratio=0: keep-all shuffle then unshuffle is the identity
        shuffle = torch.argsort(torch.rand(B, self.num_patches), dim=1)
        restore = torch.argsort(shuffle, dim=1)
        visible = torch.gather(
            ctx_patches, 2, shuffle[:, None, :, None].repeat(1, 2, 1, DIM))
        unshuffled = torch.gather(
            visible, 2, restore[:, None, :, None].repeat(1, 2, 1, DIM))
        dec = unshuffled + self.decoder_pe[None] + self.ctx_dec_pe[:, :2]
        dec = dec.reshape(B, 2 * self.num_patches, DIM)
        x = torch.cat([emb_context, dec], dim=1)
        for blk in self.decoder_blocks:
            x = blk(x)
        tokens = self.decoder_norm(x)
        recon = self.decoder_patch_prediction(tokens[:, context.shape[1]:])
        return recon.reshape(B, 2, self.num_patches, -1)


def test_masked_decoder_port_parity():
    import jax

    tm = _randomize(TorchMaskedDecoder(), seed=7)
    params = port_masked_decoder(
        {k: v for k, v in tm.state_dict().items() if k != "decoder_pe"},
        depth=DEPTH)

    rng = np.random.default_rng(0)
    context = rng.normal(size=(2, 3, CTX_DIM)).astype(np.float32)
    imgs = rng.uniform(size=(2, 2, RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(context), torch.tensor(imgs)).numpy()

    dec = MaskedTransformerImgDecoder(
        resolution=RES, patch_size=PATCH, decoder_depth=DEPTH,
        decoder_embed_dim=DIM, decoder_n_heads=HEADS, context_dim=CTX_DIM,
        mask_ratio=0.0)
    recon, mask, _, _ = dec.apply(
        {"params": params}, np.asarray(context), np.asarray(imgs),
        rngs={"mask": jax.random.PRNGKey(0)})
    assert float(np.max(mask)) == 0.0  # nothing masked at ratio 0
    np.testing.assert_allclose(np.asarray(recon), ref, rtol=2e-5, atol=2e-5)


def test_bf16_compute_close_to_f32():
    """gen_compute_dtype=bfloat16: same params, same mask rng — the bf16
    decoder tracks the f32 one within bf16 tolerance and the loss stays
    f32."""
    import jax
    import jax.numpy as jnp

    kw = dict(resolution=RES, patch_size=PATCH, decoder_depth=DEPTH,
              decoder_embed_dim=DIM, decoder_n_heads=HEADS,
              context_dim=CTX_DIM, mask_ratio=0.5)
    dec32 = MaskedTransformerImgDecoder(**kw)
    dec16 = MaskedTransformerImgDecoder(dtype=jnp.bfloat16, **kw)

    rng = np.random.default_rng(1)
    context = rng.normal(size=(2, 3, CTX_DIM)).astype(np.float32)
    imgs = rng.uniform(size=(2, 2, RES, RES, 3)).astype(np.float32)
    params = dec32.init({"params": jax.random.PRNGKey(0),
                         "mask": jax.random.PRNGKey(1)}, context, imgs)["params"]
    rngs = {"mask": jax.random.PRNGKey(2)}
    r32, m32, _, _ = dec32.apply({"params": params}, context, imgs, rngs=rngs)
    r16, m16, _, _ = dec16.apply({"params": params}, context, imgs, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(m32), np.asarray(m16, np.float32))
    assert r16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(r16, np.float32), np.asarray(r32),
                               rtol=0.1, atol=0.05)
    l32 = dec32.apply({"params": params}, imgs, r32, m32, method="compute_loss")
    l16 = dec16.apply({"params": params}, imgs, r16, m16, method="compute_loss")
    assert l16.dtype == jnp.float32
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)
