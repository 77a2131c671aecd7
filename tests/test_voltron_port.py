"""Voltron v-cond backbone port validation (VERDICT r1 #10).

The voltron-robotics package is absent from this image, so the published
block is reconstructed here in torch from its building components — RMSNorm
and SwishGLU exactly as vendored by the reference itself
(transformer_blocks.py:43-62, which the mdt authors copied FROM voltron) plus
the standard fused-qkv attention / LayerScale / pre-norm residual wiring the
reference's masked decoder instantiates (masked_transformer_decoder.py:108-120:
Block(dim, heads, mlp_ratio, do_rms_norm=True, do_swish_glu=True,
do_layer_scale=True)). Parity of _voltron_block/port_voltron_vit against this
reconstruction pins the port's math and state_dict layout; alternate
LayerScale key spellings are covered separately.
"""

import math

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn

from mdt_policy_tpu.models.voltron_vit import VoltronBlock, VoltronViT
from mdt_policy_tpu.utils.torch_port import _voltron_block, port_voltron_vit


class TorchRMSNorm(nn.Module):
    """(= reference transformer_blocks.py:43-51, voltron's RMSNorm)"""

    def __init__(self, dim, eps=1e-8):
        super().__init__()
        self.scale, self.eps = dim ** -0.5, eps
        self.g = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        norm = torch.norm(x, dim=-1, keepdim=True) * self.scale
        return x / norm.clamp(min=self.eps) * self.g


class TorchSwishGLU(nn.Module):
    """(= reference transformer_blocks.py:55-62, voltron's SwishGLU)"""

    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.act = nn.SiLU()
        self.project = nn.Linear(in_dim, 2 * out_dim)

    def forward(self, x):
        projected, gate = self.project(x).tensor_split(2, dim=-1)
        return projected * self.act(gate)


class TorchLayerScale(nn.Module):
    def __init__(self, dim, init_value=0.1):
        super().__init__()
        self.gamma = nn.Parameter(init_value * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class TorchAttention(nn.Module):
    """Fused-qkv MHA (timm/voltron layout: qkv with bias, proj with bias)."""

    def __init__(self, dim, n_heads):
        super().__init__()
        self.n_heads, self.scale = n_heads, (dim // n_heads) ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, T, C = x.shape
        qkv = self.qkv(x).reshape(B, T, 3, self.n_heads, C // self.n_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1) * self.scale).softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, T, C))


class TorchVoltronBlock(nn.Module):
    """Pre-norm residual block as the reference instantiates voltron's Block
    (do_rms_norm=True, do_swish_glu=True, do_layer_scale=True)."""

    def __init__(self, dim, n_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = TorchRMSNorm(dim)
        self.attn = TorchAttention(dim, n_heads)
        self.ls1 = TorchLayerScale(dim)
        self.norm2 = TorchRMSNorm(dim)
        self.mlp = nn.Sequential(TorchSwishGLU(dim, int(mlp_ratio * dim)),
                                 nn.Linear(int(mlp_ratio * dim), dim))
        self.ls2 = TorchLayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


DIM, HEADS = 32, 2


def test_voltron_block_port_parity():
    tb = _randomize(TorchVoltronBlock(DIM, HEADS))
    sd = {f"blk.{k}": v for k, v in tb.state_dict().items()}
    params = _voltron_block(sd, "blk")

    x = np.random.default_rng(0).normal(size=(2, 5, DIM)).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.tensor(x)).numpy()
    ours = np.asarray(VoltronBlock(DIM, HEADS).apply({"params": params},
                                                     np.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_layer_scale_alternate_spellings():
    tb = _randomize(TorchVoltronBlock(DIM, HEADS))
    sd = {f"blk.{k}": v for k, v in tb.state_dict().items()}
    base = _voltron_block(sd, "blk")
    # layer_scale1.gamma spelling
    sd2 = {k.replace(".ls1.gamma", ".layer_scale1.gamma")
            .replace(".ls2.gamma", ".layer_scale2.gamma"): v
           for k, v in sd.items()}
    alt = _voltron_block(sd2, "blk")
    np.testing.assert_array_equal(alt["ls1"]["gamma"], base["ls1"]["gamma"])
    # bare lambda parameter spelling
    sd3 = {k.replace(".ls1.gamma", ".lambda1")
            .replace(".ls2.gamma", ".lambda2"): v for k, v in sd.items()}
    alt3 = _voltron_block(sd3, "blk")
    np.testing.assert_array_equal(alt3["ls2"]["gamma"], base["ls2"]["gamma"])
    # missing entirely -> loud KeyError naming the spellings
    sd4 = {k: v for k, v in sd.items() if "ls1" not in k}
    with pytest.raises(KeyError, match="LayerScale 1"):
        _voltron_block(sd4, "blk")


def test_voltron_vit_port_parity():
    """Full backbone: conv patchifier + sincos PE + blocks + final LayerNorm
    (v-cond layout: patch2embed.proj / blocks.N / encoder_norm)."""
    IMG, PATCH, DEPTH = 32, 16, 2
    torch.manual_seed(0)

    class TorchViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch2embed = nn.ModuleDict(
                {"proj": nn.Conv2d(3, DIM, PATCH, PATCH)})
            self.blocks = nn.ModuleList(
                [TorchVoltronBlock(DIM, HEADS) for _ in range(DEPTH)])
            self.encoder_norm = nn.LayerNorm(DIM, eps=1e-6)

        def forward(self, x_nhwc):
            x = self.patch2embed["proj"](x_nhwc.permute(0, 3, 1, 2))
            x = x.flatten(2).transpose(1, 2)  # (B, n_patches, D)
            from mdt_policy_tpu.models.voltron_vit import get_2d_sincos_pos_embed
            pe = torch.tensor(get_2d_sincos_pos_embed(DIM, IMG // PATCH))
            x = x + pe[None]
            for b in self.blocks:
                x = b(x)
            return self.encoder_norm(x)

    tv = _randomize(TorchViT(), seed=3)
    params = port_voltron_vit(tv.state_dict())
    x = np.random.default_rng(1).uniform(size=(2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(x)).numpy()
    vit = VoltronViT(patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
                     n_heads=HEADS, img_size=IMG)
    ours = np.asarray(vit.apply({"params": params}, np.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)
