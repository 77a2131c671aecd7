"""Single-pass Pallas norm kernels (ops/fused_norm.py): numerics vs the XLA
references (flax nn.LayerNorm / models.blocks.RMSNorm), grad path, ragged
row padding, and dtype handling."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.models.blocks import RMSNorm
from mdt_policy_tpu.ops.fused_norm import (
    _auto_block_rows,
    _ln_reference,
    _rms_reference,
    fused_layer_norm,
    fused_rms_norm,
)


@pytest.mark.parametrize("shape,eps", [
    ((6, 384), 1e-5),
    ((3, 197, 768), 1e-5),   # CLIP-vision shaped
    ((2, 5, 512), 1e-12),
])
def test_layer_norm_matches_flax(shape, eps):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    b = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    ln = nn.LayerNorm(epsilon=eps)
    ref = ln.apply({"params": {"scale": w, "bias": b}}, x)
    out = fused_layer_norm(x, w, b, eps, 4, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rms_norm_matches_blocks_rmsnorm():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 196, 384)), jnp.float32)
    g = jnp.asarray(rng.normal(size=384), jnp.float32)
    ref = RMSNorm().apply({"params": {"g": g}}, x)
    out = fused_rms_norm(x, g, 1e-8, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rms_norm_clamps_tiny_rows():
    """The L2 clamp branch (||x|| below eps) matches the reference."""
    x = jnp.full((2, 8), 1e-12, jnp.float32)
    g = jnp.ones(8, jnp.float32)
    out = fused_rms_norm(x, g, 1e-8, 2, True)
    ref = _rms_reference(x, g, 1e-8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_layer_norm_grads_are_reference_grads():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=32), jnp.float32)
    b = jnp.asarray(rng.normal(size=32), jnp.float32)

    def loss_fused(x, w, b):
        return jnp.sum(fused_layer_norm(x, w, b, 1e-5, 2, True) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_ln_reference(x, w, b, 1e-5) ** 2)

    g = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_rms_norm_grads_are_reference_grads():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
    g = jnp.asarray(rng.normal(size=16), jnp.float32)
    ga = jax.grad(lambda x, g: jnp.sum(fused_rms_norm(x, g, 1e-8, 2, True) ** 2),
                  argnums=(0, 1))(x, g)
    gr = jax.grad(lambda x, g: jnp.sum(_rms_reference(x, g, 1e-8) ** 2),
                  argnums=(0, 1))(x, g)
    for a, r in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_ragged_rows_are_padded_and_unpadded():
    """Row count not divisible by block_rows: tail handled by padding."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(7, 3, 64)), jnp.float32)  # 21 rows
    w = jnp.ones(64, jnp.float32)
    b = jnp.zeros(64, jnp.float32)
    out = fused_layer_norm(x, w, b, 1e-5, 8, True)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ln_reference(x, w, b, 1e-5)),
                               rtol=1e-5, atol=1e-5)


def test_bf16_inputs_get_f32_statistics():
    """bf16 in/out, but the statistics run in f32 (reference casts too)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 128)) * 30, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=128), jnp.float32)
    b = jnp.asarray(rng.normal(size=128), jnp.float32)
    out = fused_layer_norm(x, w, b, 1e-5, 2, True)
    assert out.dtype == jnp.bfloat16
    ref = _ln_reference(x, w, b, 1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_auto_block_rows_bounds():
    for d in (384, 512, 768, 1024):
        for isz in (2, 4):
            r = _auto_block_rows(d, isz)
            assert 64 <= r <= 2048 and r % 64 == 0
