"""Fused qkv-attention Pallas kernel (ops/fused_qkv_attention.py) and the
bthd sdpa layout: numerics vs the einsum reference, grad path, block-size
heuristic, and the agent-level auto-resolution (off on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.ops.attention import sdpa
from mdt_policy_tpu.ops.fused_qkv_attention import (
    _auto_block_b,
    _reference,
    fused_qkv_attention,
)


@pytest.mark.parametrize("B,T,C,H,causal", [
    (5, 13, 24, 3, False),
    (4, 196, 48, 6, False),   # voltron-shaped (small width for CPU speed)
    (3, 8, 16, 2, True),      # causal (CLIP text regime)
    (2, 77, 32, 4, True),
])
def test_fused_kernel_matches_reference(B, T, C, H, causal):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * C)), jnp.float32)
    ref = _reference(qkv, H, causal)
    out = fused_qkv_attention(qkv, H, causal, 2, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_kernel_matches_sdpa_bthd():
    """The kernel and the production XLA path compute the same attention."""
    rng = np.random.default_rng(1)
    B, T, C, H = 3, 12, 24, 4
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * C)), jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    xla = sdpa(q.reshape(B, T, H, C // H), k.reshape(B, T, H, C // H),
               v.reshape(B, T, H, C // H), layout="bthd").reshape(B, T, C)
    fused = fused_qkv_attention(qkv, H, False, 2, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-5, atol=1e-5)


def test_fused_kernel_grad_is_reference_grad():
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.normal(size=(2, 9, 3 * 16)), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(fused_qkv_attention(x, 2, False, 2, True) ** 2))(qkv)
    gref = jax.grad(lambda x: jnp.sum(_reference(x, 2, False) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), rtol=1e-4, atol=1e-4)


def test_fused_kernel_pads_ragged_batch():
    """B not divisible by block_b: padded internally, output unpadded."""
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(5, 7, 3 * 8)), jnp.float32)
    out = fused_qkv_attention(qkv, 2, False, 4, True)
    assert out.shape == (5, 7, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_reference(qkv, 2, False)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,T,C,H,causal", [
    (5, 13, 128, 2, False),   # minimal eligible pair shape
    (3, 21, 256, 4, True),    # causal (CLIP-text regime, dh=64)
])
def test_pair_variant_matches_reference(B, T, C, H, causal):
    """The head-pair-grid variant (production on TPU for the towers: dh=64,
    C%128==0) computes the same attention as the reference."""
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * C)), jnp.float32)
    ref = _reference(qkv, H, causal)
    out = fused_qkv_attention(qkv, H, causal, 2, True, "pair")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # "auto" (resolves to pair on these eligible shapes) — same numbers
    auto = fused_qkv_attention(qkv, H, causal, 2, True, "auto")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pair_variant_eligibility():
    from mdt_policy_tpu.ops.fused_qkv_attention import _pair_eligible
    assert _pair_eligible(384, 6) and _pair_eligible(768, 12) \
        and _pair_eligible(512, 8)  # all three production towers
    assert not _pair_eligible(384, 3)   # odd heads
    assert not _pair_eligible(192, 3)   # C % 128 != 0
    assert not _pair_eligible(256, 8)   # dh != 64


def test_auto_block_b_budget():
    # production shapes: voltron ViT-S (196, 384) -> 8; CLIP ViT-B/16
    # (197, 768) -> 4 (fits the 16 MiB scoped-VMEM limit with double
    # buffering); CLIP text (77, 512) -> capped at 8
    assert _auto_block_b(196, 384) == 8
    assert _auto_block_b(197, 768) == 4
    assert _auto_block_b(77, 512) == 8
    assert _auto_block_b(4096, 4096) >= 1


def test_agent_auto_resolution_off_on_cpu():
    from mdt_policy_tpu.agents import MDTVConfig
    from mdt_policy_tpu.agents.mdtv_agent import resolve_fused_attention
    assert jax.default_backend() == "cpu"  # conftest forces the CPU platform
    assert resolve_fused_attention(MDTVConfig()) is False
    import dataclasses
    on = dataclasses.replace(MDTVConfig(), fused_tower_attention=True)
    assert resolve_fused_attention(on) is True


def test_sdpa_bthd_layout_matches_bhtd():
    rng = np.random.default_rng(4)
    for dtype, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
        q, k, v = (jnp.asarray(rng.normal(size=(2, 5, 4, 8)), dtype)
                   for _ in range(3))
        a = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                 v.transpose(0, 2, 1, 3))
        b = sdpa(q, k, v, layout="bthd").transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=tol, atol=1e-2)
        ac = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                  v.transpose(0, 2, 1, 3), causal=True)
        bc = sdpa(q, k, v, layout="bthd", causal=True).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(ac, np.float32),
                                   np.asarray(bc, np.float32), rtol=tol, atol=1e-2)


# ---------------------------------------------------------------------------
# Experimental half-block kernels (ops/attention_halfblock.py,
# ops/mlp_halfblock.py): measured SLOWER than the stage-1 qkv kernel on the
# real chip (docs/PALLAS.md) and therefore NOT routed into the towers, but
# kept numerics-tested so the experiment is reproducible.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm,causal,has_gamma", [
    ("rms", False, True),     # voltron attention half
    ("ln", True, False),      # CLIP text attention half
])
def test_attention_halfblock_matches_reference(norm, causal, has_gamma):
    from mdt_policy_tpu.ops.attention_halfblock import (
        _reference as hb_ref, attention_halfblock)
    rng = np.random.default_rng(0)
    B, T, C, H = 4, 13, 24, 3
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(C,)) + 1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(C,)), jnp.float32) if norm == "ln" else None
    wq = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, jnp.float32)
    bq = jnp.asarray(rng.normal(size=(3 * C,)) * 0.05, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
    gam = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32) if has_gamma else None
    eps = 1e-8 if norm == "rms" else 1e-5
    out = attention_halfblock(x, g, b, wq, bq, wp, bp, gam, H, norm, eps,
                              causal, 2, True)
    ref = hb_ref(x, g, b, wq, bq, wp, bp, gam, H, norm, eps, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    gr = jax.grad(lambda x_: jnp.sum(attention_halfblock(
        x_, g, b, wq, bq, wp, bp, gam, H, norm, eps, causal, 2, True) ** 2))(x)
    grr = jax.grad(lambda x_: jnp.sum(hb_ref(
        x_, g, b, wq, bq, wp, bp, gam, H, norm, eps, causal) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(grr),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("act,norm,has_gamma,ht", [
    ("swishglu", "rms", True, 16),   # voltron MLP half
    ("quickgelu", "ln", False, 32),  # CLIP MLP half
])
def test_mlp_halfblock_matches_reference(act, norm, has_gamma, ht):
    from mdt_policy_tpu.ops.mlp_halfblock import _reference as mlp_ref, mlp_halfblock
    rng = np.random.default_rng(1)
    B, T, C, H = 3, 9, 16, 32
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(C,)) + 1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(C,)), jnp.float32) if norm == "ln" else None
    w1w = 2 * H if act == "swishglu" else H
    w1 = jnp.asarray(rng.normal(size=(C, w1w)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(w1w,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
    gam = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32) if has_gamma else None
    eps = 1e-8 if norm == "rms" else 1e-5
    out = mlp_halfblock(x, g, b, w1, b1, w2, b2, gam, act, norm, eps, ht, 2, True)
    ref = mlp_ref(x, g, b, w1, b1, w2, b2, gam, act, norm, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
