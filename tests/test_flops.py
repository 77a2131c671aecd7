"""Analytic Pallas-attention FLOP accounting (utils/flops.py): the formula
must agree with XLA's own flop counter for the equivalent matmul lowering,
and the per-step tower sum must follow the config."""

import jax
import jax.numpy as jnp
import numpy as np

from mdt_policy_tpu.utils.flops import (attention_matmul_flops,
                                        tower_custom_call_flops)


def test_formula_matches_xla_matmul_count():
    B, H, T, dh = 2, 2, 8, 8
    C = H * dh

    def attn_core(q, k, v):
        s = q @ jnp.swapaxes(k, -1, -2)   # (B,H,T,T)
        return s @ v                       # (B,H,T,dh)

    x = jnp.zeros((B, H, T, dh), jnp.float32)
    cost = jax.jit(attn_core).lower(x, x, x).compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    assert float(cost["flops"]) == attention_matmul_flops(B, T, C)


def test_tower_sum_follows_config():
    import dataclasses
    from mdt_policy_tpu.agents import MDTVConfig

    # kernel not routed (CPU tests / explicit False) -> nothing to add
    cfg_off = dataclasses.replace(MDTVConfig(), fused_tower_attention=False)
    assert tower_custom_call_flops(cfg_off, 512) == 0.0

    cfg_on = dataclasses.replace(MDTVConfig(), fused_tower_attention=True)
    B = 512
    expect = (attention_matmul_flops(4 * B, 196, 384, 12)      # Voltron
              + attention_matmul_flops(2 * B, 197, 768, 12)    # CLIP vision
              + attention_matmul_flops(B, 77, 512, 12))        # CLIP text
    got = tower_custom_call_flops(cfg_on, B)
    np.testing.assert_allclose(got, expect)
    # the magnitude VERDICT r2 estimated ("roughly 3 TFLOP/step")
    assert 1e12 < got < 1e13


def test_mdt_tower_sum_follows_config():
    """MDT (ResNet) family: only the frozen CLIP goal towers are Pallas
    calls; the ResNet encoders are XLA convs (round-4 VERDICT #6)."""
    import dataclasses
    from mdt_policy_tpu.agents import MDTConfig
    from mdt_policy_tpu.utils.flops import mdt_tower_custom_call_flops

    cfg_off = dataclasses.replace(MDTConfig(), fused_tower_attention=False)
    assert mdt_tower_custom_call_flops(cfg_off, 256) == 0.0

    cfg_on = dataclasses.replace(MDTConfig(), fused_tower_attention=True)
    B = 256
    expect = (attention_matmul_flops(2 * B, 197, 768, 12)    # CLIP vision
              + attention_matmul_flops(B, 77, 512, 12))      # CLIP text
    np.testing.assert_allclose(mdt_tower_custom_call_flops(cfg_on, B), expect)

    # the RN goal-tower family has no Pallas attention in the vision tower
    cfg_rn = dataclasses.replace(MDTConfig(), fused_tower_attention=True,
                                 clip_vision_family="resnet")
    np.testing.assert_allclose(
        mdt_tower_custom_call_flops(cfg_rn, B),
        attention_matmul_flops(B, 77, 512, 12))
