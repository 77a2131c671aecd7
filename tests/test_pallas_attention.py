"""Pallas fused small-sequence attention vs the XLA sdpa reference
(interpret mode on the CPU test platform; the compiled kernel is exercised on
real TPU by bench/integration runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.ops.attention import sdpa
from mdt_policy_tpu.ops.pallas_attention import small_seq_mha


@pytest.mark.parametrize("B,H,T,D,causal", [
    (4, 8, 10, 48, True),    # MDT-V decoder regime
    (3, 8, 14, 48, False),   # encoder regime
    (2, 6, 23, 64, False),   # MDT block_size regime
    (5, 4, 7, 32, True),     # odd sizes exercise padding
])
def test_matches_sdpa(B, H, T, D, causal):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)).astype("float32"))
               for _ in range(3))
    ref = np.asarray(sdpa(q, k, v, causal=causal))
    out = np.asarray(small_seq_mha(q, k, v, causal, 16, True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_bf16_inputs():
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 4, 10, 48)), jnp.bfloat16)
               for _ in range(3))
    ref = np.asarray(sdpa(q, k, v, causal=True)).astype(np.float32)
    out = np.asarray(small_seq_mha(q, k, v, True, 16, True)
                     ).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
