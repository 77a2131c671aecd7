"""Rotary-embedding parity with the reference (lucidrains) implementation,
plus shape/sanity checks for the relative/dynamic biases."""

import importlib.util
import sys
import types
from conftest import stub_module
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_rotary():
    if not REF.exists():
        pytest.skip("reference not mounted")
    om = stub_module("omegaconf")
    om.DictConfig = dict
    sys.modules.setdefault("omegaconf", om)
    spec = importlib.util.spec_from_file_location(
        "ref_pos_emb", REF / "mdt/models/networks/transformers/position_embeddings.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRotary:
    def test_plain_rotary_matches_reference(self, ref_rotary):
        import torch
        from mdt_policy_tpu.models.position_embeddings import RotaryEmbedding

        dim = 16
        ref = ref_rotary.RotaryEmbedding(dim)
        rng = np.random.default_rng(0)
        t = rng.normal(size=(2, 4, 12, 32)).astype(np.float32)  # (B,H,T,D)
        with torch.no_grad():
            ref_out = ref.rotate_queries_or_keys(torch.tensor(t)).numpy()
        ours = RotaryEmbedding(dim)
        out = np.asarray(ours.rotate_queries_or_keys(jnp.asarray(t)))
        np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-6)

    def test_xpos_rotary_matches_reference(self, ref_rotary):
        import torch
        from mdt_policy_tpu.models.position_embeddings import RotaryEmbedding

        dim = 16
        ref = ref_rotary.RotaryEmbedding(dim, use_xpos=True, xpos_scale_base=512)
        rng = np.random.default_rng(1)
        q = rng.normal(size=(2, 4, 10, 32)).astype(np.float32)
        k = rng.normal(size=(2, 4, 10, 32)).astype(np.float32)
        with torch.no_grad():
            rq, rk = ref.rotate_queries_and_keys(torch.tensor(q), torch.tensor(k))
        ours = RotaryEmbedding(dim, use_xpos=True, xpos_scale_base=512)
        oq, ok = ours.rotate_queries_and_keys(jnp.asarray(q), jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(oq), rq.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ok), rk.numpy(), rtol=1e-4, atol=1e-5)

    def test_rotary_preserves_inner_products_shift_invariance(self):
        # rotary property: <q_i, k_j> depends only on i-j
        from mdt_policy_tpu.models.position_embeddings import RotaryEmbedding
        rot = RotaryEmbedding(8)
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(1, 1, 6, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 1, 6, 8)).astype(np.float32))
        rq = rot.rotate_queries_or_keys(q)
        rk = rot.rotate_queries_or_keys(k)
        s = np.asarray(jnp.einsum("bhqd,bhkd->bhqk", rq, rk))[0, 0]
        # diagonal entries equal the unrotated dot products
        raw = np.asarray(jnp.einsum("bhqd,bhkd->bhqk", q, k))[0, 0]
        np.testing.assert_allclose(np.diag(s), np.diag(raw), rtol=1e-5)


class TestBiases:
    def test_relative_position_bias_shapes(self):
        import jax
        from mdt_policy_tpu.models.position_embeddings import RelativePositionBias
        m = RelativePositionBias(heads=4)
        params = m.init(jax.random.PRNGKey(0), 5, 7)
        bias = m.apply(params, 5, 7)
        assert bias.shape == (1, 4, 5, 7)

    def test_dynamic_position_bias_shapes(self):
        import jax
        from mdt_policy_tpu.models.position_embeddings import DynamicPositionBias
        m = DynamicPositionBias(dim=16, heads=4)
        params = m.init(jax.random.PRNGKey(0), 6, 6)
        bias = m.apply(params, 6, 6)
        assert bias.shape == (1, 4, 6, 6)
