"""Perceiver-resampler porting parity against the reference implementation
(loaded with a stubbed einops_exts)."""

import importlib.util
import sys
import types
from conftest import stub_module
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_perceiver():
    if not REF.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(REF))
    if "einops_exts" not in sys.modules:
        from einops import rearrange
        ee = stub_module("einops_exts")
        ee.rearrange_many = lambda xs, *a, **k: [rearrange(x, *a, **k) for x in xs]
        sys.modules["einops_exts"] = ee
    # satisfy the module's relative import of `.utils`
    pkg = "ref_perceiver_pkg"
    pkg_mod = stub_module(pkg)
    pkg_mod.__path__ = [str(REF / "mdt/models/networks/transformers")]
    sys.modules[pkg] = pkg_mod
    spec_u = importlib.util.spec_from_file_location(
        f"{pkg}.utils", REF / "mdt/models/networks/transformers/utils.py")
    utils_mod = importlib.util.module_from_spec(spec_u)
    sys.modules[f"{pkg}.utils"] = utils_mod
    spec_u.loader.exec_module(utils_mod)
    spec = importlib.util.spec_from_file_location(
        f"{pkg}.perceiver_resampler",
        REF / "mdt/models/networks/transformers/perceiver_resampler.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{pkg}.perceiver_resampler"] = mod
    spec.loader.exec_module(mod)
    return mod.PerceiverResampler


def test_perceiver_parity(ref_perceiver):
    import torch
    import jax.numpy as jnp
    from mdt_policy_tpu.models.perceiver import PerceiverResampler
    from mdt_policy_tpu.utils.torch_port import port_perceiver

    torch.manual_seed(0)
    kw = dict(dim=48, depth=3, dim_head=16, heads=4, num_latents=3,
              num_time_embeds=1)
    ref = ref_perceiver(**kw).eval()
    ours = PerceiverResampler(**kw)
    params = port_perceiver(ref.state_dict(), depth=3)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 17, 48)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()
    our_out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)


def test_head_slice_attention_matches_sdpa():
    """perceiver_head_slice: the minor-dim-sliced attention reproduces the
    sdpa path (same params, f32 and bf16)."""
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.models.perceiver import PerceiverResampler

    rng = np.random.default_rng(0)
    x_f = rng.normal(size=(2, 1, 19, 32)).astype(np.float32)
    for dt, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
        a = PerceiverResampler(dim=32, depth=2, dim_head=8, heads=4,
                               num_latents=3, num_time_embeds=1, dtype=dt)
        b = PerceiverResampler(dim=32, depth=2, dim_head=8, heads=4,
                               num_latents=3, num_time_embeds=1, dtype=dt,
                               head_slice=True)
        params = a.init(jax.random.PRNGKey(0), jnp.asarray(x_f))["params"]
        ya = a.apply({"params": params}, jnp.asarray(x_f))
        yb = b.apply({"params": params}, jnp.asarray(x_f))
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=tol, atol=tol)


def test_factored_kv_attention_matches_sdpa():
    """perceiver_factored_kv: the fold-W_k-into-q / re-associated-V path is
    the same math as projecting K/V then attending (matmul associativity) —
    and its param tree is identical (init must produce the same shapes on
    the same paths, so checkpoints swap freely between the two)."""
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.models.perceiver import PerceiverResampler

    rng = np.random.default_rng(1)
    x_f = rng.normal(size=(2, 1, 19, 32)).astype(np.float32)
    # f32 tolerance matches the torch-parity convention: reassociating the
    # K/V matmuls changes rounding order (measured max abs 7.5e-7 here)
    for dt, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 4e-2)):
        a = PerceiverResampler(dim=32, depth=2, dim_head=8, heads=4,
                               num_latents=3, num_time_embeds=1, dtype=dt)
        b = PerceiverResampler(dim=32, depth=2, dim_head=8, heads=4,
                               num_latents=3, num_time_embeds=1, dtype=dt,
                               factored=True)
        params = a.init(jax.random.PRNGKey(0), jnp.asarray(x_f))["params"]
        params_b = b.init(jax.random.PRNGKey(0), jnp.asarray(x_f))["params"]
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, params_b)
        # checkpoint-layout compat is VALUE-identical init, not just shapes:
        # a future divergence must fail here with a clear message (ADVICE r3)
        jax.tree.map(np.testing.assert_allclose, params, params_b)
        ya = a.apply({"params": params}, jnp.asarray(x_f))
        yb = b.apply({"params": params}, jnp.asarray(x_f))
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=tol, atol=tol)


def test_factored_layer_unprenormed_matches_dense():
    """Direct PerceiverAttentionLayer parity for factored=True WITHOUT the
    prenormed-media fast path (the resampler always prenorms, so this entry
    point is only reachable by external users — ADVICE r3 flagged it as
    shipping unverified)."""
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.models.perceiver import PerceiverAttentionLayer

    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(2, 19, 32)).astype(np.float32))
    lats = jnp.asarray(rng.normal(size=(2, 3, 32)).astype(np.float32))
    a = PerceiverAttentionLayer(dim=32, dim_head=8, heads=4)
    b = PerceiverAttentionLayer(dim=32, dim_head=8, heads=4, factored=True)
    params = a.init(jax.random.PRNGKey(0), feats, lats)["params"]
    params_b = b.init(jax.random.PRNGKey(0), feats, lats)["params"]
    jax.tree.map(np.testing.assert_allclose, params, params_b)
    ya = a.apply({"params": params}, feats, lats, features_prenormed=False)
    yb = b.apply({"params": params}, feats, lats, features_prenormed=False)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-4, atol=1e-5)
