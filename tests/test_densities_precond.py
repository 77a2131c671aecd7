"""Tests for sigma sample densities (edm_diffusion/utils.py:154-203) and the
EDM preconditioner (score_wrappers.py:18-100)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mdt_policy_tpu.diffusion import densities as D
from mdt_policy_tpu.diffusion import precond as P


KEY = jax.random.PRNGKey(0)


class TestDensities:
    def test_loglogistic_range_and_stats(self):
        # MDT default: loc=log(0.5), scale=0.5, truncated to [0.001, 80]
        fn = D.make_sample_density("loglogistic", sigma_data=0.5, sigma_min=0.001, sigma_max=80.0)
        s = np.asarray(fn(KEY, (200_000,)))
        assert s.min() >= 0.001 and s.max() <= 80.0
        # median of log-logistic = exp(loc) = sigma_data (truncation barely shifts it)
        assert np.median(s) == pytest.approx(0.5, rel=0.02)

    def test_loglogistic_matches_torch_quantiles(self):
        # distributional parity with the reference implementation
        loc, scale, lo, hi = math.log(0.5), 0.5, 0.001, 80.0
        torch.manual_seed(0)
        min_cdf = torch.tensor(lo, dtype=torch.float64).log().sub(loc).div(scale).sigmoid()
        max_cdf = torch.tensor(hi, dtype=torch.float64).log().sub(loc).div(scale).sigmoid()
        u = torch.rand((200_000,), dtype=torch.float64) * (max_cdf - min_cdf) + min_cdf
        ref = u.logit().mul(scale).add(loc).exp().numpy()
        ours = np.asarray(D.rand_log_logistic(KEY, (200_000,), loc=loc, scale=scale,
                                              min_value=lo, max_value=hi))
        for q in [0.1, 0.25, 0.5, 0.75, 0.9]:
            assert np.quantile(ours, q) == pytest.approx(np.quantile(ref, q), rel=0.03)

    def test_lognormal(self):
        s = np.asarray(D.rand_log_normal(KEY, (100_000,), loc=-1.2, scale=1.2))
        assert np.median(np.log(s)) == pytest.approx(-1.2, abs=0.02)

    def test_loguniform(self):
        s = np.asarray(D.rand_log_uniform(KEY, (100_000,), 0.01, 10.0))
        assert s.min() >= 0.01 and s.max() <= 10.0
        logs = np.log(s)
        assert np.mean(logs) == pytest.approx((math.log(0.01) + math.log(10)) / 2, abs=0.02)

    def test_uniform(self):
        s = np.asarray(D.rand_uniform(KEY, (100_000,), 0.1, 2.0))
        assert s.min() >= 0.1 and s.max() <= 2.0

    def test_v_diffusion(self):
        s = np.asarray(D.rand_v_diffusion(KEY, (100_000,), sigma_data=0.5,
                                          min_value=0.001, max_value=80.0))
        assert s.min() >= 0.0009 and s.max() <= 80.5

    def test_split_lognormal(self):
        s = np.asarray(D.rand_split_log_normal(KEY, (100_000,), loc=0.0, scale_1=1.0, scale_2=2.0))
        assert np.all(s > 0)

    def test_discrete(self):
        vals = jnp.array([0.1, 1.0, 10.0])
        s = np.asarray(D.rand_discrete(KEY, (10_000,), vals))
        assert set(np.unique(s).tolist()) <= {np.float32(0.1), np.float32(1.0), np.float32(10.0)}

    def test_dispatch_unknown(self):
        with pytest.raises(ValueError):
            D.make_sample_density("nope", 0.5, 0.001, 80.0)


class TestPrecond:
    def test_scalings_match_torch(self):
        sigma_data = 0.5
        sigma = jnp.array([0.001, 0.5, 80.0])
        c_skip, c_out, c_in = P.get_scalings(sigma, sigma_data)
        ts = torch.tensor([0.001, 0.5, 80.0])
        ref_skip = sigma_data ** 2 / (ts ** 2 + sigma_data ** 2)
        ref_out = ts * sigma_data / (ts ** 2 + sigma_data ** 2) ** 0.5
        ref_in = 1 / (ts ** 2 + sigma_data ** 2) ** 0.5
        np.testing.assert_allclose(np.asarray(c_skip), ref_skip.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(c_out), ref_out.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(c_in), ref_in.numpy(), rtol=1e-5)

    def test_loss_matches_torch_reference(self):
        # inner model = identity-ish linear map; check loss formula end to end
        rng = np.random.default_rng(0)
        B, T, A = 4, 10, 7
        actions = rng.normal(size=(B, T, A)).astype(np.float32)
        noise = rng.normal(size=(B, T, A)).astype(np.float32)
        sigma = rng.uniform(0.01, 5.0, size=(B,)).astype(np.float32)
        W = rng.normal(size=(A, A)).astype(np.float32) * 0.1

        def inner_jax(x, s):
            return x @ jnp.asarray(W)

        loss, model_out = P.precond_loss(inner_jax, jnp.asarray(actions), jnp.asarray(noise),
                                         jnp.asarray(sigma), sigma_data=0.5)

        # torch reference (score_wrappers.py:45-63)
        ta, tn, ts = map(torch.tensor, (actions, noise, sigma))
        sigma_data = 0.5
        c_skip = sigma_data ** 2 / (ts ** 2 + sigma_data ** 2)
        c_out = ts * sigma_data / (ts ** 2 + sigma_data ** 2) ** 0.5
        c_in = 1 / (ts ** 2 + sigma_data ** 2) ** 0.5
        c_skip, c_out, c_in = (c[:, None, None] for c in (c_skip, c_out, c_in))
        noised = ta + tn * ts[:, None, None]
        out = (noised * c_in) @ torch.tensor(W)
        target = (ta - c_skip * noised) / c_out
        ref_loss = (out - target).pow(2).flatten(1).mean()
        assert float(loss) == pytest.approx(float(ref_loss), rel=1e-4)
        np.testing.assert_allclose(np.asarray(model_out), out.numpy(), rtol=1e-4,
                                   atol=1e-6)

    def test_denoise_at_sigma_data_weights_half(self):
        # c_skip(sigma_data) = 1/2; denoiser = c_out*F + c_skip*x
        x = jnp.ones((2, 3))
        out = P.precond_denoise(lambda a, s: jnp.zeros_like(a), x, jnp.array([0.5, 0.5]), 0.5)
        np.testing.assert_allclose(np.asarray(out), 0.5 * np.ones((2, 3)), rtol=1e-6)

    def test_append_dims(self):
        x = jnp.ones((4,))
        assert P.append_dims(x, 3).shape == (4, 1, 1)
        with pytest.raises(ValueError):
            P.append_dims(jnp.ones((2, 2)), 1)
