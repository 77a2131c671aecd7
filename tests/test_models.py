"""Tests for the transformer block library and denoiser models.

Block-level numerics are checked against torch implementations of the
reference formulas (transformer_blocks.py); model-level tests check shapes,
the encode/decode split (context hoisting), determinism, and jit compilation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mdt_policy_tpu.models import (
    ClipStyleProjection,
    MDTTransformer,
    MDTVTransformer,
    PerceiverResampler,
    RMSNorm,
    SwishGLU,
    modulate,
)
from mdt_policy_tpu.models.blocks import mish, SinusoidalPosEmb
from mdt_policy_tpu.ops.attention import sdpa

KEY = jax.random.PRNGKey(0)


class TestBlockNumerics:
    def test_rmsnorm_matches_torch_formula(self):
        x = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
        m = RMSNorm()
        params = m.init(KEY, jnp.asarray(x))
        ours = np.asarray(m.apply(params, jnp.asarray(x)))
        # reference formula (transformer_blocks.py:43-51), g = ones
        tx = torch.tensor(x)
        norm = torch.norm(tx, dim=-1, keepdim=True) * 8 ** -0.5
        ref = (tx / norm.clamp(min=1e-8)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_swishglu_matches_torch(self):
        x = np.random.default_rng(0).normal(size=(3, 6)).astype(np.float32)
        m = SwishGLU(out_dim=5)
        params = m.init(KEY, jnp.asarray(x))
        W = np.asarray(params["params"]["project"]["kernel"])
        b = np.asarray(params["params"]["project"]["bias"])
        ours = np.asarray(m.apply(params, jnp.asarray(x)))
        proj = torch.tensor(x) @ torch.tensor(W) + torch.tensor(b)
        projected, gate = proj.tensor_split(2, dim=-1)
        ref = (projected * F.silu(gate)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_modulate_is_shift_plus_x_times_scale(self):
        # the reference deviates from DiT: modulate = shift + x*scale (:262)
        x, shift, scale = jnp.ones((2, 2)), jnp.full((2, 2), 3.0), jnp.full((2, 2), 5.0)
        np.testing.assert_allclose(np.asarray(modulate(x, shift, scale)), 8.0)

    def test_mish_matches_torch(self):
        x = np.linspace(-4, 4, 17, dtype=np.float32)
        ours = np.asarray(mish(jnp.asarray(x)))
        ref = F.mish(torch.tensor(x)).numpy()
        # torch's float32 softplus differs from jax's by ~1e-4 abs
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)

    def test_sinusoidal_posemb_matches_torch(self):
        dim = 16
        x = np.array([0.5, -1.2], dtype=np.float32)
        ours = np.asarray(SinusoidalPosEmb(dim)(jnp.asarray(x)))
        # reference (mdtv_transformer.py:13-25)
        half = dim // 2
        emb = np.log(10000) / (half - 1)
        freqs = np.exp(np.arange(half) * -emb)
        ref = np.concatenate([np.sin(x[:, None] * freqs), np.cos(x[:, None] * freqs)], -1)
        np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=1e-5, atol=1e-6)

    def test_sdpa_matches_torch(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(2, 4, 5, 8)).astype(np.float32)
        k = rng.normal(size=(2, 4, 7, 8)).astype(np.float32)
        v = rng.normal(size=(2, 4, 7, 8)).astype(np.float32)
        ours = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        ref = F.scaled_dot_product_attention(*map(torch.tensor, (q, k, v))).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_sdpa_probability_dropout(self):
        """Attention-PROBABILITY dropout (ref transformer_blocks.py:95-100):
        with v = identity the output rows ARE the prob rows, so dropped probs
        show as exact zeros and survivors as det/(1-p)-rescaled values."""
        B, H, T = 2, 3, 8
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(B, H, T, T)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, T)), jnp.float32)
        v = jnp.broadcast_to(jnp.eye(T, dtype=jnp.float32), (B, H, T, T))
        det = np.asarray(sdpa(q, k, v))           # the softmax probs
        p = 0.5
        out = np.asarray(sdpa(q, k, v, dropout_rate=p, deterministic=False,
                              dropout_rng=jax.random.PRNGKey(7)))
        dropped = out == 0.0
        frac = dropped.mean()
        assert 0.3 < frac < 0.7                   # ~Bernoulli(0.5)
        # survivors are the deterministic probs rescaled by 1/(1-p)
        np.testing.assert_allclose(out[~dropped], det[~dropped] / (1 - p),
                                   rtol=1e-5)
        # eval mode is untouched by the dropout arguments
        ev = np.asarray(sdpa(q, k, v, dropout_rate=p, deterministic=True))
        np.testing.assert_array_equal(ev, det)
        with pytest.raises(ValueError, match="dropout_rng"):
            sdpa(q, k, v, dropout_rate=p, deterministic=False)

    def test_sdpa_causal_matches_torch(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
        ours = np.asarray(sdpa(*(jnp.asarray(q),) * 3, causal=True))
        ref = F.scaled_dot_product_attention(*(torch.tensor(q),) * 3, is_causal=True).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


# production MDT-V config (conf/model/model/mdtv_transformer.yaml)
MDTV_KW = dict(obs_dim=384, goal_dim=512, action_dim=7, proprio_dim=8, embed_dim=384,
               n_enc_layers=4, n_dec_layers=4, n_heads=8, goal_seq_len=1, obs_seq_len=1,
               n_obs_token=3, action_seq_len=10)


def _mdtv_inputs(B=2):
    rng = np.random.default_rng(0)
    states = {"state_images": jnp.asarray(rng.normal(size=(B, 3, 384)), jnp.float32)}
    actions = jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32)
    goals = jnp.asarray(rng.normal(size=(B, 1, 512)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(0.01, 5.0, size=(B,)), jnp.float32)
    return states, actions, goals, sigma


class TestMDTVTransformer:
    def setup_method(self):
        self.model = MDTVTransformer(**MDTV_KW)
        self.inputs = _mdtv_inputs()
        self.params = self.model.init(KEY, *self.inputs, train=False)

    def test_output_shapes(self):
        pred, context = self.model.apply(self.params, *self.inputs, train=False)
        assert pred.shape == (2, 10, 7)
        # context = 1 goal token + 3 obs tokens (AdaLN: no sigma token)
        assert context.shape == (2, 4, 384)

    def test_encode_decode_split_matches_full_forward(self):
        states, actions, goals, sigma = self.inputs
        pred_full, ctx_full = self.model.apply(self.params, *self.inputs, train=False)
        ctx = self.model.apply(self.params, states, goals, sigma,
                               train=False, method="encode")
        pred = self.model.apply(self.params, ctx, actions, sigma,
                                train=False, method="decode")
        np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_full), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_full), rtol=1e-6)

    def test_modality_switch_changes_output(self):
        states, actions, goals, sigma = self.inputs
        ctx_vis = self.model.apply(self.params, states, goals, sigma,
                                   modality="vis", train=False, method="encode")
        ctx_lang = self.model.apply(self.params, states, goals, sigma,
                                    modality="lang", train=False, method="encode")
        assert not np.allclose(np.asarray(ctx_vis), np.asarray(ctx_lang))

    def test_uncond_zeroes_goal(self):
        states, actions, goals, sigma = self.inputs
        ctx_uncond = self.model.apply(self.params, states, goals, sigma,
                                      train=False, uncond=True, method="encode")
        ctx_zero_goal = self.model.apply(self.params, states, jnp.zeros_like(goals),
                                         sigma, train=False, method="encode")
        np.testing.assert_allclose(np.asarray(ctx_uncond), np.asarray(ctx_zero_goal),
                                   rtol=1e-6)

    def test_eval_is_deterministic(self):
        a = self.model.apply(self.params, *self.inputs, train=False)[0]
        b = self.model.apply(self.params, *self.inputs, train=False)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_dropout_needs_rng_and_differs(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        a = self.model.apply(self.params, *self.inputs, train=True,
                             rngs={"dropout": k1})[0]
        b = self.model.apply(self.params, *self.inputs, train=True,
                             rngs={"dropout": k2})[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_sigma_zero_is_finite(self):
        states, actions, goals, _ = self.inputs
        pred, _ = self.model.apply(self.params, states, actions, goals,
                                   jnp.zeros((2,)), train=False)
        assert np.all(np.isfinite(np.asarray(pred)))

    def test_jit_compiles(self):
        apply = jax.jit(lambda p, s, a, g, sig: self.model.apply(p, s, a, g, sig, train=False))
        pred, _ = apply(self.params, *self.inputs)
        assert pred.shape == (2, 10, 7)

    def test_param_count_plausible(self):
        n = sum(x.size for x in jax.tree.leaves(self.params))
        # MDT-V denoiser is a small transformer: ~19M params at 384d 4+4 layers
        assert 5e6 < n < 5e7, n


class TestMDTTransformer:
    def test_forward_shapes(self):
        model = MDTTransformer(obs_dim=512, goal_dim=512, embed_dim=512,
                               n_enc_layers=4, n_dec_layers=6, n_heads=8)
        rng = np.random.default_rng(0)
        states = {
            "static": jnp.asarray(rng.normal(size=(2, 1, 512)), jnp.float32),
            "gripper": jnp.asarray(rng.normal(size=(2, 1, 512)), jnp.float32),
        }
        actions = jnp.asarray(rng.normal(size=(2, 10, 7)), jnp.float32)
        goals = jnp.asarray(rng.normal(size=(2, 1, 512)), jnp.float32)
        sigma = jnp.full((2,), 1.0)
        params = model.init(KEY, states, actions, goals, sigma, train=False)
        pred, context = model.apply(params, states, actions, goals, sigma, train=False)
        assert pred.shape == (2, 10, 7)
        # context = 1 goal + 2 interleaved camera tokens
        assert context.shape == (2, 3, 512)


class TestPerceiver:
    def test_resampler_shapes(self):
        # production: 2 cameras x 196 voltron tokens -> 3 latents @ 384
        model = PerceiverResampler(dim=384, depth=6, dim_head=64, heads=8,
                                   num_latents=3, num_time_embeds=1)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 392, 384)), jnp.float32)
        params = model.init(KEY, x)
        out = model.apply(params, x)
        assert out.shape == (2, 3, 384)
        assert np.all(np.isfinite(np.asarray(out)))


class TestClipStyleProjection:
    @pytest.mark.parametrize("style,expected", [
        ("map", (2, 384)), ("mean_pooling", (2, 384)),
        ("single_token", (2, 384)), ("mlp", (2, 384)),
    ])
    def test_styles(self, style, expected):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 384)), jnp.float32)
        m = ClipStyleProjection(clip_style=style, token_dim=384, clip_token_index=1,
                                num_token=4)
        params = m.init(KEY, x)
        out = m.apply(params, x)
        assert out.shape == expected


def test_denoiser_bf16_compute_matches_f32():
    """compute_dtype=bfloat16 (the AMP-16-analogue perf option,
    MDTVConfig.denoiser_compute_dtype): identical param tree to the f32
    lowering, and outputs agree to bf16 tolerance — params, norms, residual
    stream and heads stay f32; only the block GEMMs/attention run reduced."""
    import jax

    m32 = MDTVTransformer(**MDTV_KW)
    m16 = MDTVTransformer(**MDTV_KW, compute_dtype=jnp.bfloat16)
    inputs = _mdtv_inputs()
    p32 = m32.init(KEY, *inputs, train=False)
    p16 = m16.init(KEY, *inputs, train=False)
    # value-identical trees: the dtype is a computation detail, never layout
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), p32, p16))
    pred32, ctx32 = m32.apply(p32, *inputs, train=False)
    pred16, ctx16 = m16.apply(p32, *inputs, train=False)
    assert pred16.dtype == jnp.float32  # the action head re-promotes
    np.testing.assert_allclose(np.asarray(pred16), np.asarray(pred32),
                               rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(ctx16), np.asarray(ctx32),
                               rtol=0.1, atol=0.05)


def test_voltron_blocks_2d_parity():
    """voltron_blocks_2d (MDTVConfig flag) flattens the tower's norm/MLP
    segment to 2-D tokens for TPU layout assignment: pure reshapes, so the
    param tree and outputs must be IDENTICAL (bit-exact) to the 3-D path,
    for both the unrolled and the lax.scan block stacks."""
    import jax
    from mdt_policy_tpu.models.voltron_vit import VoltronViT

    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)),
                    jnp.float32)
    kw = dict(patch_size=16, embed_dim=64, depth=2, n_heads=2, img_size=64)
    for scan in (False, True):
        m3 = VoltronViT(**kw, blocks_2d=False, scan_layers=scan)
        m2 = VoltronViT(**kw, blocks_2d=True, scan_layers=scan)
        p = m3.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(
                    m2.init(jax.random.PRNGKey(0), x)))
        np.testing.assert_array_equal(np.asarray(m3.apply(p, x)),
                                      np.asarray(m2.apply(p, x)))
