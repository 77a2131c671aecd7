"""Activation-level parity: a randomly initialized REFERENCE MDTVTransformer
(loaded from /root/reference with stubbed deps, dropout zeroed) is ported via
utils.torch_port and must produce the same score-model outputs as our flax
MDTVTransformer on identical inputs — the mechanism behind the BASELINE
denoised-chunk-parity requirement."""

import sys
import types
from conftest import stub_module
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_module():
    if not REF.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(REF))
    # purge bare 'mdt' stubs other test modules may have registered — they
    # lack __path__ and break real package imports
    for name in list(sys.modules):
        if name == "mdt" or name.startswith("mdt."):
            del sys.modules[name]
    om = stub_module("omegaconf")
    om.DictConfig = dict
    sys.modules.setdefault("omegaconf", om)
    mpl = stub_module("matplotlib")
    plt = stub_module("matplotlib.pyplot")
    plt.cla = None
    mpl.pyplot = plt
    sys.modules.setdefault("matplotlib", mpl)
    sys.modules.setdefault("matplotlib.pyplot", plt)
    from mdt.models.networks.mdtv_transformer import MDTVTransformer as RefMDTV
    return RefMDTV


def test_mdtv_transformer_parity(ref_module):
    import torch
    import jax, jax.numpy as jnp
    from mdt_policy_tpu.models import MDTVTransformer
    from mdt_policy_tpu.utils.torch_port import port_mdtv_transformer

    torch.manual_seed(0)
    kw = dict(obs_dim=48, goal_dim=24, action_dim=7, proprio_dim=8, embed_dim=48,
              n_dec_layers=2, n_enc_layers=2, n_heads=4, goal_seq_len=1,
              obs_seq_len=1, action_seq_len=10)
    ref = ref_module(device="cpu", n_obs_token=3, goal_conditioned=True,
                     embed_pdrob=0, attn_pdrop=0.0, resid_pdrop=0.0, mlp_pdrop=0.0,
                     goal_drop=0, bias=False, use_mlp_goal=True,
                     use_ada_conditioning=True, use_noise_encoder=False,
                     use_modality_encoder=True, **kw)
    ref.eval()

    ours = MDTVTransformer(n_obs_token=3, embed_pdrob=0.0, attn_pdrop=0.0,
                           resid_pdrop=0.0, mlp_pdrop=0.0, goal_drop=0.0,
                           bias=False, use_ada_conditioning=True,
                           use_modality_encoder=True, use_mlp_goal=True, **kw)

    params = port_mdtv_transformer(ref.state_dict(), n_enc_layers=2, n_dec_layers=2)

    rng = np.random.default_rng(0)
    B = 3
    state_images = rng.normal(size=(B, 3, 48)).astype(np.float32)
    actions = rng.normal(size=(B, 10, 7)).astype(np.float32)
    goals = rng.normal(size=(B, 1, 24)).astype(np.float32)
    sigma = rng.uniform(0.01, 5.0, size=(B,)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref({"state_images": torch.tensor(state_images), "modality": "lang"},
                      torch.tensor(actions), torch.tensor(goals),
                      torch.tensor(sigma)).numpy()
        ref_ctx = ref.latent_encoder_emb.numpy()

    pred, ctx = ours.apply({"params": params},
                           {"state_images": jnp.asarray(state_images)},
                           jnp.asarray(actions), jnp.asarray(goals),
                           jnp.asarray(sigma), modality="lang", train=False)
    np.testing.assert_allclose(np.asarray(ctx), ref_ctx, rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(pred), ref_out, rtol=1e-4, atol=5e-5)


def test_full_denoised_chunk_parity(ref_module):
    """End-to-end DDIM-chunk parity: reference denoiser under the reference's
    own GCDenoiser preconditioner formulas vs our precond+sampler, same
    weights, same noise."""
    import torch
    import jax, jax.numpy as jnp
    from mdt_policy_tpu.models import MDTVTransformer
    from mdt_policy_tpu.utils.torch_port import port_mdtv_transformer
    from mdt_policy_tpu.diffusion.precond import precond_denoise
    from mdt_policy_tpu.diffusion.samplers import sample_ddim
    from mdt_policy_tpu.diffusion.schedules import get_sigmas_exponential

    torch.manual_seed(1)
    kw = dict(obs_dim=32, goal_dim=16, action_dim=7, proprio_dim=8, embed_dim=32,
              n_dec_layers=1, n_enc_layers=1, n_heads=2, goal_seq_len=1,
              obs_seq_len=1, action_seq_len=10)
    ref = ref_module(device="cpu", n_obs_token=3, goal_conditioned=True,
                     embed_pdrob=0, attn_pdrop=0.0, resid_pdrop=0.0, mlp_pdrop=0.0,
                     goal_drop=0, bias=False, use_mlp_goal=True,
                     use_ada_conditioning=True, use_noise_encoder=False,
                     use_modality_encoder=True, **kw)
    ref.eval()
    ours = MDTVTransformer(n_obs_token=3, embed_pdrob=0.0, attn_pdrop=0.0,
                           resid_pdrop=0.0, mlp_pdrop=0.0, goal_drop=0.0,
                           bias=False, use_ada_conditioning=True,
                           use_modality_encoder=True, use_mlp_goal=True, **kw)
    params = port_mdtv_transformer(ref.state_dict(), n_enc_layers=1, n_dec_layers=1)

    rng = np.random.default_rng(3)
    B = 2
    sigma_data = 0.5
    state_images = rng.normal(size=(B, 3, 32)).astype(np.float32)
    goals = rng.normal(size=(B, 1, 16)).astype(np.float32)
    x0 = (rng.normal(size=(B, 10, 7)) * 80.0).astype(np.float32)
    sigmas = np.asarray(get_sigmas_exponential(10, 0.001, 80.0))

    # ---- reference loop: GCDenoiser scalings + DDIM rule (torch) ----
    def ref_denoise(x, sigma):
        ts = torch.full((B,), float(sigma))
        c_skip = sigma_data**2 / (ts**2 + sigma_data**2)
        c_out = ts * sigma_data / (ts**2 + sigma_data**2) ** 0.5
        c_in = 1 / (ts**2 + sigma_data**2) ** 0.5
        with torch.no_grad():
            out = ref({"state_images": torch.tensor(state_images), "modality": "lang"},
                      torch.tensor(x) * c_in[:, None, None], torch.tensor(goals), ts)
        return (out * c_out[:, None, None] + torch.tensor(x) * c_skip[:, None, None]).numpy()

    x_ref = x0.copy()
    for i in range(len(sigmas) - 1):
        s, s_next = sigmas[i], sigmas[i + 1]
        denoised = ref_denoise(x_ref, s)
        t = -np.log(s)
        t_next = -np.log(s_next) if s_next > 0 else np.inf
        x_ref = (s_next / s) * x_ref - np.expm1(-(t_next - t)) * denoised

    # ---- ours: hoisted-context encode + scan sampler ----
    ctx = ours.apply({"params": params}, {"state_images": jnp.asarray(state_images)},
                     jnp.asarray(goals), jnp.full((B,), float(sigmas[0])),
                     modality="lang", train=False, method="encode")

    def denoise_fn(x, sigma):
        sb = jnp.broadcast_to(jnp.asarray(sigma, x.dtype), (B,))
        inner = lambda xin, s: ours.apply({"params": params}, ctx, xin, s, train=False,
                                          method="decode")
        return precond_denoise(inner, x, sb, sigma_data)

    x_ours = np.asarray(sample_ddim(denoise_fn, jnp.asarray(x0), sigmas))
    np.testing.assert_allclose(x_ours, x_ref, rtol=1e-3, atol=1e-3)


def test_mdt_transformer_parity(ref_module):
    """Same activation-parity check for the MDT (ResNet-variant) denoiser."""
    import torch
    import jax, jax.numpy as jnp
    from mdt.models.networks.mdt_transformer import MDTTransformer as RefMDT
    from mdt_policy_tpu.models import MDTTransformer
    from mdt_policy_tpu.utils.torch_port import port_mdt_transformer

    torch.manual_seed(2)
    kw = dict(obs_dim=48, goal_dim=24, action_dim=7, embed_dim=48,
              n_dec_layers=2, n_enc_layers=2, n_heads=4, goal_seq_len=1,
              obs_seq_len=1, action_seq_len=10)
    ref = RefMDT(device="cpu", goal_conditioned=True, embed_pdrob=0,
                 attn_pdrop=0.0, resid_pdrop=0.0, mlp_pdrop=0.0, goal_drop=0,
                 bias=False, use_mlp_goal=True, use_ada_conditioning=True,
                 use_noise_encoder=False, use_modality_encoder=True, **kw)
    ref.eval()
    ours = MDTTransformer(embed_pdrob=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
                          mlp_pdrop=0.0, goal_drop=0.0, bias=False,
                          use_ada_conditioning=True, use_modality_encoder=True,
                          use_mlp_goal=True, **kw)
    params = port_mdt_transformer(ref.state_dict(), n_enc_layers=2, n_dec_layers=2)

    rng = np.random.default_rng(5)
    B = 3
    states_np = {"static": rng.normal(size=(B, 1, 48)).astype(np.float32),
                 "gripper": rng.normal(size=(B, 1, 48)).astype(np.float32)}
    actions = rng.normal(size=(B, 10, 7)).astype(np.float32)
    goals = rng.normal(size=(B, 1, 24)).astype(np.float32)
    sigma = rng.uniform(0.01, 5.0, size=(B,)).astype(np.float32)

    import torch as th
    with th.no_grad():
        t_states = {k: th.tensor(v) for k, v in states_np.items()}
        t_states["modality"] = "lang"
        ref_out = ref(t_states, th.tensor(actions), th.tensor(goals),
                      th.tensor(sigma)).numpy()

    pred, _ = ours.apply({"params": params},
                         {k: jnp.asarray(v) for k, v in states_np.items()},
                         jnp.asarray(actions), jnp.asarray(goals),
                         jnp.asarray(sigma), modality="lang", train=False)
    np.testing.assert_allclose(np.asarray(pred), ref_out, rtol=1e-4, atol=5e-5)
