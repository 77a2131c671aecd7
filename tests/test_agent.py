"""End-to-end agent tests on a tiny config (CPU-fast): init, one train step
(both modalities, all three losses), EMA update, frozen-tower masking,
denoise_actions with hoisted context, and the reset()/step() rollout protocol.

Compilation is expensive on the CI host, so the jitted train step runs ONCE in
a module fixture and all assertions share its results.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.agents import (
    MDTVConfig,
    MDTVPolicy,
    denoise_actions,
    init_agent,
    train_step,
)

TINY = MDTVConfig(
    latent_dim=32, embed_dim=32, obs_dim=32, goal_dim=16, clip_embed_dim=16,
    n_enc_layers=1, n_dec_layers=1, n_heads=2,
    perceiver_dim=32, perceiver_depth=1, perceiver_heads=2, perceiver_dim_head=8,
    num_latents=3,
    img_size=32, vit_patch=16, vit_depth=1, vit_heads=2,
    clip_vision_width=32, clip_vision_layers=1, clip_vision_patch=16,
    clip_text_width=16, clip_text_layers=1, clip_text_heads=2,
    clip_context_length=8, clip_vocab_size=100,
    gen_img_res=32, gen_patch_size=16, gen_decoder_depth=1, gen_decoder_dim=16,
    gen_decoder_heads=2,
    num_sampling_steps=3,
)

B = 2


def make_batch(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    def scope_batch():
        return {
            "rgb_static": jnp.asarray(rng.uniform(size=(B, 2, 32, 32, 3)), jnp.float32),
            "rgb_gripper": jnp.asarray(rng.uniform(size=(B, 2, 32, 32, 3)), jnp.float32),
            "gen_static": jnp.asarray(rng.uniform(size=(B, 32, 32, 3)), jnp.float32),
            "gen_gripper": jnp.asarray(rng.uniform(size=(B, 32, 32, 3)), jnp.float32),
            "actions": jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32),
            "lang_tokens": jnp.asarray(rng.integers(1, 100, size=(B, 8)), jnp.int32),
        }
    return {"vis": scope_batch(), "lang": scope_batch()}


@pytest.fixture(scope="module")
def world():
    """Init once, run the jitted train step twice, sample once."""
    batch = make_batch()
    net, state0 = init_agent(TINY, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net))
    state1, metrics1 = jitted(state0, batch, jax.random.PRNGKey(1))
    state2, metrics2 = jitted(state1, batch, jax.random.PRNGKey(2))
    return dict(net=net, batch=batch, state0=state0, state1=state1,
                state2=state2, metrics1=jax.device_get(metrics1),
                metrics2=jax.device_get(metrics2))


def test_init_creates_all_submodules(world):
    top = set(world["state0"].params.keys())
    assert {"img_encoder", "perceiver", "visual_goal", "language_goal",
            "inner", "gen_img", "clip_proj", "logit_scale"} <= top


def test_losses_finite_and_all_present(world):
    m = world["metrics1"]
    for k in ["lang/action_loss", "lang/img_gen_loss", "lang/cont_loss",
              "vis/action_loss", "vis/img_gen_loss", "train/total_loss"]:
        assert np.isfinite(float(m[k])), k
    # contrastive fires only for lang scope (ref mdtv_agent.py:444-484)
    assert float(m["vis/cont_loss"]) == 0.0
    assert float(m["lang/cont_loss"]) > 0.0
    assert int(world["state1"].step) == 1
    assert int(world["state2"].step) == 2


def test_frozen_towers_do_not_update(world):
    s0, s1 = world["state0"], world["state1"]
    for frozen in ["visual_goal", "language_goal", "img_encoder"]:
        for b, a in zip(jax.tree.leaves(s0.params[frozen]),
                        jax.tree.leaves(s1.params[frozen])):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    changed = any(
        not np.array_equal(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree.leaves(s0.params["inner"]),
                        jax.tree.leaves(s1.params["inner"])))
    assert changed


def test_ema_warmup_schedule(world):
    # step 0: decay = 1 - (1+0)^-p = 0 -> ema == params exactly after step 1
    assert float(world["metrics1"]["train/ema_rate"]) == 0.0
    for e, p in zip(jax.tree.leaves(world["state1"].ema_params),
                    jax.tree.leaves(world["state1"].params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), rtol=1e-6)
    # step 1: decay = 1 - 2^(-2/3) > 0 -> ema lags params
    assert 0.0 < float(world["metrics2"]["train/ema_rate"]) < 1.0


def test_policy_protocol_and_sampling(world):
    net, state, batch = world["net"], world["state1"], world["batch"]
    b = batch["lang"]
    emb = net.apply({"params": state.params}, b["rgb_static"][:, :-1],
                    b["rgb_gripper"][:, :-1], method="compute_voltron_embeddings")
    goal = net.apply({"params": state.params}, b["lang_tokens"],
                     method="encode_language_goal")
    k = jax.random.PRNGKey(5)
    a1 = jax.jit(partial(denoise_actions, net))(state.params, emb, goal, k)
    a2 = jax.jit(partial(denoise_actions, net))(state.params, emb, goal, k)
    assert a1.shape == (B, 10, 7)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.all(np.isfinite(np.asarray(a1)))

    policy = MDTVPolicy(net, state.params)
    policy.reset()
    obs = {"rgb_static": b["rgb_static"][:, :-1], "rgb_gripper": b["rgb_gripper"][:, :-1]}
    goal_d = {"lang_tokens": b["lang_tokens"]}
    actions = [np.asarray(policy.step(obs, goal_d)) for _ in range(12)]
    assert actions[0].shape == (B, 7)
    # chunk of 10 replayed, step 10 re-plans; counter wraps at multistep
    assert policy.rollout_step_counter == 2

    # goal-image conditioning (the Rollout callback's 'vis' modality):
    # same protocol, goal = preprocessed static frame
    policy.reset()
    vis_goal = {"rgb_static_goal": b["rgb_static"][:, -1]}
    a_vis = np.asarray(policy.step(obs, vis_goal))
    assert a_vis.shape == (B, 7)
    assert np.all(np.isfinite(a_vis))


def test_fused_camera_batch_matches_separate(world):
    """fuse_camera_batch runs both cameras through ONE ViT call; the same
    weights apply per-sample so the embeddings must match the two-call path."""
    import dataclasses
    from mdt_policy_tpu.agents.mdtv_agent import MDTVAgentNet

    net, state, batch = world["net"], world["state0"], world["batch"]
    b = batch["lang"]
    args = (b["rgb_static"][:, :-1], b["rgb_gripper"][:, :-1])
    nets = {
        flag: MDTVAgentNet(dataclasses.replace(TINY, fuse_camera_batch=flag))
        for flag in (False, True)
    }
    outs = {
        flag: np.asarray(n.apply({"params": state.params}, *args,
                                 method="compute_voltron_embeddings")["state_images"])
        for flag, n in nets.items()
    }
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # second full-agent compile, ~2 min on this host
def test_resnet_goal_tower_family(world):
    """clip_vision_family='resnet' swaps the goal image tower for CLIP's
    ModifiedResNet (the reference VisionClip DEFAULT, model_name='RN50' —
    vision_clip.py:10); the full dual-modality train step runs and the
    tower stays frozen."""
    import dataclasses

    cfg = dataclasses.replace(TINY, clip_vision_family="resnet",
                              clip_rn_layers=(1, 1, 1, 1), clip_rn_width=4)
    batch = world["batch"]
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    assert "attnpool" in state.params["visual_goal"], \
        "resnet family should build the ModifiedResNet tower"
    state1, metrics = jax.jit(partial(train_step, net))(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train/total_loss"]))
    # frozen: the RN goal tower's params must not move
    for a, b in zip(jax.tree.leaves(state.params["visual_goal"]),
                    jax.tree.leaves(state1.params["visual_goal"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_retired_overrides_filtered():
    """Historical run snapshots carrying retired experiment flags
    (mxu_tower_norm / perceiver_head_slice / fuse_scope_towers — measured
    and rejected, wiring removed in round 4) must still re-hydrate: the
    filter drops them with a warning and the remaining overrides apply."""
    from mdt_policy_tpu.agents import MDTVConfig
    from mdt_policy_tpu.agents.config import filter_retired_overrides

    overrides = {"mxu_tower_norm": True, "perceiver_head_slice": True,
                 "fuse_scope_towers": True, "latent_dim": 64}
    kept = filter_retired_overrides(overrides)
    assert kept == {"latent_dim": 64}
    assert MDTVConfig(**kept).latent_dim == 64
