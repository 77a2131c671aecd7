"""MDT (ResNet-variant) agent tests on a tiny config: the shared train_step
runs, all losses fire, ResNets train while CLIP towers stay frozen."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.agents import MDTConfig, init_mdt_agent, train_step

TINY_MDT = MDTConfig(
    latent_dim=32, embed_dim=32, obs_dim=32, goal_dim=16, clip_embed_dim=16,
    n_enc_layers=1, n_dec_layers=1, n_heads=2,
    img_size=32,
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
    batch = make_batch()
    net, state0 = init_mdt_agent(TINY_MDT, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net))
    state1, metrics = jitted(state0, batch, jax.random.PRNGKey(1))
    return dict(net=net, batch=batch, state0=state0, state1=state1,
                metrics=jax.device_get(metrics))


def test_submodules(world):
    top = set(world["state0"].params.keys())
    # clip_proj is absent: style 'single_token' is a parameterless slice
    # (ref transformer_blocks.py:851-852)
    assert {"static_resnet", "gripper_resnet", "visual_goal", "language_goal",
            "inner", "gen_img", "logit_scale"} <= top


def test_losses(world):
    m = world["metrics"]
    for k in ["lang/action_loss", "lang/img_gen_loss", "lang/cont_loss",
              "vis/action_loss", "train/total_loss"]:
        assert np.isfinite(float(m[k])), k
    assert float(m["vis/cont_loss"]) == 0.0


def test_resnets_train_clip_frozen(world):
    s0, s1 = world["state0"], world["state1"]
    changed = any(
        not np.array_equal(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree.leaves(s0.params["static_resnet"]),
                        jax.tree.leaves(s1.params["static_resnet"])))
    assert changed, "ResNet encoder must be trainable in MDT"
    for frozen in ["visual_goal", "language_goal"]:
        for b, a in zip(jax.tree.leaves(s0.params[frozen]),
                        jax.tree.leaves(s1.params[frozen])):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
