"""Scan-over-layers towers (models/layer_stack.py + scan_layers flags):
param-layout round trip and numerical equality with the unrolled stacks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.models.clip import CLIPTextTower, CLIPVisionTower
from mdt_policy_tpu.models.layer_stack import (
    convert_tower_layout,
    stack_layer_params,
    unstack_layer_params,
)
from mdt_policy_tpu.models.voltron_vit import VoltronViT


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (_, x), (_, y) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stack_unstack_roundtrip():
    rng = np.random.default_rng(0)
    f32 = lambda *s: rng.normal(size=s).astype(np.float32)
    params = {f"block_{i}": {"w": f32(3, 4), "sub": {"b": f32(4)}}
              for i in range(5)}
    params["norm"] = {"scale": f32(4)}
    stacked = stack_layer_params(params, "block_")
    assert set(stacked) == {"blocks", "norm"}
    assert stacked["blocks"]["block"]["w"].shape == (5, 3, 4)
    back = unstack_layer_params(stacked, "block_")
    _tree_equal(params, back)


def test_voltron_scan_matches_unrolled():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    kw = dict(patch_size=16, embed_dim=64, depth=3, n_heads=2, img_size=32)
    plain = VoltronViT(**kw)
    scanned = VoltronViT(**kw, scan_layers=True)
    p = plain.init(jax.random.PRNGKey(0), img)["params"]
    ps = stack_layer_params(p, "block_")
    # the scanned model's own init produces exactly this tree structure
    own = scanned.init(jax.random.PRNGKey(0), img)["params"]
    assert (jax.tree_util.tree_structure(own)
            == jax.tree_util.tree_structure(ps))
    y_plain = plain.apply({"params": p}, img)
    y_scan = scanned.apply({"params": ps}, img)
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_scan),
                               rtol=1e-6, atol=1e-6)


def test_clip_towers_scan_match_unrolled():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    kw = dict(embed_dim=32, image_resolution=32, layers=3, width=64,
              patch_size=16)
    plain = CLIPVisionTower(**kw)
    scanned = CLIPVisionTower(**kw, scan_layers=True)
    p = plain.init(jax.random.PRNGKey(0), img)["params"]
    ps = stack_layer_params(p, "resblock_")
    np.testing.assert_allclose(
        np.asarray(plain.apply({"params": p}, img)),
        np.asarray(scanned.apply({"params": ps}, img)),
        rtol=1e-6, atol=1e-6)

    toks = jnp.asarray(rng.integers(1, 90, size=(2, 8)), jnp.int32)
    tkw = dict(embed_dim=32, context_length=8, vocab_size=100, width=64,
               heads=2, layers=3)
    tp = CLIPTextTower(**tkw)
    ts = CLIPTextTower(**tkw, scan_layers=True)
    p = tp.init(jax.random.PRNGKey(0), toks)["params"]
    ps = stack_layer_params(p, "resblock_")
    np.testing.assert_allclose(
        np.asarray(tp.apply({"params": p}, toks)),
        np.asarray(ts.apply({"params": ps}, toks)),
        rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # full-agent compile, ~2 min on this host
def test_agent_scan_step_matches_unrolled():
    """Full MDT-V train step: converting an unrolled-init param tree to the
    scanned layout gives the SAME loss — scan_layers is a pure layout/
    compile-size knob, not a numerics change."""
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step
    from functools import partial

    tiny = dict(
        latent_dim=32, embed_dim=32, obs_dim=32, goal_dim=16, clip_embed_dim=16,
        n_enc_layers=1, n_dec_layers=1, n_heads=2,
        perceiver_dim=32, perceiver_depth=1, perceiver_heads=2,
        perceiver_dim_head=8, num_latents=3, img_size=32, vit_patch=16,
        vit_depth=2, vit_heads=2,
        clip_vision_width=32, clip_vision_layers=2, clip_vision_patch=16,
        clip_text_width=16, clip_text_layers=2, clip_text_heads=2,
        clip_context_length=8, clip_vocab_size=100,
        gen_img_res=32, gen_patch_size=16, gen_decoder_depth=1,
        gen_decoder_dim=16, gen_decoder_heads=2, num_sampling_steps=2,
    )
    rng = np.random.default_rng(3)
    B = 2

    def scope():
        return {
            "rgb_static": jnp.asarray(rng.uniform(size=(B, 2, 32, 32, 3)), jnp.float32),
            "rgb_gripper": jnp.asarray(rng.uniform(size=(B, 2, 32, 32, 3)), jnp.float32),
            "gen_static": jnp.asarray(rng.uniform(size=(B, 32, 32, 3)), jnp.float32),
            "gen_gripper": jnp.asarray(rng.uniform(size=(B, 32, 32, 3)), jnp.float32),
            "actions": jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32),
            "lang_tokens": jnp.asarray(rng.integers(1, 100, size=(B, 8)), jnp.int32),
        }

    batch = {"vis": scope(), "lang": scope()}
    cfg = dataclasses.replace(MDTVConfig(), **tiny)
    cfg_scan = dataclasses.replace(MDTVConfig(), **tiny, scan_tower_layers=True)

    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    net_s, state_s = init_agent(cfg_scan, jax.random.PRNGKey(0), batch["lang"])

    conv = convert_tower_layout(state.params, to_scan=True)
    assert (jax.tree_util.tree_structure(conv)
            == jax.tree_util.tree_structure(state_s.params))
    state_s = state_s.replace(params=conv,
                              ema_params=convert_tower_layout(
                                  state.ema_params, to_scan=True))

    key = jax.random.PRNGKey(1)
    _, m = jax.jit(partial(train_step, net))(state, batch, key)
    _, ms = jax.jit(partial(train_step, net_s))(state_s, batch, key)
    np.testing.assert_allclose(float(m["train/total_loss"]),
                               float(ms["train/total_loss"]),
                               rtol=1e-5, atol=1e-5)

    # round trip back to the unrolled layout
    back = convert_tower_layout(conv, to_scan=False)
    _tree_equal(back, state.params)

    # idempotence: converting an already-converted tree is a no-op (the
    # warm-start path relies on this to accept either layout)
    _tree_equal(convert_tower_layout(conv, to_scan=True), conv)
    _tree_equal(convert_tower_layout(back, to_scan=False), back)
