"""Learning signal: the full dual-modality train step learns a fixed tiny
batch — the 'training actually learns' guard the closed-loop CALVIN
benchmark provides operationally for the reference (SURVEY §4), here
CALVIN-free on the CI host.

Design note: with fresh noise drawn every step, the EDM objective has an
irreducible floor (the posterior variance of the denoising target), so
"loss -> 0" is not a valid assertion even in overfit. Using a
CONSTANT-action batch makes the optimal denoiser a deterministic map the
tiny net can represent: the diffusion loss must fall substantially AND the
fully-SAMPLED chunks (the validation_step metric, exercising the
sampler/denoiser path end to end) must move toward the target action.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# compile-heavy end-to-end tier (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

from mdt_policy_tpu.agents import denoise_actions, init_agent, train_step
from test_agent import TINY, make_batch


def test_learns_constant_action_batch():
    cfg = dataclasses.replace(
        TINY,
        optimizer=dataclasses.replace(TINY.optimizer, learning_rate=1e-3),
        lr_scheduler=dataclasses.replace(TINY.lr_scheduler, total_steps=400),
        num_sampling_steps=10)
    batch = make_batch(7)
    const = jnp.asarray(np.linspace(-1, 1, 70).reshape(1, 10, 7), jnp.float32)
    for s in batch:
        batch[s]["actions"] = jnp.broadcast_to(const, batch[s]["actions"].shape)

    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(400):
        state, metrics = jitted(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["lang/action_loss"]))

    early = float(np.mean(losses[:50]))
    late = float(np.mean(losses[-50:]))
    # measured: 0.83 -> 0.48; margin for rng drift
    assert late < 0.75 * early, (early, late)

    # sampled chunks must move toward the target action (measured:
    # untrained 0.44 -> trained 0.21)
    _, state0 = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    emb_args = (batch["lang"]["rgb_static"][:, :-1],
                batch["lang"]["rgb_gripper"][:, :-1])

    def chunk_mse(params):
        emb = net.apply({"params": params}, *emb_args, method="perceive")
        goal = net.apply({"params": params}, batch["lang"]["lang_tokens"],
                         method="encode_language_goal")
        pred = denoise_actions(net, params, emb, goal, jax.random.PRNGKey(2),
                               modality="lang")
        return float(np.mean(np.square(np.asarray(pred)
                                       - np.asarray(batch["lang"]["actions"]))))

    assert chunk_mse(state.params) < 0.7 * chunk_mse(state0.params)
