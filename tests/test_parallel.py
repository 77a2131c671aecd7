"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the full
MDT-V train step must compile and run with a data-sharded batch and
replicated params, and per-device losses must match the single-device run
(the contrastive loss sees the GLOBAL batch either way)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.agents import init_agent, train_step
from mdt_policy_tpu.parallel import make_mesh, replicate_tree, shard_batch

from test_agent import TINY, make_batch


@pytest.fixture(scope="module")
def agent():
    batch = make_batch()
    net, state = init_agent(TINY, jax.random.PRNGKey(0), batch["lang"])
    return net, state, batch


def test_mesh_has_8_devices(eight_devices):
    mesh = make_mesh()
    assert mesh.devices.size >= 8


@pytest.mark.slow  # full-agent compile, ~2 min on this host
def test_sharded_train_step_matches_single_device(agent, eight_devices):
    net, state, batch = agent
    # pad batch to 8 so it shards evenly
    def grow(b):
        return jax.tree.map(lambda x: jnp.concatenate([x] * 4, axis=0), b)
    big = {k: grow(v) for k, v in batch.items()}

    jitted = jax.jit(partial(train_step, net))
    rng = jax.random.PRNGKey(7)
    _, m_single = jitted(state, big, rng)

    mesh = make_mesh(eight_devices[:8])
    state_r = jax.tree.map(lambda x: x, state)  # fresh copy
    state_r = state_r.replace(
        params=replicate_tree(state.params, mesh),
        ema_params=replicate_tree(state.ema_params, mesh),
        opt_state=replicate_tree(state.opt_state, mesh),
    )
    big_sharded = {k: shard_batch(v, mesh) for k, v in big.items()}
    new_state, m_sharded = jitted(state_r, big_sharded, rng)

    # losses involve a global-batch contrastive term; sharded == unsharded
    np.testing.assert_allclose(float(m_sharded["train/total_loss"]),
                               float(m_single["train/total_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_sharded["lang/cont_loss"]),
                               float(m_single["lang/cont_loss"]), rtol=1e-4)
    assert int(new_state.step) == 1
