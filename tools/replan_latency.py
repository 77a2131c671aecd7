"""Closed-loop replan latency A/B across MDTVConfig overrides.

Times ONLY the production steady-state replan (perceive + 10-step DDIM with
the subtask's goal embedding cached — agents/mdtv_agent.MDTVPolicy's
_predict_emb path) at batch 1, without compiling the train step, so a
latency experiment costs seconds of compile instead of minutes.

Usage:
  python tools/replan_latency.py '' 'denoiser_compute_dtype=bfloat16'

Reports, per variant: per-call p50 including the host fetch (what this
host's tunnel shows) and the chained device-side latency (what a co-located
deployment pays — each replan data-depends on the previous chunk, one fetch
at the end; methodology in docs/BENCHMARKING.md).
"""

from __future__ import annotations

import ast
import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse(ov: str) -> dict:
    out = {}
    for part in filter(None, ov.split(",")):
        k, v = part.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def run(overrides: dict) -> None:
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.agents import MDTVConfig, init_agent
    from mdt_policy_tpu.agents.mdtv_agent import denoise_actions

    cfg = dataclasses.replace(MDTVConfig(), **overrides)
    rng = np.random.default_rng(0)
    b1 = {
        "rgb_static": jnp.asarray(rng.uniform(size=(1, 2, 224, 224, 3)), jnp.bfloat16),
        "rgb_gripper": jnp.asarray(rng.uniform(size=(1, 2, 224, 224, 3)), jnp.bfloat16),
        "gen_static": jnp.asarray(rng.uniform(size=(1, 112, 112, 3)), jnp.float32),
        "gen_gripper": jnp.asarray(rng.uniform(size=(1, 112, 112, 3)), jnp.float32),
        "actions": jnp.asarray(rng.normal(size=(1, 10, 7)), jnp.float32),
        "lang_tokens": jnp.asarray(rng.integers(1, 49408, size=(1, 77)), jnp.int32),
    }
    net, state = init_agent(cfg, jax.random.PRNGKey(0), b1)

    @jax.jit
    def encode_goal(params, toks):
        return net.apply({"params": params}, toks, method="encode_language_goal")

    @jax.jit
    def replan(params, rs, rg, goal, k, carry):
        emb = net.apply({"params": params},
                        rs + (jnp.reshape(carry, (-1,))[0] * 0).astype(rs.dtype),
                        rg, method="compute_voltron_embeddings")
        return denoise_actions(net, params, emb, goal, k, modality="lang")

    goal = encode_goal(state.params, b1["lang_tokens"])
    np.asarray(goal)
    args = (state.params, b1["rgb_static"][:, :-1], b1["rgb_gripper"][:, :-1],
            goal)
    zero = jnp.zeros((1, 10, 7))
    keys = [jax.random.PRNGKey(i) for i in range(50)]
    t0 = time.perf_counter()
    np.asarray(replan(*args, keys[0], zero))
    print(f"  replan compile+first: {time.perf_counter()-t0:.1f}s")
    for i in range(5):
        np.asarray(replan(*args, keys[i], zero))
    lat = []
    for i in range(50):
        t0 = time.perf_counter()
        np.asarray(replan(*args, keys[i], zero))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat)) * 1e3

    out = replan(*args, keys[0], zero)
    n_chain, chain_ms = 20, []
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(n_chain):
            out = replan(*args, keys[i], out)
        np.asarray(out)
        chain_ms.append((time.perf_counter() - t0) / n_chain * 1e3)
    device_ms = min(chain_ms)
    print(f"  p50 (incl. fetch) {p50:6.2f} ms   device-side (chained) "
          f"{device_ms:5.2f} ms   (chains: {', '.join(f'{c:.2f}' for c in chain_ms)})")


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize bakes JAX_PLATFORMS=axon into the plugin
        # registration; the env var only sticks via the config knob
        import jax
        jax.config.update("jax_platforms", "cpu")
    from mdt_policy_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    for ov in sys.argv[1:] or [""]:
        print(f"== MDTVConfig({ov}) B=1 replan ==", flush=True)
        run(parse(ov))


if __name__ == "__main__":
    main()
