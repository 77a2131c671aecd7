"""Ablation timing probe for the production train step on the real chip.

Breaks the full dual-modality step (bench.py headline) into its compute
phases and times each with the honest-barrier methodology of
docs/BENCHMARKING.md: every timed loop is CHAINED (iteration i+1 consumes a
scalar derived from iteration i's output) and ends in a real device->host
fetch, so neither dispatch pipelining nor a lying block_until_ready can
shortcut it. Each phase also reports XLA's own FLOP count and the implied
MXU utilization against the v5e bf16 peak.

Usage:  python tools/perf_probe.py [B]   (default B=512 per modality)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

import numpy as np

V5E_PEAK_FLOPS = 197e12


def _flops(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops")) if cost and cost.get("flops") else None
    except Exception:
        return None


def chain_bench(name, fn, feedback_leaf, *args, n=8, reps=2):
    """Time `fn(*args, carry_scalar)` chained through a scalar of its output.

    fn must accept a trailing float32 scalar and add it (times 0 is fine) to
    one of its inputs; feedback_leaf(out) -> scalar array from the output.
    Returns (dt_seconds, flops).
    """
    import jax
    import jax.numpy as jnp

    jitted = jax.jit(fn)
    carry = jnp.zeros((), jnp.float32)
    out = jitted(*args, carry)
    np.asarray(feedback_leaf(out))  # warmup + drain
    flops = _flops(jitted, *args, carry)
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = jitted(*args, feedback_leaf(out))
        np.asarray(feedback_leaf(out))
        dts.append((time.perf_counter() - t0) / n)
    dt = min(dts)
    mxu = (flops / dt / V5E_PEAK_FLOPS * 100) if flops else None
    print(f"{name:34s} {dt*1e3:9.1f} ms"
          + (f"  {flops/1e12:7.2f} TFLOP  MXU {mxu:5.1f}%" if flops else "")
          + f"   (loops: {', '.join(f'{d*1e3:.0f}' for d in dts)})")
    return dt, flops


def main():
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = MDTVConfig()
    rng = np.random.default_rng(0)

    def scope(B):
        return {
            "rgb_static": jnp.asarray(rng.uniform(size=(B, 2, 224, 224, 3)), jnp.float32),
            "rgb_gripper": jnp.asarray(rng.uniform(size=(B, 2, 224, 224, 3)), jnp.float32),
            "gen_static": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
            "gen_gripper": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
            "actions": jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32),
            "lang_tokens": jnp.asarray(rng.integers(1, 49408, size=(B, 77)), jnp.int32),
        }

    batch = {"vis": scope(B), "lang": scope(B)}
    print(f"init (B={B}/modality) ...", flush=True)
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    params = state.params

    # --- 0. tunnel dispatch floor -------------------------------------------
    def bump(x, c):
        return x + 1.0 + c

    chain_bench("dispatch floor (scalar bump)", bump, lambda o: o,
                jnp.zeros(()), n=20)

    # --- 1. frozen towers, forward only -------------------------------------
    rs = batch["lang"]["rgb_static"][:, :-1]
    rg = batch["lang"]["rgb_gripper"][:, :-1]

    def voltron(p, a, b, c):
        out = net.apply({"params": p}, a + c, b, method="compute_voltron_embeddings")
        return out["state_images"]

    chain_bench("voltron+perceiver (1 scope)", voltron,
                lambda o: o.reshape(-1)[0].astype(jnp.float32) * 0.0, params, rs, rg)

    goal_img = batch["lang"]["rgb_static"][:, -1]

    def clipv(p, img, c):
        return net.apply({"params": p}, img + c, method="encode_visual_goal")

    chain_bench("CLIP vision goal (1 scope)", clipv,
                lambda o: o.reshape(-1)[0] * 0.0, params, goal_img)

    def clipt(p, toks, c):
        out = net.apply({"params": p}, toks, method="encode_language_goal")
        return out + c

    chain_bench("CLIP text goal (1 scope)", clipt,
                lambda o: o.reshape(-1)[0] * 0.0, params, batch["lang"]["lang_tokens"])

    # --- 2. one full scope loss forward (towers + denoiser + heads) ---------
    def scope_fwd(p, b, c):
        out = net.apply({"params": p},
                        {**b, "actions": b["actions"] + c}, modality="lang",
                        train=True,
                        rngs={k: jax.random.PRNGKey(i) for i, k in enumerate(
                            ("dropout", "sigma", "noise", "mask", "goal_mask"))})
        return out["total_loss"]

    chain_bench("1-scope loss forward (lang)", scope_fwd,
                lambda o: o * 0.0, params, batch["lang"])

    # --- 3. the full train step (fwd+bwd+opt, both scopes) ------------------
    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    state2, _ = jitted(state, batch, key)
    np.asarray(state2.params["inner"]["tok_emb"]["kernel"][0, 0])
    flops = _flops(jitted, state2, batch, key)
    dts = []
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(6):
            state2, _ = jitted(state2, batch, jax.random.fold_in(key, i))
        np.asarray(state2.params["inner"]["tok_emb"]["kernel"][0, 0])
        dts.append((time.perf_counter() - t0) / 6)
    dt = min(dts)
    mxu = (flops / dt / V5E_PEAK_FLOPS * 100) if flops else None
    print(f"{'FULL train step (2 scopes)':34s} {dt*1e3:9.1f} ms"
          + (f"  {flops/1e12:7.2f} TFLOP  MXU {mxu:5.1f}%" if flops else "")
          + f"   (loops: {', '.join(f'{d*1e3:.0f}' for d in dts)})")
    print(f"  -> {2 * B / dt:.0f} chunks/s/chip")


if __name__ == "__main__":
    main()
