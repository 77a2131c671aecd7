"""Full-train-step configuration sweep with honest barriers.

Usage: python tools/step_sweep.py B[,B...] [remat|noremat|both]
Each (B, remat) config compiles and times the production dual-modality step.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_FLOPS = 197e12


def run(B: int, remat: bool) -> None:
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step

    cfg = dataclasses.replace(MDTVConfig(), remat_perceiver=remat)
    rng = np.random.default_rng(0)

    def scope():
        return {
            "rgb_static": jnp.asarray(rng.uniform(size=(B, 2, 224, 224, 3)), jnp.float32),
            "rgb_gripper": jnp.asarray(rng.uniform(size=(B, 2, 224, 224, 3)), jnp.float32),
            "gen_static": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
            "gen_gripper": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
            "actions": jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32),
            "lang_tokens": jnp.asarray(rng.integers(1, 49408, size=(B, 77)), jnp.int32),
        }

    batch = {"vis": scope(), "lang": scope()}
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    try:
        t0 = time.perf_counter()
        state, _ = jitted(state, batch, key)
        np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
        compile_s = time.perf_counter() - t0
        flops = None
        try:
            cost = jitted.lower(state, batch, key).compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops"))
        except Exception:
            pass
        dts = []
        for rep in range(2):
            t0 = time.perf_counter()
            for i in range(5):
                state, _ = jitted(state, batch, jax.random.fold_in(key, rep * 5 + i))
            np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
            dts.append((time.perf_counter() - t0) / 5)
        dt = min(dts)
        mxu = flops / dt / V5E_PEAK_FLOPS * 100 if flops else 0
        print(f"B={B:5d} remat={int(remat)}  {dt*1e3:8.0f} ms  "
              f"{2*B/dt:7.0f} chunks/s  "
              + (f"{flops/1e12:6.1f} TFLOP  MXU {mxu:4.1f}%  " if flops else "")
              + f"compile {compile_s:.0f}s  (loops: "
              + ", ".join(f"{d*1e3:.0f}" for d in dts) + ")", flush=True)
    except Exception as e:
        detail = "\n".join(l for l in str(e).splitlines()
                           if "\x1b[2m" not in l)[:3000]
        print(f"B={B:5d} remat={int(remat)}  FAILED: {type(e).__name__}: "
              f"{detail}", flush=True)


def main():
    bs = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "512").split(",")]
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    remats = {"remat": [True], "noremat": [False], "both": [False, True]}[mode]
    for B in bs:
        for r in remats:
            run(B, r)


if __name__ == "__main__":
    main()
