"""A/B the production train step across MDTVConfig field overrides.

Usage:
  python tools/ab_step.py 'remat_perceiver=False' 'perceiver_factored_kv=True'
  python tools/ab_step.py ''          # just time the default config

Each argument is a comma-separated set of field=value overrides applied to
MDTVConfig; the full dual-modality B=512 step is compiled and timed with
the honest fetch-barrier methodology (docs/BENCHMARKING.md).

AB_STEP_PRECOMPUTED=1 switches the batch to the offline-embedding cache mode
(voltron_tokens + image_latent_goal instead of camera frames — the
data.use_extracted_embeddings training step).
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

V5E_PEAK_FLOPS = 197e12
B = int(os.environ.get("AB_STEP_B", "512"))


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
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step

    cfg = dataclasses.replace(MDTVConfig(), **overrides)
    rng = np.random.default_rng(0)
    precomputed = os.environ.get("AB_STEP_PRECOMPUTED") == "1"

    def scope():
        if precomputed:
            n_tok = 2 * (cfg.img_size // cfg.vit_patch) ** 2
            return {
                "voltron_tokens": jnp.asarray(
                    rng.normal(size=(B, n_tok, cfg.perceiver_dim)), jnp.bfloat16),
                "image_latent_goal": jnp.asarray(
                    rng.normal(size=(B, cfg.clip_embed_dim)), jnp.float32),
                "gen_static": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
                "gen_gripper": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
                "actions": jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32),
                "lang_tokens": jnp.asarray(rng.integers(1, 49408, size=(B, 77)), jnp.int32),
            }
        return {
            "rgb_static": jnp.asarray(rng.uniform(size=(B, 2, 224, 224, 3)), jnp.bfloat16),
            "rgb_gripper": jnp.asarray(rng.uniform(size=(B, 2, 224, 224, 3)), jnp.bfloat16),
            "gen_static": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
            "gen_gripper": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
            "actions": jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32),
            "lang_tokens": jnp.asarray(rng.integers(1, 49408, size=(B, 77)), jnp.int32),
        }

    batch = {"vis": scope(), "lang": scope()}
    if precomputed and os.environ.get("AB_STEP_LANG_CACHED", "1") == "1":
        # full cache mode: the text goal is cached too (extract_lang_goals)
        batch["lang"]["lang_latent_goal"] = jnp.asarray(
            rng.normal(size=(B, cfg.clip_embed_dim)), jnp.float32)
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    # ONE compile per variant: the AOT executable serves cost_analysis AND
    # the loops (the remote compile service never dedupes, so a discarded
    # lower().compile() would double the per-variant one-time cost)
    t0 = time.perf_counter()
    compiled = jitted.lower(state, batch, key).compile()
    compile_s = time.perf_counter() - t0
    flops = None
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops")) if cost and cost.get("flops") else None
        if flops:
            # XLA omits pallas_call flops; add the tower-attention matmuls
            from mdt_policy_tpu.utils.flops import tower_custom_call_flops
            flops += tower_custom_call_flops(cfg, B)
    except Exception:
        pass
    t0 = time.perf_counter()
    state, metrics = compiled(state, batch, key)
    np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
    print(f"  compile {compile_s:.0f}s + first-run {time.perf_counter()-t0:.0f}s; "
          f"loss={float(np.asarray(metrics["train/total_loss"])):.4f}")
    dts = []
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(6):
            state, _ = compiled(state, batch, jax.random.fold_in(key, rep * 6 + i))
        np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
        dts.append((time.perf_counter() - t0) / 6)
    dt = min(dts)
    mxu = (flops / dt / V5E_PEAK_FLOPS * 100) if flops else None
    print(f"  step {dt*1e3:7.1f} ms -> {2*B/dt:7.0f} chunks/s/chip"
          + (f"  MXU {mxu:4.1f}%" if mxu else "")
          + f"   (loops: {', '.join(f'{d*1e3:.0f}' for d in dts)})")


def main():
    from mdt_policy_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    prng = os.environ.get("AB_STEP_PRNG")
    if prng:  # e.g. AB_STEP_PRNG=rbg — price the threefry dropout-bits cost
        import jax
        jax.config.update("jax_default_prng_impl", prng)
        print(f"(prng impl: {prng})")
    for ov in sys.argv[1:] or [""]:
        print(f"== MDTVConfig({ov}) B={B}/modality ==", flush=True)
        run(parse(ov))


if __name__ == "__main__":
    main()
