"""Benchmark harness — training throughput of the flagship MDT-V agent.

Headline metric (BASELINE.md driver target): action-chunks/sec/chip of the
full dual-modality train step (diffusion + masked-foresight + contrastive
losses, frozen CLIP/Voltron towers in-program) on production shapes:
224px dual-camera frames, 112px gen targets, 10x7 action chunks.
Target: >= 5,000 chunks/sec/chip on v5e. vs_baseline = value / 5000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Also reports (to stderr) the 10-step DDIM sampling latency p50, the second
driver target (< 30 ms/chunk).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step
    from mdt_policy_tpu.agents.mdtv_agent import denoise_actions

    cfg = MDTVConfig()
    rng = np.random.default_rng(0)

    def make_batch(B):
        # camera frames in bf16 (the preprocessing stage's output dtype);
        # f32 frames alone would blow HBM at production batch sizes
        def scope():
            return {
                "rgb_static": jnp.asarray(rng.uniform(size=(B, 2, 224, 224, 3)), jnp.bfloat16),
                "rgb_gripper": jnp.asarray(rng.uniform(size=(B, 2, 224, 224, 3)), jnp.bfloat16),
                "gen_static": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
                "gen_gripper": jnp.asarray(rng.uniform(size=(B, 112, 112, 3)), jnp.float32),
                "actions": jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32),
                "lang_tokens": jnp.asarray(rng.integers(1, 49408, size=(B, 77)), jnp.int32),
            }
        return {"vis": scope(), "lang": scope()}

    # B=512/modality saturates the v5e MXU (B=1024 exceeds 16G HBM); the step
    # time is ~flat from B=64 to B=512 (launch-latency floor ~90ms over the
    # remote tunnel), so large batch is free throughput
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = make_batch(B)
    print(f"init (B={B} per modality) ...", file=sys.stderr)
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])

    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, metrics = jitted(state, batch, key)
    jax.block_until_ready(metrics["train/total_loss"])
    print(f"train-step compile+first-run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = jitted(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["train/total_loss"])
    dt = (time.perf_counter() - t0) / n_steps
    chunks_per_sec = 2 * B / dt  # both modality streams count as chunks
    print(f"train step: {dt*1e3:.1f} ms -> {chunks_per_sec:.0f} chunks/s/chip",
          file=sys.stderr)

    # --- secondary: 10-step DDIM sampling latency (p50), batch 1 ---
    b1 = make_batch(1)["lang"]

    @jax.jit
    def sample(params, rs, rg, toks, k):
        emb = net.apply({"params": params}, rs, rg,
                        method="compute_voltron_embeddings")
        goal = net.apply({"params": params}, toks, method="encode_language_goal")
        return denoise_actions(net, params, emb, goal, k, modality="lang")

    args = (state.params, b1["rgb_static"][:, :-1], b1["rgb_gripper"][:, :-1],
            b1["lang_tokens"])
    out = sample(*args, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    lat = []
    for i in range(20):
        t0 = time.perf_counter()
        out = sample(*args, jax.random.PRNGKey(i))
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat)) * 1e3
    print(f"10-step DDIM sampling p50: {p50:.1f} ms (target < 30 ms)",
          file=sys.stderr)

    # --- tertiary: disk-backed input-pipeline throughput (VERDICT r1 #4) ---
    disk = None
    try:
        import shutil
        import tempfile
        from pathlib import Path
        from mdt_policy_tpu.data.bench_loader import bench as loader_bench, generate_dataset
        from mdt_policy_tpu.data.extract import extract_by_key, extract_frames
        tmp = tempfile.mkdtemp(prefix="mdt_bench_disk_")
        root = generate_dataset(Path(tmp), 1500)
        extract_by_key(root)
        extract_frames(root)
        disk = loader_bench(root, batch_size=128, steps=40)
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"disk input pipeline: {disk['chunks_per_sec']:.0f} chunks/s "
              f"({disk['num_workers']} worker(s))", file=sys.stderr)
    except Exception as e:  # bench must never fail on the aux metric
        print(f"disk loader bench skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "mdtv_train_chunks_per_sec_per_chip",
        "value": round(chunks_per_sec, 1),
        "unit": "chunks/s/chip",
        "vs_baseline": round(chunks_per_sec / 5000.0, 3),
        "extras": {
            "ddim10_p50_ms": round(p50, 2),
            "disk_loader_chunks_per_sec":
                round(disk["chunks_per_sec"], 1) if disk else None,
            "disk_loader_workers": disk["num_workers"] if disk else None,
        },
    }))


if __name__ == "__main__":
    main()
