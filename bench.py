"""Benchmark harness — training throughput of the flagship MDT-V agent.

Headline metric (BASELINE.md driver target): action-chunks/sec/chip of the
full dual-modality train step (diffusion + masked-foresight + contrastive
losses, frozen CLIP/Voltron towers in-program) on production shapes:
224px dual-camera frames, 112px gen targets, 10x7 action chunks.

STRUCTURE (round 4): every bench mode runs in its OWN subprocess, launched
sequentially by the orchestrator in this file. Round 3's single-process run
OOM'd on the chip after the full-step bench (the full-step state/batch/
executables still held HBM when the cache-mode bench initialized) and the
poisoned process then failed every later bench too — three modes reported
null. A fresh process per mode releases the chip completely between modes
and turns any one failure into a single null instead of a cascade. Modes
never run concurrently (the TPU tunnel serializes).

MEASUREMENT INTEGRITY (docs/BENCHMARKING.md): on this container's remote
TPU tunnel `jax.block_until_ready` is NOT a reliable execution barrier —
loops ending in it report step times far beyond the chip's peak-FLOP bound
(the same program has "measured" 13 ms and 1,142 ms per step). Every timed
region here therefore ends in an actual device->host fetch of an updated
trainable param leaf, which cannot complete before the whole donation chain
of optimizer updates has executed. The implied MXU utilization against
XLA's own cost model is printed as a self-check; >100% marks a measurement
invalid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from functools import partial

import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16, one v5e chip

# (name, timeout_s) — sequential order. Timeouts are generous because a
# cold persistent-compile-cache run pays minutes of XLA compile per mode.
SECTIONS = (
    ("full", 2400),
    ("precomputed", 1500),
    ("sustained", 2400),
    ("denoiser", 1200),
    ("mdt", 1500),
    ("aot", 900),
    ("disk", 1200),
)


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def _tpu_preflight(timeout_s: int = 1500) -> bool:
    """One bounded probe of the TPU backend before any section runs. A DEAD
    axon tunnel makes every section subprocess hang ~20 min in the client's
    init-retry loop before raising UNAVAILABLE — five sections of that is
    ~100 min of driver wall for guaranteed nulls. A healthy tunnel answers
    jax.devices() + a tiny matmul in seconds (compile-service latency only
    affects big programs), so a generous timeout cannot misclassify a
    merely-slow tunnel."""
    code = ("import jax, jax.numpy as jnp\n"
            "d = jax.devices()\n"
            "x = jnp.ones((128, 128))\n"
            "print('preflight ok:', d[0].platform, float((x @ x).sum()))\n")
    try:
        proc = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                              capture_output=True, text=True)
        ok = proc.returncode == 0
        if not ok:
            print(f"[bench] TPU preflight FAILED (rc={proc.returncode}): "
                  f"{(proc.stderr or '').strip().splitlines()[-1:]}",
                  file=sys.stderr)
        return ok
    except subprocess.TimeoutExpired:
        print(f"[bench] TPU preflight timed out after {timeout_s}s",
              file=sys.stderr)
        return False


def orchestrate(B: int) -> None:
    """Run every bench section in its own subprocess, then assemble and
    print the single driver-facing JSON line. The orchestrator itself never
    initializes a JAX backend."""
    results: dict[str, dict] = {}
    t_start = time.perf_counter()
    tunnel_ok = True
    if os.environ.get("MDT_BENCH_SKIP_PREFLIGHT") != "1":
        tunnel_ok = _tpu_preflight(
            int(os.environ.get("MDT_BENCH_PREFLIGHT_TIMEOUT", "1500")))
        if not tunnel_ok:
            print("[bench] tunnel down — running host-only sections; TPU "
                  "metrics will be null", file=sys.stderr)
    for name, timeout_s in SECTIONS:
        if os.environ.get(f"MDT_BENCH_SKIP_{name.upper()}") == "1":
            continue
        if not tunnel_ok and name != "disk":
            continue
        out_path = os.path.join(tempfile.gettempdir(), f"mdt_bench_{name}.json")
        try:
            os.unlink(out_path)
        except OSError:
            pass
        env = dict(os.environ)
        if name == "disk":
            # loader benches are host-only: never touch the TPU tunnel
            env["JAX_PLATFORMS"] = "cpu"
        print(f"[bench] section {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--section", name, "--out", out_path, str(B)],
                timeout=timeout_s, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        dt = time.perf_counter() - t0
        if os.path.exists(out_path):
            try:
                with open(out_path) as f:
                    results[name] = json.load(f)
            except Exception as e:
                print(f"[bench] section {name}: unreadable result ({e})",
                      file=sys.stderr)
        if name not in results:
            print(f"[bench] section {name} FAILED (rc={rc}, {dt:.0f}s) — "
                  f"its metrics will be null", file=sys.stderr)
        else:
            print(f"[bench] section {name} done in {dt:.0f}s",
                  file=sys.stderr)

    full = results.get("full", {})
    pre = results.get("precomputed", {})
    sus = results.get("sustained", {})
    den = results.get("denoiser", {})
    mdt = results.get("mdt", {})
    aot = results.get("aot", {})
    disk_res = results.get("disk", {})
    disk = disk_res.get("disk")
    # null — not 0.0 — when the full section produced no result: a failed
    # section must not read as a measured 0 chunks/s downstream
    chunks_per_sec = full.get("chunks_per_sec")

    print(json.dumps({
        "metric": "mdtv_train_chunks_per_sec_per_chip",
        "value": round(chunks_per_sec, 1) if chunks_per_sec else None,
        "unit": "chunks/s/chip",
        "vs_baseline": round(chunks_per_sec / 5000.0, 3) if chunks_per_sec else None,
        "extras": {
            "barrier": "device_get(param leaf) — see docs/BENCHMARKING.md",
            "flops_per_step_tflop": full.get("flops_tflop"),
            "pallas_attention_tflop": full.get("pallas_tflop"),
            "mxu_utilization_pct": full.get("mxu_pct"),
            "physical_ceiling_chunks_per_sec": full.get("ceiling"),
            # steady-state replan: perceive + 10-step DDIM with the subtask's
            # goal embedding cached (the policy's _predict_emb path); the
            # once-per-subtask text encode is ddim10_goal_encode_ms
            "ddim10_closed_loop_p50_ms": full.get("p50_ms"),
            "ddim10_goal_encode_ms": full.get("goal_encode_ms"),
            "ddim10_device_side_ms": full.get("device_ms"),
            # median round trip of fetching ONE scalar from a trivial jitted
            # program — the tunnel's latency floor that bounds p50 from below
            # on this host (a co-located deployment pays device_ms instead)
            "tunnel_rtt_floor_ms": full.get("rtt_floor_ms"),
            "denoiser_only_chunks_per_sec": den.get("chunks_per_sec"),
            # full step (all 3 losses) from the offline embedding cache —
            # the data.use_extracted_embeddings training mode
            "precomputed_embeddings_chunks_per_sec": pre.get("chunks_per_sec"),
            "precomputed_embeddings_tflop_per_step": pre.get("tflop"),
            # the RECOMMENDED production recipe (docs/BENCHMARKING.md): train
            # from the offline embedding cache with K DrQ-shift variants per
            # frame (extract_embeddings --aug-variants). `sustained` is that
            # recipe measured END TO END — disk loader + H2D prefetch + the
            # full three-loss step overlapped for >=30 s — not a step-only
            # number; `loader_feed` is what this host's core(s) alone decode.
            "production_config": "cache_mode+aug_variants",
            "cache_mode_sustained_chunks_per_sec": sus.get("chunks_per_sec"),
            "cache_mode_sustained": {
                k: sus.get(k) for k in
                ("steps", "seconds", "loader_feed_chunks_per_sec",
                 "h2d_chunks_per_sec", "h2d_gbytes_per_sec",
                 "decode_threads", "host_cores", "aug_variants")
            } if sus else None,
            "mdt_resnet_chunks_per_sec": mdt.get("chunks_per_sec"),
            "mdt_flops_per_step_tflop": mdt.get("flops_tflop"),
            "mdt_mxu_pct": mdt.get("mxu_pct"),
            "mdt_physical_ceiling_chunks_per_sec": mdt.get("ceiling"),
            "disk_loader_chunks_per_sec":
                round(disk["chunks_per_sec"], 1) if disk else None,
            "disk_loader_workers": disk["num_workers"] if disk else None,
            # embedding-cache mode input path (feeds the cache-mode step)
            "disk_embedding_loader": disk_res.get("emb"),
            # shard-process scaling model: CPU-ms per chunk under concurrent
            # N-shard load and the implied aggregate at k dedicated cores
            "disk_loader_scaling": disk_res.get("scaling"),
            # per-section compile+first-run seconds: with the persistent
            # compile cache warm (same program already built on this host)
            # these drop from minutes to seconds — docs/BENCHMARKING.md
            "compile_first_run_s": {
                k: results[k].get("compile_s")
                for k in ("full", "precomputed", "sustained", "denoiser", "mdt")
                if k in results and results[k].get("compile_s") is not None
            },
            # one-time cost split for the headline program: host trace+lower
            # vs XLA compile (near-zero when the persistent cache is warm)
            "full_trace_lower_s": full.get("trace_lower_s"),
            "full_xla_compile_s": full.get("xla_compile_s"),
            # can a serialized executable skip the remote compile service in
            # a fresh process? (round-4 VERDICT #5; docs/BENCHMARKING.md)
            "aot_serialize_works": aot.get("aot_serialize_works"),
            "aot_deserialize_works": aot.get("aot_deserialize_works"),
            "aot_detail": {k: aot.get(k) for k in
                           ("cold_compile_s", "load_run_s", "blob_mb",
                            "serialize_error", "deserialize_error")
                           if aot.get(k) is not None} or None,
            # false = the bounded preflight probe could not reach the TPU
            # backend, so every TPU section was skipped (nulls above are a
            # tunnel outage, not framework failures)
            "tunnel_preflight_ok": tunnel_ok,
            "wall_time_s": round(time.perf_counter() - t_start, 1),
        },
    }))


# --------------------------------------------------------------------------
# shared helpers (run inside section subprocesses)
# --------------------------------------------------------------------------

def _make_batch(B, rng, cfg=None):
    import jax.numpy as jnp
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


# --------------------------------------------------------------------------
# section: full — headline in-program-tower step + closed-loop latency
# --------------------------------------------------------------------------

def section_full(B: int) -> dict:
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step
    from mdt_policy_tpu.agents.mdtv_agent import denoise_actions

    cfg = MDTVConfig()
    rng = np.random.default_rng(0)
    batch = _make_batch(B, rng)
    print(f"init (B={B} per modality) ...", file=sys.stderr)
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])

    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    def drain(state):
        """TRUE barrier: fetch an updated param leaf (real device->host
        bytes; depends on every optimizer update in the donation chain)."""
        np.asarray(state.params["inner"]["tok_emb"]["kernel"])

    # ONE compile, reused everywhere: the AOT executable serves cost
    # analysis AND the timed loops. (Round 3 compiled the program twice —
    # once inside cost_analysis' lower().compile(), once on the first
    # jitted() call — and the persistent compile cache demonstrably does
    # not dedupe compiles on this remote backend: an identical program
    # recompiled 497 s in a fresh process with a warm cache dir. The
    # explicit split below is the honest one-time-cost accounting.)
    t0 = time.perf_counter()
    lowered = jitted.lower(state, batch, key)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    xla_compile_s = time.perf_counter() - t0
    print(f"trace+lower {lower_s:.1f}s, XLA compile {xla_compile_s:.1f}s",
          file=sys.stderr)

    # XLA's own FLOP count for the step — the physics self-check. XLA treats
    # pallas_call as an opaque zero-flop custom call, so the fused tower-
    # attention kernels' matmuls are added analytically (utils/flops.py) to
    # make the utilization and ceiling figures exact.
    flops = pallas_flops = None
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops")) if cost and cost.get("flops") else None
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
    if flops:
        from mdt_policy_tpu.utils.flops import tower_custom_call_flops
        pallas_flops = tower_custom_call_flops(cfg, B)
        flops += pallas_flops

    t0 = time.perf_counter()
    state, metrics = compiled(state, batch, key)
    drain(state)
    first_run_s = time.perf_counter() - t0
    compile_s = lower_s + xla_compile_s + first_run_s  # total one-time cost
    print(f"first run (H2D transfers + step): {first_run_s:.1f}s "
          f"-> one-time total {compile_s:.1f}s", file=sys.stderr)

    # best-of-2 drained mini-loops: guards against transient tunnel stalls
    # (the same program has measured 1.1 s and >60 s per step minutes apart)
    n_steps, dts = 6, []
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = compiled(state, batch,
                                      jax.random.fold_in(key, rep * n_steps + i))
        drain(state)
        dts.append((time.perf_counter() - t0) / n_steps)
    print("train-step loops: " + ", ".join(f"{d*1e3:.0f} ms" for d in dts),
          file=sys.stderr)
    dt = min(dts)
    chunks_per_sec = 2 * B / dt  # both modality streams count as chunks
    mxu_pct = (flops / dt / V5E_PEAK_FLOPS * 100) if flops else None
    print(f"train step: {dt*1e3:.0f} ms -> {chunks_per_sec:.0f} chunks/s/chip"
          + (f" | {flops/1e12:.1f} TFLOP/step, MXU {mxu_pct:.0f}%" if flops else ""),
          file=sys.stderr)
    if mxu_pct and mxu_pct > 100:
        print("WARNING: implied utilization exceeds chip peak — measurement "
              "invalid (broken barrier?)", file=sys.stderr)

    # --- tunnel RTT floor: median fetch time of ONE scalar from a trivial
    # jitted program — the per-call latency the tunnel imposes on ANY
    # closed-loop number measured from this host ---
    tiny = jax.jit(lambda x: x + 1.0)
    acc = tiny(jnp.float32(0.0))
    for _ in range(5):  # warm the path
        acc = tiny(acc)
        np.asarray(acc)
    rtts = []
    for _ in range(40):
        t0 = time.perf_counter()
        acc = tiny(acc)
        np.asarray(acc)
        rtts.append(time.perf_counter() - t0)
    rtt_floor_ms = float(np.median(rtts)) * 1e3
    print(f"tunnel RTT floor (1-scalar fetch): {rtt_floor_ms:.2f} ms",
          file=sys.stderr)

    # --- secondary: 10-step DDIM closed-loop latency, batch 1, REAL fetch.
    # The timed program is the production STEADY-STATE replan: within a
    # subtask the language goal does not change, so the policy encodes it
    # once (MDTVPolicy._predict_emb, agents/mdtv_agent.py) and every replan
    # runs perceive + 10-step sampler only. The one-per-subtask goal encode
    # is measured separately (ddim10_goal_encode_ms); round 4 timed the text
    # tower inside every rep AND constructed a PRNGKey device array per rep
    # over the tunnel — both hoisted per round-4 VERDICT #3. ---
    b1 = _make_batch(1, rng)["lang"]

    @jax.jit
    def encode_goal(params, toks):
        return net.apply({"params": params}, toks,
                         method="encode_language_goal")

    @jax.jit
    def replan(params, rs, rg, goal, k, carry):
        # carry: previous action chunk (or zeros) — folded in as a zero term
        # INSIDE the jitted program so chained timing loops create a data
        # dependency without any eager per-op tunnel dispatches
        emb = net.apply({"params": params},
                        rs + (jnp.reshape(carry, (-1,))[0] * 0).astype(rs.dtype),
                        rg, method="compute_voltron_embeddings")
        return denoise_actions(net, params, emb, goal, k, modality="lang")

    # goal encode: once per subtask in production; p50 of its own fetch loop
    goal = encode_goal(state.params, b1["lang_tokens"])
    np.asarray(goal)
    gl = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(encode_goal(state.params, b1["lang_tokens"]))
        gl.append(time.perf_counter() - t0)
    goal_ms = float(np.median(gl)) * 1e3
    print(f"language-goal encode (once per subtask): {goal_ms:.1f} ms",
          file=sys.stderr)

    args = (state.params, b1["rgb_static"][:, :-1], b1["rgb_gripper"][:, :-1],
            goal)
    zero = jnp.zeros((1, 10, 7))
    # keys precomputed OUTSIDE the timed loop (each PRNGKey(i) is a device-
    # array creation — a full tunnel round trip when timed inline)
    keys = [jax.random.PRNGKey(i) for i in range(50)]
    # warm: compile + settle the tunnel before any timed rep
    for i in range(5):
        np.asarray(replan(*args, keys[i], zero))
    lat = []
    for i in range(50):
        t0 = time.perf_counter()
        np.asarray(replan(*args, keys[i], zero))  # fetch the action chunk
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat)) * 1e3
    print(f"10-step DDIM closed-loop replan p50 (cached goal, incl. D2H "
          f"fetch): {p50:.1f} ms (target < 30 ms; tunnel RTT floor "
          f"{rtt_floor_ms:.1f} ms here)", file=sys.stderr)

    # device-side re-plan latency without the per-call tunnel round trip:
    # chain each replan on the previous chunk (data dependency inside the
    # jitted program, so no dispatch can run ahead) and fetch once at the
    # end — what a policy co-located with its TPU (the production
    # deployment) would see
    out = replan(*args, keys[0], zero)
    n_chain, chain_ms = 20, []
    for rep in range(2):  # best-of-2: guards against transient tunnel stalls
        t0 = time.perf_counter()
        for i in range(n_chain):
            out = replan(*args, keys[i], out)
        np.asarray(out)
        chain_ms.append((time.perf_counter() - t0) / n_chain * 1e3)
    device_ms = min(chain_ms)
    print(f"10-step DDIM device-side latency (chained, no per-call RTT): "
          f"{device_ms:.2f} ms", file=sys.stderr)

    return {
        "chunks_per_sec": round(chunks_per_sec, 1),
        "flops_tflop": round(flops / 1e12, 2) if flops else None,
        "pallas_tflop": round(pallas_flops / 1e12, 2) if pallas_flops else None,
        "mxu_pct": round(mxu_pct, 1) if mxu_pct else None,
        "ceiling": round(2 * B * V5E_PEAK_FLOPS / flops, 0) if flops else None,
        "p50_ms": round(p50, 2),
        "goal_encode_ms": round(goal_ms, 2),
        "device_ms": round(device_ms, 2),
        "rtt_floor_ms": round(rtt_floor_ms, 2),
        "compile_s": round(compile_s, 1),
        "trace_lower_s": round(lower_s, 1),
        "xla_compile_s": round(xla_compile_s, 1),
    }


# --------------------------------------------------------------------------
# section: precomputed — FULL train step from the offline embedding cache
# --------------------------------------------------------------------------

def section_precomputed(B: int) -> dict:
    """Full dual-modality train_step over precomputed frozen-tower batches
    (voltron_tokens + image_latent_goal + lang_latent_goal instead of camera
    frames/text through towers — the data/extract_embeddings.py training
    mode). Uses the mode's production config exactly as training.py defaults
    it for data.use_extracted_embeddings."""
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.agents import init_agent, train_step
    from mdt_policy_tpu.training import cache_mode_config

    cfg = cache_mode_config()
    rng = np.random.default_rng(2)
    n_tok = 2 * (cfg.img_size // cfg.vit_patch) ** 2

    def scope():
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

    # the lang scope also carries the cached text-goal embedding
    # (extract_lang_goals) — in full cache mode NO tower runs in the step
    batch = {"vis": scope(),
             "lang": {**scope(), "lang_latent_goal": jnp.asarray(
                 rng.normal(size=(B, cfg.clip_embed_dim)), jnp.float32)}}
    print(f"init cache-mode (B={B} per modality) ...", file=sys.stderr)
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(5)
    # one compile, reused for cost analysis and the loops (see section_full)
    t0 = time.perf_counter()
    compiled = jitted.lower(state, batch, key).compile()
    flops = None
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops")) if cost and cost.get("flops") else None
    except Exception:
        pass
    state, _ = compiled(state, batch, key)
    np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
    compile_s = time.perf_counter() - t0
    print(f"cache-mode compile+first-run: {compile_s:.1f}s", file=sys.stderr)
    dts = []
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(6):
            state, _ = compiled(state, batch, jax.random.fold_in(key, rep * 6 + i))
        np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
        dts.append((time.perf_counter() - t0) / 6)
    cps = 2 * B / min(dts)
    print(f"precomputed-embeddings full train step: {cps:.0f} chunks/s "
          + (f"({flops/1e12:.1f} TFLOP/step)" if flops else ""), file=sys.stderr)
    return {
        "chunks_per_sec": round(cps, 1),
        "tflop": round(flops / 1e12, 2) if flops else None,
        "compile_s": round(compile_s, 1),
    }


# --------------------------------------------------------------------------
# section: sustained — cache-mode training END TO END, loader to optimizer
# --------------------------------------------------------------------------

def section_sustained(B: int, *, frames: int = 2500, seconds: float = 30.0,
                      aug_variants: int = 2) -> dict:
    """Sustained cache-mode training throughput with the REAL input pipeline
    overlapped: on-disk CALVIN-format split -> sharded BatchLoader decode
    threads -> DevicePrefetcher (H2D + jitted preprocessing ahead of the
    step) -> the full three-loss cache-mode train step, timed over >=30 s of
    wall clock. This is the number the step-only `precomputed` section does
    NOT give: loader, transfer and compute contend for this host's cores and
    the tunnel, exactly like a real training run (ref DataLoader worker
    sizing, hulc_data_module.py:136-147). The dataset carries K fabricated
    DrQ-variant arrays (production recipe: cache mode + aug variants), and
    the standalone loader feed rate is measured in the same process for the
    honest core-budget accounting."""
    import shutil
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.agents import init_agent, train_step
    from mdt_policy_tpu.data.bench_loader import (fabricate_embedding_cache,
                                                  generate_dataset)
    from mdt_policy_tpu.data.dataset import CalvinDataset
    from mdt_policy_tpu.data.extract import extract_by_key, extract_frames
    from mdt_policy_tpu.data.loader import (BatchLoader, DevicePrefetcher,
                                            DualStreamLoader, Preprocessor)
    from mdt_policy_tpu.parallel import make_mesh, shard_batch
    from mdt_policy_tpu.training import cache_mode_config

    cfg = cache_mode_config()
    # smoke knobs (CPU plumbing checks); the driver runs the defaults
    seconds = float(os.environ.get("MDT_BENCH_SUSTAINED_SECONDS", seconds))
    frames = int(os.environ.get("MDT_BENCH_SUSTAINED_FRAMES", frames))
    tmp = tempfile.mkdtemp(prefix="mdt_bench_sustained_")
    try:
        real_root = os.environ.get("MDT_BENCH_SUSTAINED_ROOT")
        if real_root:
            # a REAL extracted split (extract_frames + extract_embeddings
            # --aug-variants already run on it): measures production bytes
            root = Path(real_root)
        else:
            print(f"fabricating {frames}-frame split + embedding cache "
                  f"(K={aug_variants}) ...", file=sys.stderr, flush=True)
            root = generate_dataset(Path(tmp), frames, with_lang=True)
            extract_by_key(root)
            extract_frames(root)
            fabricate_embedding_cache(root, aug_variants=aug_variants,
                                      lang_goals=True)

        kw = dict(min_window_size=21, max_window_size=50,
                  use_extracted_rel_actions=True, use_extracted_frames=True,
                  use_extracted_embeddings=True,
                  embedding_aug_variants=aug_variants)
        ds_vis = CalvinDataset(root, key="vis", **kw)
        ds_lang = CalvinDataset(root, key="lang", **kw)
        loader = DualStreamLoader(
            BatchLoader(ds_vis, B, seed=0, prefetch=2),
            BatchLoader(ds_lang, B, seed=1, prefetch=2))
        n_workers = loader.vis.num_workers + loader.lang.num_workers

        mesh = make_mesh(jax.devices()[:1])
        pp = Preprocessor(static_size=cfg.img_size, gripper_size=84,
                          gen_size=cfg.gen_img_res)
        # the step consumes exactly these keys; shipping idx/robot_obs/
        # lang_emb would pad the H2D bytes with dead weight (with cached
        # text goals, production never even tokenizes — no lang_tokens)
        step_keys = ("voltron_tokens", "image_latent_goal",
                     "lang_latent_goal", "gen_static", "gen_gripper",
                     "actions")

        def device_batch(key, raw):
            out = {}
            for i, scope in enumerate(sorted(raw.keys())):
                arrays = {k: v for k, v in raw[scope].items()
                          if k in step_keys}
                sharded = shard_batch(arrays, mesh)
                out[scope] = pp.train_batch(jax.random.fold_in(key, i), sharded)
            return out

        raw0 = next(iter(loader))
        batch0 = device_batch(jax.random.PRNGKey(100), raw0)
        print(f"init cache-mode (B={B}/modality) ...", file=sys.stderr)
        # init needs dummy lang_tokens to build the (frozen) text tower;
        # the step batches themselves never carry tokens in this mode
        init_example = {**batch0["lang"], "lang_tokens": jnp.zeros(
            (B, cfg.clip_context_length), jnp.int32)}
        net, state = init_agent(cfg, jax.random.PRNGKey(0), init_example)
        jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
        key = jax.random.PRNGKey(7)

        def drain(state):
            np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])

        t0 = time.perf_counter()
        compiled = jitted.lower(state, batch0, key).compile()
        state, _ = compiled(state, batch0, key)
        drain(state)
        compile_s = time.perf_counter() - t0
        print(f"compile+first-run: {compile_s:.1f}s", file=sys.stderr)

        prefetcher = DevicePrefetcher(iter(loader), device_batch,
                                      jax.random.PRNGKey(101), depth=2)
        # warm: one pipelined step settles the prefetch queue + H2D path
        state, _ = compiled(state, next(prefetcher), jax.random.fold_in(key, 0))
        drain(state)

        n_chunks, n_steps = 0, 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            b = next(prefetcher)
            state, _ = compiled(state, b, jax.random.fold_in(key, n_steps + 1))
            n_steps += 1
            n_chunks += 2 * B
            if n_steps % 16 == 0:
                drain(state)  # keep the dispatch queue honest mid-run
        drain(state)  # the donation chain forces every step to have executed
        dt = time.perf_counter() - t0
        cps = n_chunks / dt
        print(f"SUSTAINED cache-mode training: {n_steps} steps, "
              f"{n_chunks} chunks in {dt:.1f}s -> {cps:.0f} chunks/s "
              f"({n_workers} decode thread(s), {os.cpu_count()} host core(s))",
              file=sys.stderr)
        prefetcher.close()
        loader.close()

        # standalone loader feed rate (no device work) — same process, same
        # page-cache state: what the host alone can decode per second
        feed_loader = DualStreamLoader(
            BatchLoader(ds_vis, B, seed=2, prefetch=2),
            BatchLoader(ds_lang, B, seed=3, prefetch=2))
        it = iter(feed_loader)
        next(it)
        t0 = time.perf_counter()
        fed = 0
        while time.perf_counter() - t0 < 10.0:
            next(it)
            fed += 2 * B
        feed_cps = fed / (time.perf_counter() - t0)
        feed_loader.close()
        print(f"standalone loader feed: {feed_cps:.0f} chunks/s on this host",
              file=sys.stderr)

        # transfer+preprocess rate alone (device_put + the jitted preprocess
        # program, no train step): how fast H2D can move batches here.
        # block_until_ready is NOT a trustworthy barrier on the tunnel
        # (docs/BENCHMARKING.md) — fetch one element of a transferred leaf.
        h2d_bytes = sum(int(np.asarray(v).nbytes)
                        for scope in raw0.values() for k, v in scope.items()
                        if k in step_keys)
        t0 = time.perf_counter()
        n_h2d = 6
        for i in range(n_h2d):
            out = device_batch(jax.random.fold_in(key, 1000 + i), raw0)
            np.asarray(out["lang"]["voltron_tokens"][0, 0, 0])
        dt_h2d = (time.perf_counter() - t0) / n_h2d
        h2d_cps = 2 * B / dt_h2d
        print(f"H2D+preprocess alone: {h2d_cps:.0f} chunks/s "
              f"({h2d_bytes / dt_h2d / 1e9:.2f} GB/s over this link)",
              file=sys.stderr)

        return {
            "chunks_per_sec": round(cps, 1),
            "steps": n_steps,
            "seconds": round(dt, 1),
            "loader_feed_chunks_per_sec": round(feed_cps, 1),
            "h2d_chunks_per_sec": round(h2d_cps, 1),
            "h2d_gbytes_per_sec": round(h2d_bytes / dt_h2d / 1e9, 2),
            "decode_threads": n_workers,
            "host_cores": os.cpu_count(),
            "aug_variants": aug_variants,
            "compile_s": round(compile_s, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# section: denoiser — denoiser-only trainable step
# --------------------------------------------------------------------------

def section_denoiser(B: int = 512) -> dict:
    """Train-step throughput of the trainable denoiser alone on precomputed
    perceiver/goal embeddings (the regime the >=5k chunks/s target is
    physically reachable in — the full step's frozen towers alone cost
    ~75 TFLOP at B=512, capping one v5e chip at ~2.7k chunks/s)."""
    import jax
    import jax.numpy as jnp
    import optax
    from mdt_policy_tpu.agents import MDTVConfig
    from mdt_policy_tpu.diffusion import make_sample_density
    from mdt_policy_tpu.diffusion.precond import append_dims, get_scalings
    from mdt_policy_tpu.models.mdtv_transformer import MDTVTransformer

    cfg = MDTVConfig()
    rng = np.random.default_rng(1)
    inner = MDTVTransformer(
        obs_dim=cfg.obs_dim, goal_dim=cfg.goal_dim, action_dim=cfg.action_dim,
        proprio_dim=cfg.proprio_dim, embed_dim=cfg.embed_dim,
        n_enc_layers=cfg.n_enc_layers, n_dec_layers=cfg.n_dec_layers,
        n_heads=cfg.n_heads, goal_seq_len=cfg.goal_seq_len,
        obs_seq_len=cfg.obs_seq_len, n_obs_token=cfg.num_latents,
        action_seq_len=cfg.act_window_size, attn_pdrop=cfg.attn_pdrop,
        resid_pdrop=cfg.resid_pdrop, mlp_pdrop=cfg.mlp_pdrop,
        use_ada_conditioning=cfg.use_ada_conditioning)
    emb = {"state_images": jnp.asarray(rng.normal(size=(B, 3, cfg.latent_dim)),
                                       jnp.float32)}
    goal = jnp.asarray(rng.normal(size=(B, 1, cfg.goal_dim)), jnp.float32)
    actions = jnp.asarray(rng.normal(size=(B, 10, 7)), jnp.float32)
    inner_params = inner.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        emb, actions, goal, jnp.ones((B,)), modality="lang",
        train=True)["params"]
    tx = optax.adamw(1e-4)
    opt_state = tx.init(inner_params)
    density = make_sample_density(cfg.sigma_sample_density_type, cfg.sigma_data,
                                  cfg.sigma_min, cfg.sigma_max)
    key = jax.random.PRNGKey(7)

    def step(params, opt_state, k):
        k_s, k_n, k_d = jax.random.split(k, 3)
        sigmas = density(k_s, (B,))
        noise = jax.random.normal(k_n, actions.shape)
        c_skip, c_out, c_in = (append_dims(s, 3)
                               for s in get_scalings(sigmas, cfg.sigma_data))
        noised = actions + noise * append_dims(sigmas, 3)

        def loss_fn(p):
            pred, _ = inner.apply({"params": p}, emb, noised * c_in, goal,
                                  sigmas, modality="lang", train=True,
                                  rngs={"dropout": k_d})
            return jnp.mean(jnp.square(pred - (actions - c_skip * noised) / c_out))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, opt_state, _ = jitted(inner_params, opt_state, key)
    np.asarray(params["tok_emb"]["kernel"])
    compile_s = time.perf_counter() - t0
    n = 20
    # keys precomputed OUTSIDE the timed loop: each fold_in is its own tiny
    # device program whose dispatch rides the tunnel — on a ~18 ms step that
    # per-iteration round trip read as an 11 ms/step "regression" on a slow
    # tunnel day (r5 denoiser variance)
    keys = [jax.random.fold_in(key, i) for i in range(n)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, _ = jitted(params, opt_state, keys[i])
    np.asarray(params["tok_emb"]["kernel"])
    cps = B / ((time.perf_counter() - t0) / n)
    print(f"denoiser-only train step: {cps:.0f} chunks/s", file=sys.stderr)
    return {"chunks_per_sec": round(cps, 1), "compile_s": round(compile_s, 1)}


# --------------------------------------------------------------------------
# section: mdt — the MDT (non-V) family
# --------------------------------------------------------------------------

def section_mdt(B: int = 256) -> dict:
    """Full dual-modality train step of the MDT variant (trainable
    ResNet18-GN per-camera encoders + frozen CLIP goal towers + 512-d
    4/6-layer denoiser — the reference's second model family)."""
    import jax
    from mdt_policy_tpu.agents import MDTConfig, init_mdt_agent, train_step

    cfg = MDTConfig()
    rng = np.random.default_rng(0)
    batch = _make_batch(B, rng)
    print(f"init MDT (B={B} per modality) ...", file=sys.stderr)
    net, state = init_mdt_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    # one compile, reused for cost analysis and the loops (see section_full)
    compiled = jitted.lower(state, batch, key).compile()
    # exact-FLOP accounting, same method as the MDT-V headline (VERDICT r4
    # #6): XLA's own count + the analytic Pallas custom-call FLOPs of the
    # frozen CLIP goal towers (the trainable ResNets are XLA convs, counted)
    flops = None
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops")) if cost and cost.get("flops") else None
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
    if flops:
        from mdt_policy_tpu.utils.flops import mdt_tower_custom_call_flops
        flops += mdt_tower_custom_call_flops(cfg, B)
    state, _ = compiled(state, batch, key)
    np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
    compile_s = time.perf_counter() - t0
    dts = []
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(4):
            state, _ = compiled(state, batch, jax.random.fold_in(key, rep * 4 + i))
        np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
        dts.append((time.perf_counter() - t0) / 4)
    dt = min(dts)
    cps = 2 * B / dt
    mxu_pct = (flops / dt / V5E_PEAK_FLOPS * 100) if flops else None
    print(f"MDT (ResNet) full train step: {cps:.0f} chunks/s"
          + (f" | {flops/1e12:.1f} TFLOP/step, MXU {mxu_pct:.0f}%"
             if flops else ""), file=sys.stderr)
    return {
        "chunks_per_sec": round(cps, 1),
        "flops_tflop": round(flops / 1e12, 2) if flops else None,
        "mxu_pct": round(mxu_pct, 1) if mxu_pct else None,
        "ceiling": round(2 * B * V5E_PEAK_FLOPS / flops, 0) if flops else None,
        "compile_s": round(compile_s, 1),
    }


# --------------------------------------------------------------------------
# section: aot — can a serialized executable skip the remote compile?
# --------------------------------------------------------------------------

def _aot_step(w1, w2, x):
    """Small representative train-ish program (fwd + bwd + update): whether
    the backend accepts a foreign serialized executable is program-
    independent, so a seconds-to-compile probe answers it without paying a
    production-size remote compile."""
    import jax
    import jax.numpy as jnp

    def loss(w1, w2):
        h = jnp.tanh(x @ w1)
        return jnp.sum(jnp.square(h @ w2))

    g1, g2 = jax.grad(loss, argnums=(0, 1))(w1, w2)
    return w1 - 1e-3 * g1, w2 - 1e-3 * g2


def _aot_args():
    rng = np.random.default_rng(0)
    return (rng.normal(size=(512, 512)).astype(np.float32),
            rng.normal(size=(512, 512)).astype(np.float32),
            rng.normal(size=(1024, 512)).astype(np.float32))


def section_aot(_B: int) -> dict:
    """Round-4 finding: the persistent compile cache is written but never
    consulted by this backend — every fresh process pays the remote compile
    service again. The untried lever (round-4 VERDICT #5): serialize the
    compiled EXECUTABLE itself (jax.experimental.serialize_executable),
    deserialize it in a fresh process, and run — if the backend loads it,
    warm runs skip the compile service entirely. This section measures the
    round trip and reports a definitive yes/no."""
    import pickle
    import subprocess

    import jax

    out: dict = {"aot_serialize_works": False, "aot_deserialize_works": False}
    args = _aot_args()
    t0 = time.perf_counter()
    compiled = jax.jit(_aot_step).lower(*args).compile()
    r1 = np.asarray(compiled(*args)[0])
    out["cold_compile_s"] = round(time.perf_counter() - t0, 2)
    print(f"probe program cold compile+run: {out['cold_compile_s']}s",
          file=sys.stderr)

    blob_path = os.path.join(tempfile.gettempdir(), "mdt_aot_probe.pkl")
    try:
        from jax.experimental.serialize_executable import serialize
        payload, in_tree, out_tree = serialize(compiled)
        with open(blob_path, "wb") as f:
            pickle.dump({"payload": payload, "in_tree": in_tree,
                         "out_tree": out_tree,
                         "expect0": r1[:4, :4]}, f)
        out["aot_serialize_works"] = True
        out["blob_mb"] = round(os.path.getsize(blob_path) / 1e6, 2)
        print(f"executable serialized: {out['blob_mb']} MB", file=sys.stderr)
    except Exception as e:
        out["serialize_error"] = f"{type(e).__name__}: {e}"
        print(f"serialize FAILED: {out['serialize_error']}", file=sys.stderr)
        return out

    # fresh process: deserialize + run without ever compiling
    child_out = os.path.join(tempfile.gettempdir(), "mdt_aot_child.json")
    try:
        os.unlink(child_out)
    except OSError:
        pass
    # The child must target the parent's PLATFORM (the PJRT plugin alias,
    # e.g. "axon" for the tunnel), NOT default_backend(): the axon plugin
    # reports default_backend()=="tpu", and pinning the child to "tpu" makes
    # it try to init a LOCAL TPU ("No jellyfish device found") instead of
    # dialing the tunnel. jax.config.jax_platforms carries the alias the
    # parent actually initialized with ("axon", or "cpu" when forced).
    backend = getattr(jax.config, "jax_platforms", None) \
        or jax.default_backend()
    code = (
        "import jax\n"
        # sitecustomize pre-imports jax, so pin at the config level too
        "jax.config.update('jax_platforms', {backend!r})\n"
        "import sys; sys.path.insert(0, {here!r})\n"
        "import bench; bench._aot_child({blob!r}, {out!r})\n"
    ).format(backend=backend,
             here=os.path.dirname(os.path.abspath(__file__)),
             blob=blob_path, out=child_out)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = backend
    proc = subprocess.run([sys.executable, "-c", code], timeout=600, env=env)
    if os.path.exists(child_out):
        with open(child_out) as f:
            child = json.load(f)
        out.update(child)
        out["aot_deserialize_works"] = bool(child.get("deserialize_ok")
                                            and child.get("values_match"))
    else:
        out["deserialize_error"] = f"child rc={proc.returncode}, no output"
    print(f"AOT deserialize-and-run in a fresh process: "
          f"{'WORKS' if out['aot_deserialize_works'] else 'does NOT work'} "
          f"({out.get('deserialize_error', '')}"
          f"{out.get('load_run_s', '')})", file=sys.stderr)
    return out


def _aot_child(blob_path: str, out_path: str) -> None:
    """Fresh-process half of section_aot: deserialize the pickled executable
    and run it — no lower(), no compile() anywhere in this process."""
    import pickle

    import jax

    res: dict = {"deserialize_ok": False, "values_match": False}
    try:
        with open(blob_path, "rb") as f:
            d = pickle.load(f)
        t0 = time.perf_counter()
        from jax.experimental.serialize_executable import deserialize_and_load
        compiled = deserialize_and_load(d["payload"], d["in_tree"],
                                        d["out_tree"])
        res["deserialize_ok"] = True
        r = np.asarray(compiled(*_aot_args())[0])
        res["load_run_s"] = round(time.perf_counter() - t0, 2)
        res["values_match"] = bool(np.allclose(r[:4, :4], d["expect0"],
                                               rtol=1e-5, atol=1e-5))
    except Exception as e:
        res["deserialize_error"] = f"{type(e).__name__}: {e}"
    with open(out_path, "w") as f:
        json.dump(res, f)


# --------------------------------------------------------------------------
# section: disk — input-pipeline throughput + multi-core scaling model
# --------------------------------------------------------------------------

def section_disk(_B: int) -> dict:
    import shutil
    from pathlib import Path

    import jax
    try:  # host-only section: never let it open the TPU tunnel
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from mdt_policy_tpu.data.bench_loader import (
        bench as loader_bench, bench_embeddings, fabricate_embedding_cache,
        generate_dataset, scaling_bench)
    from mdt_policy_tpu.data.extract import extract_by_key, extract_frames

    tmp = tempfile.mkdtemp(prefix="mdt_bench_disk_")
    root = generate_dataset(Path(tmp), 1500)
    extract_by_key(root)
    extract_frames(root)
    disk = loader_bench(root, batch_size=128, steps=40)
    print(f"disk input pipeline: {disk['chunks_per_sec']:.0f} chunks/s "
          f"({disk['num_workers']} worker(s))", file=sys.stderr)
    # embedding-cache input path (the mode that must feed the ~7.3k
    # chunks/s cache-mode step; production token shapes, random bits)
    emb = None
    try:
        fabricate_embedding_cache(root)
        emb = bench_embeddings(root, batch_size=128, steps=30)
        print(f"embedding-cache input pipeline: "
              f"{emb['chunks_per_sec']:.0f} chunks/s "
              f"({emb['mb_per_chunk']:.2f} MB/chunk, "
              f"{emb['gbytes_per_sec']:.2f} GB/s)", file=sys.stderr)
    except Exception as e:
        print(f"embedding loader bench skipped: {e}", file=sys.stderr)
    scaling = None
    try:
        scaling = [scaling_bench(root, n, steps=12) for n in (2, 4)]
        for s in scaling:
            print(f"loader scaling x{s['num_shards']} shards: "
                  f"{s['cpu_ms_per_chunk']:.3f} CPU-ms/chunk -> "
                  f"{s['agg_at_cores'][2]} chunks/s at 2 dedicated "
                  f"cores", file=sys.stderr)
    except Exception as e:
        print(f"loader scaling bench skipped: {e}", file=sys.stderr)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"disk": disk, "scaling": scaling, "emb": emb}


# --------------------------------------------------------------------------

def run_section(name: str, out_path: str, B: int) -> None:
    # honor JAX_PLATFORMS=cpu at the CONFIG level: the container's
    # sitecustomize registers the axon plugin with JAX_PLATFORMS=axon baked
    # in, so the env var alone does not stick (tests/conftest.py has the
    # same note) — without this, a CPU smoke of a TPU section hangs in the
    # axon client's dial-retry loop when the tunnel is down
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from mdt_policy_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    fn = {
        "full": section_full,
        "precomputed": section_precomputed,
        "sustained": section_sustained,
        "denoiser": lambda B: section_denoiser(max(B, 512)),
        "mdt": lambda B: section_mdt(min(B, 256)),
        "aot": section_aot,
        "disk": section_disk,
    }[name]
    result = fn(B)
    with open(out_path, "w") as f:
        json.dump(result, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--section", default=None, choices=[s for s, _ in SECTIONS])
    p.add_argument("--out", default=None)
    p.add_argument("B", nargs="?", type=int, default=512)
    a = p.parse_args()
    if a.section:
        run_section(a.section, a.out or "/dev/stdout", a.B)
    else:
        orchestrate(a.B)


if __name__ == "__main__":
    main()
