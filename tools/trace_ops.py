"""Per-op device-time breakdown of the production train step.

Runs the full dual-modality B=512 train step under jax.profiler.trace and
aggregates the TPU device plane of the resulting xplane.pb: every XEvent on
a device line is one executed HLO, so summing durations per (deduplicated)
op name gives where the step actually spends its time. Categories follow
docs/BENCHMARKING.md (matmul/conv fusions vs norm reduces vs copies vs
Pallas vs elementwise).

Only the device plane's 'XLA Ops' line is summed — it is the serialized
op-execution timeline (its total matches wall step time). 'Async XLA Ops'
(copy-start/slice-start prefetches) OVERLAP compute and the 'XLA Modules'
line double-counts every op, so naive whole-plane sums read ~4x wall.

Usage: python tools/trace_ops.py [B]           # trace + analyze
       python tools/trace_ops.py /tmp/mdt_trace_xyz [n_steps]  # re-analyze
"""

from __future__ import annotations

import glob
import os
import re
import sys
import tempfile
import time
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def classify(name: str) -> str:
    n = name.lower()
    # newer profiler traces carry the full HLO text ("%fusion.12 = f32[...]
    # fusion(...)"); classify on the op name alone
    n = n.lstrip("%").split(" =", 1)[0]
    if not n:
        n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas custom-call"
    if n.startswith(("copy", "transpose", "bitcast")) or ".copy" in n:
        return "copy/transpose"
    if n.startswith(("convolution", "dot", "cublas")):
        return "bare matmul/conv"
    if "reduce" in n:
        return "reduce fusion (norm stats etc)"
    if n.startswith("fusion"):
        return "fusion (mixed)"
    if n.startswith(("dynamic-update-slice", "dynamic-slice", "slice", "concatenate", "pad", "reshape")):
        return "data movement"
    if n.startswith(("all-reduce", "all-gather", "collective")):
        return "collective"
    return "other"


def classify_ev(base: str, hlo_cat: str, flops: float, long_name: str,
                dur: float = 0.0) -> str:
    """Classify from the profiler's own per-event stats when present.

    hlo_category catches what name-matching cannot: Pallas kernels lower to
    custom-calls whose HLO op name is the python callable (`_impl.72`), and
    TPU fusions that swallow both MLP matmuls keep a `reduce`-flavoured name
    (`convert_reduce_fusion`) while being ~90%-of-peak MXU work — the
    round-4 rollup misread 125 ms/step of near-peak CLIP-tower MLPs as
    "norm stats" and 66 ms/step of fused attention as "other" because of
    exactly these two traps. model_flops>0 marks the matmul-bearing ones.
    """
    c = (hlo_cat or "").lower()
    n = base.lower()
    if "custom-call" in c or "custom call" in c:
        if "ConcatBitcast" in long_name or "concat" in n:
            return "copy/transpose"
        return "pallas custom-call"
    if "convolution" in c or c == "dot" or n.startswith(("convolution", "dot")):
        return "bare matmul/conv"
    # matmul-bearing only when the flop DENSITY says the MXU is the point:
    # many loop fusions carry a handful of flops (scalar scale factors) that
    # would otherwise misfile 90 ms of elementwise work as MXU work
    if dur > 0 and flops / dur > 20e12:
        return "matmul-bearing fusion (MXU)"
    if n.startswith(("copy", "transpose", "bitcast")) or "copy" in c:
        return "copy/transpose"
    if "reduce" in n:
        return "reduce fusion (norm stats etc)"
    if "fusion" in c or n.startswith("fusion"):
        return "fusion (elementwise)"
    return classify(base)


def analyze(tmp: str, n_steps: int, wall: float | None = None) -> None:
    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane.pb under {tmp}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(max(files, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())

    per_op = defaultdict(float)
    per_op_flops = defaultdict(float)
    per_cat_time = defaultdict(float)
    per_cat_flops = defaultdict(float)
    per_module = defaultdict(float)
    total = 0.0
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        if "host" in plane.name.lower():
            continue
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        # per-op stats live on the event METADATA (hlo_category = the
        # compiler's own op class, model_flops, tf_op = the jit scope path
        # "jit(train_step)/net/visual_goal/..." for module attribution);
        # per-EVENT stats carry only timing. Cache the decode per metadata id.
        md_info = {}
        for k, v in plane.event_metadata.items():
            hlo_cat, flops, tf_op = "", 0.0, ""
            for st in v.stats:
                sn = stat_names.get(st.metadata_id, "")
                if sn == "hlo_category":
                    hlo_cat = st.str_value
                elif sn == "model_flops":
                    flops = float(st.int64_value or st.uint64_value or 0)
                elif sn == "tf_op":
                    tf_op = st.str_value
            name = v.name or str(k)
            base = re.sub(r"[.\d]+$", "", name.split(" =", 1)[0])
            md_info[k] = (name, base, hlo_cat, flops, tf_op)
        for line in plane.lines:
            # ONLY the serialized op timeline; Async XLA Ops overlap compute
            # and XLA Modules double-counts (see module docstring)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name, base, hlo_cat, flops, tf_op = md_info.get(
                    ev.metadata_id, (str(ev.metadata_id), str(ev.metadata_id),
                                     "", 0.0, ""))
                dur = ev.duration_ps / 1e12
                # category is per EVENT (uses this instance's flop density),
                # not per deduped name: the same fusion family (e.g.
                # multiply_reduce_fusion) appears both as a dot+reduce
                # kOutput fusion and as pure elementwise instances — caching
                # per name misfiles one side
                cat = classify_ev(base, hlo_cat, flops, name, dur)
                per_cat_time[cat] += dur
                per_cat_flops[cat] += flops
                per_op[base] += dur
                total += dur
                per_op_flops[base] += flops
                m = re.search(r"(img_encoder|visual_goal|language_goal|"
                              r"perceiver|gen_img|clip_proj|inner|"
                              r"static_resnet|gripper_resnet|adamw?|ema)",
                              tf_op)
                per_module[m.group(1) if m else "(unattributed)"] += dur
        if total:
            print(f"[plane: {plane.name}]")
            break

    if not total:
        print("No 'XLA Ops' line found; plane/line names were:")
        for plane in space.planes:
            print("  ", plane.name, [ln.name for ln in plane.lines][:6])
        return

    per_step = total / n_steps
    print(f"\ndevice op time: {per_step*1e3:.0f} ms/step"
          + (f" (wall {wall*1e3:.0f} ms)" if wall else "") + "\n")
    print("== category rollup (hlo_category + model_flops) ==")
    for cat, t in sorted(per_cat_time.items(), key=lambda kv: -kv[1]):
        tput = per_cat_flops[cat] / t / 1e12 if t else 0.0
        print(f"  {cat:38s} {t/n_steps*1e3:8.1f} ms  {t/total*100:5.1f}%"
              + (f"   {tput:6.1f} TF/s" if per_cat_flops[cat] else ""))
    attributed = sum(t for k, t in per_module.items()
                     if k != "(unattributed)")
    if attributed > 0.2 * total:
        print("\n== module rollup (from HLO op_name scopes) ==")
        for mod, t in sorted(per_module.items(), key=lambda kv: -kv[1])[:14]:
            print(f"  {mod:34s} {t/n_steps*1e3:8.1f} ms  {t/total*100:5.1f}%")
    print("\n== top 40 ops ==")
    for op, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {op[:90]:90s} {t/n_steps*1e3:8.2f} ms  {t/total*100:5.1f}%")
    print(f"\ntrace dir kept: {tmp}")


def main():
    if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]):
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        analyze(sys.argv[1], n)
        return

    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step
    from mdt_policy_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    precomputed = "--precomputed" in sys.argv
    if precomputed:
        sys.argv.remove("--precomputed")
    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 512
    n_steps = 2
    cfg = MDTVConfig()
    if precomputed:
        # the training CLI's cache-mode production config
        from mdt_policy_tpu.training import cache_mode_config
        cfg = cache_mode_config()
    rng = np.random.default_rng(0)

    def scope():
        # --precomputed: the data.use_extracted_embeddings training mode —
        # cached frozen-tower outputs instead of camera frames
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
    if precomputed:
        # production cache mode also caches the text goal (extract_lang_goals)
        batch["lang"]["lang_latent_goal"] = jnp.asarray(
            rng.normal(size=(B, cfg.clip_embed_dim)), jnp.float32)
    print(f"init (B={B}/modality) ...", flush=True)
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    state, _ = jitted(state, batch, key)
    np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])  # drain

    tmp = tempfile.mkdtemp(prefix="mdt_trace_")
    jax.profiler.start_trace(tmp)
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, _ = jitted(state, batch, jax.random.fold_in(key, i))
    np.asarray(state.params["inner"]["tok_emb"]["kernel"][0, 0])
    wall = (time.perf_counter() - t0) / n_steps
    jax.profiler.stop_trace()
    print(f"traced {n_steps} steps, wall {wall*1e3:.0f} ms/step")
    analyze(tmp, n_steps, wall)


if __name__ == "__main__":
    main()
