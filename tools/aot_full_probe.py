"""AOT round trip of the PRODUCTION full-step executable (round-5 probe).

bench.py's `aot` section proves deserialize-and-run works on this backend
with a small probe program; this tool measures the lever at the size where
it matters: the full dual-modality B=512 train step, whose remote compile
cost the round-5 battery measured at 562 s (and which varies ~5x).

  parent:  build agent -> jit(train_step).lower().compile()   (pays compile)
           serialize executable -> /tmp blob (+ pickled example inputs meta)
  child:   fresh process, deserialize_and_load -> run ONE step, NO compile

Prints the compile cost, blob size, and the child's load+run wall time —
the warm-start saving is the difference. Run only on a healthy tunnel.

Usage: python tools/aot_full_probe.py [B]
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile
import time
from functools import partial

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 512
BLOB = os.path.join(tempfile.gettempdir(), "mdt_aot_full.pkl")


def build(cfg_and_inputs_only: bool = False):
    """Agent + batch + jitted step — identical construction to bench
    section_full (deterministic seeds, so parent and child materialize the
    same example inputs)."""
    import jax

    import bench
    from mdt_policy_tpu.agents import MDTVConfig, init_agent, train_step

    rng = np.random.default_rng(0)
    batch = bench._make_batch(B, rng)
    cfg = MDTVConfig()
    net, state = init_agent(cfg, jax.random.PRNGKey(0), batch["lang"])
    jitted = jax.jit(partial(train_step, net), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    return jitted, state, batch, key


def parent() -> None:
    import jax

    t0 = time.perf_counter()
    jitted, state, batch, key = build()
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = jitted.lower(state, batch, key).compile()
    compile_s = time.perf_counter() - t0
    print(f"build {build_s:.1f}s, compile {compile_s:.1f}s", flush=True)

    from jax.experimental.serialize_executable import serialize
    payload, in_tree, out_tree = serialize(compiled)
    # treedefs can't be pickled here: the TrainState's opt_state embeds
    # optax chain closures (local objects). Ship the payload only; the
    # child rebuilds identical treedefs from its own (deterministic)
    # construction + eval_shape — host-only, no compile.
    with open(BLOB, "wb") as f:
        pickle.dump({"payload": payload}, f)
    print(f"blob {os.path.getsize(BLOB)/1e6:.1f} MB", flush=True)

    # sanity run in the parent for a loss reference the child can compare
    state2, metrics = compiled(state, batch, key)
    ref = float(np.asarray(metrics["train/total_loss"]))
    print(f"parent loss {ref:.4f}", flush=True)

    backend = getattr(jax.config, "jax_platforms", None) or jax.default_backend()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = backend
    env["MDT_AOT_REF_LOSS"] = repr(ref)
    t0 = time.perf_counter()
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(B), "--child"],
        env=env, timeout=1800).returncode
    print(f"child total wall {time.perf_counter()-t0:.1f}s rc={rc}", flush=True)


def child() -> None:
    import jax
    # pin the plugin alias at the config level too (sitecustomize pre-import)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    t0 = time.perf_counter()
    jitted, state, batch, key = build()
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    with open(BLOB, "rb") as f:
        d = pickle.load(f)
    import jax.tree_util as jtu
    in_tree = jtu.tree_structure(((state, batch, key), {}))
    out_shape = jax.eval_shape(jitted, state, batch, key)  # trace, no compile
    out_tree = jtu.tree_structure(out_shape)
    from jax.experimental.serialize_executable import deserialize_and_load
    compiled = deserialize_and_load(d["payload"], in_tree, out_tree)
    load_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state2, metrics = compiled(state, batch, key)
    loss = float(np.asarray(metrics["train/total_loss"]))
    run_s = time.perf_counter() - t0
    ref = float(os.environ.get("MDT_AOT_REF_LOSS", "nan"))
    match = abs(loss - ref) < 1e-3 * max(1.0, abs(ref))
    print(f"CHILD: deserialize {load_s:.1f}s, inputs {build_s:.1f}s, "
          f"first step {run_s:.1f}s, loss {loss:.4f} "
          f"({'MATCHES' if match else f'ref {ref:.4f} MISMATCH'}) — "
          f"no compile anywhere", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        parent()
