"""Tower-level attention shootout on the real chip (honest chained barriers).

Compares the production attention paths inside the frozen towers at
production shape — the measurements behind docs/PALLAS.md:
  none       XLA sdpa (bthd layout, bf16 score materialization)
  qkv        ops/fused_qkv_attention.py Pallas kernel (production on TPU)

Usage: python tools/attn_experiment.py [n_voltron_images] [n_clip_images]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, mod, inp, params):
    import jax
    import jax.numpy as jnp

    try:
        fn = jax.jit(lambda p, x, c: mod.apply({"params": p}, x + c))
        out = fn(params, inp, jnp.zeros((), inp.dtype))
        np.asarray(out.reshape(-1)[0])
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn(params, inp, out.reshape(-1)[0] * 0)
            np.asarray(out.reshape(-1)[0])
            dts.append((time.perf_counter() - t0) / 8)
        print(f"{name:28s} {min(dts)*1e3:8.1f} ms   (loops: "
              + ", ".join(f"{d*1e3:.0f}" for d in dts) + ")", flush=True)
        return np.asarray(out[:2], np.float32)
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
        return None


def main():
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.models.clip import CLIPVisionTower
    from mdt_policy_tpu.models.voltron_vit import VoltronViT

    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_c = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    rng = np.random.default_rng(0)

    imgs = jnp.asarray(rng.uniform(size=(n_v, 224, 224, 3)), jnp.bfloat16)
    params = jax.jit(VoltronViT().init)(jax.random.PRNGKey(0), imgs)["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    ref = None
    for mode in ("none", "qkv"):
        out = bench(f"voltron[{mode}]",
                    VoltronViT(fused_attention=(mode == "qkv")), imgs, params)
        if out is not None and ref is not None:
            print(f"   max|diff| vs none: {np.max(np.abs(out - ref)):.5f}")
        ref = ref if ref is not None else out

    cimgs = jnp.asarray(rng.uniform(size=(n_c, 224, 224, 3)), jnp.bfloat16)
    cp = jax.jit(CLIPVisionTower().init)(jax.random.PRNGKey(0), cimgs)["params"]
    cp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), cp)
    ref = None
    for mode in ("none", "qkv"):
        out = bench(f"clip_vision[{mode}]",
                    CLIPVisionTower(fused_attention=(mode == "qkv")),
                    cimgs, cp)
        if out is not None and ref is not None:
            print(f"   max|diff| vs none: {np.max(np.abs(out - ref)):.5f}")
        ref = ref if ref is not None else out


if __name__ == "__main__":
    main()
