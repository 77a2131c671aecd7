"""Attention-implementation shootout inside the frozen ViT towers at
production shape (the hot 82% of the train step — tools/perf_probe.py).

Variants, timed with chained honest barriers (docs/BENCHMARKING.md):
  xla_f32      current ops.attention.sdpa (f32 score materialization)
  xla_bf16     scores materialize bf16; softmax still accumulates f32
               in-register (convert fused into the softmax fusion)
  pallas_N     ops.pallas_attention.small_seq_mha, block_rows=N (scores
               never touch HBM)

Usage: python tools/attn_experiment.py [n_images]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp
    import mdt_policy_tpu.models.voltron_vit as vv
    import mdt_policy_tpu.models.clip as clip_mod
    from mdt_policy_tpu.models.voltron_vit import VoltronViT
    from mdt_policy_tpu.ops.pallas_attention import small_seq_mha

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    vit = VoltronViT()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(N, 224, 224, 3)), jnp.bfloat16)
    params = jax.jit(vit.init)(jax.random.PRNGKey(0), imgs)["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    orig_sdpa = vv.sdpa

    def sdpa_bf16(q, k, v, **kw):
        scale = q.shape[-1] ** -0.5
        scores = jnp.einsum("...qd,...kd->...qk", q, k) * jnp.asarray(scale, q.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("...qk,...kd->...qd", probs, v)

    def make_pallas(block_rows):
        def sdpa_pl(q, k, v, **kw):
            return small_seq_mha(q, k, v, False, block_rows)
        return sdpa_pl

    variants = {
        "xla_f32": orig_sdpa,
        "xla_bf16": sdpa_bf16,
        "pallas_16": make_pallas(16),
        "pallas_32": make_pallas(32),
        "pallas_64": make_pallas(64),
    }

    flops = None
    ref_out = None
    for name, impl in variants.items():
        vv.sdpa = impl
        try:
            fn = jax.jit(lambda p, x, c: vit.apply({"params": p}, x + c))
            carry = jnp.zeros((), jnp.bfloat16)
            out = fn(params, imgs, carry)
            np.asarray(out.reshape(-1)[0])
            if flops is None:
                try:
                    cost = fn.lower(params, imgs, carry).compile().cost_analysis()
                    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
                    flops = float(cost.get("flops"))
                except Exception:
                    pass
            if ref_out is None:
                ref_out = np.asarray(out, np.float32)
            else:
                diff = float(np.max(np.abs(np.asarray(out, np.float32) - ref_out)))
                if diff > 0.1:
                    print(f"  !! {name}: max |diff| vs xla_f32 = {diff:.4f}")
            dts = []
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(8):
                    out = fn(params, imgs, out.reshape(-1)[0] * 0)
                np.asarray(out.reshape(-1)[0])
                dts.append((time.perf_counter() - t0) / 8)
            dt = min(dts)
            mxu = flops / dt / V5E_PEAK_FLOPS * 100 if flops else 0
            print(f"{name:12s} {dt*1e3:8.1f} ms   MXU {mxu:5.1f}%   "
                  f"(loops: {', '.join(f'{d*1e3:.0f}' for d in dts)})")
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
        finally:
            vv.sdpa = orig_sdpa


if __name__ == "__main__":
    main()
