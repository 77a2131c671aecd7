"""Chip microbench: norm statistics on the MXU instead of the VPU.

The production-step trace (tools/trace_ops.py) shows the LayerNorm/RMSNorm
stat reductions costing ~278 ms/step (33%) at ~30 GB/s effective — the
feature axis is the lane dimension, and cross-lane reduction is the VPU's
slow path, dragging down the whole mega-fusion XLA builds around each norm.
Hypothesis: computing sum and sum-of-squares as matmuls against a constant
(d, 128) selector matrix moves the reduction onto the MXU, which streams
operands from HBM at full rate; the normalize/apply stays an elementwise
consumer fusion.

Variants at production tower shapes (chained 12-deep like a real tower,
fetch-barrier methodology of docs/BENCHMARKING.md):
  A. XLA reference norm (production today)
  B. MXU-stats norm: stats = x @ S (col 0 sums) and (x*x) @ S, f32 accum
  C. MXU-stats, stats dot in f32 operands (exactness check of the fusion)

Usage: python tools/mxu_norm_experiment.py [n_layers]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.perf_probe import chain_bench


def make_mxu_ln(d: int, dtype, square_in_f32: bool):
    import jax.numpy as jnp
    from jax import lax

    sel = np.zeros((d, 128), np.float32)
    sel[:, 0] = 1.0

    def mxu_layer_norm(x, w, b, eps):
        s = jnp.asarray(sel, jnp.float32 if square_in_f32 else x.dtype)
        xs = x.astype(jnp.float32) if square_in_f32 else x
        dot = lambda a: lax.dot_general(
            a, s, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0]
        mean = dot(xs) / d
        meansq = dot(xs * xs) / d
        var = jnp.maximum(meansq - mean * mean, 0.0)
        inv = lax.rsqrt(var + eps)
        y = (x.astype(jnp.float32) - mean[..., None]) * inv[..., None]
        return (y * w + b).astype(x.dtype)

    return mxu_layer_norm


def make_mxu_rms(d: int, dtype, square_in_f32: bool):
    import jax.numpy as jnp
    from jax import lax

    sel = np.zeros((d, 128), np.float32)
    sel[:, 0] = 1.0

    def mxu_rms_norm(x, w, eps):
        s = jnp.asarray(sel, jnp.float32 if square_in_f32 else x.dtype)
        xs = x.astype(jnp.float32) if square_in_f32 else x
        meansq = lax.dot_general(
            xs * xs, s, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0] / d
        inv = lax.rsqrt(meansq + eps)
        return (x.astype(jnp.float32) * inv[..., None] * w).astype(x.dtype)

    return mxu_rms_norm


def main():
    import jax
    import jax.numpy as jnp

    from mdt_policy_tpu.ops.fused_norm import _ln_reference, _rms_reference
    from mdt_policy_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, chaining {n_layers} norms/iter")

    cases = [
        ("voltron RMSNorm (2048, 196, 384)", "rms", (2048, 196, 384)),
        ("CLIP LayerNorm  (1024, 197, 768)", "ln", (1024, 197, 768)),
    ]

    for name, kind, shape in cases:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        d = shape[-1]
        w = jnp.asarray(rng.normal(size=d), jnp.float32)
        b = jnp.asarray(rng.normal(size=d), jnp.float32)
        hbm_gb = 2 * x.size * x.dtype.itemsize * n_layers / 1e9

        if kind == "rms":
            variants = [
                ("XLA reference", lambda xx: _rms_reference(xx, w, 1e-8)),
                ("MXU-stats bf16 sq",
                 (lambda f: lambda xx: f(xx, w, 1e-8))(make_mxu_rms(d, x.dtype, False))),
                ("MXU-stats f32 sq",
                 (lambda f: lambda xx: f(xx, w, 1e-8))(make_mxu_rms(d, x.dtype, True))),
            ]
        else:
            variants = [
                ("XLA reference", lambda xx: _ln_reference(xx, w, b, 1e-5)),
                ("MXU-stats bf16 sq",
                 (lambda f: lambda xx: f(xx, w, b, 1e-5))(make_mxu_ln(d, x.dtype, False))),
                ("MXU-stats f32 sq",
                 (lambda f: lambda xx: f(xx, w, b, 1e-5))(make_mxu_ln(d, x.dtype, True))),
            ]

        def chain(fn):
            def run(xx, c):
                y = xx + c.astype(xx.dtype)
                for _ in range(n_layers):
                    y = fn(y) + 0.5 * y
                return y
            return run

        fb = lambda o: o.reshape(-1)[0].astype(jnp.float32) * 0.0

        print(f"\n== {name}  ({hbm_gb:.2f} GB min traffic/iter) ==")
        ref_out = None
        base_dt = None
        for vname, fn in variants:
            dt, _ = chain_bench(f"  {vname}", chain(fn), fb, x)
            bw = hbm_gb / dt
            line = f"      {bw:.0f} GB/s effective (v5e peak 819)"
            if base_dt is None:
                base_dt = dt
            else:
                line += f"  -> {base_dt/dt:.2f}x vs XLA"
            print(line)
            out = np.asarray(fn(x), np.float32)
            if ref_out is None:
                ref_out = out
            else:
                print(f"      parity vs XLA: max|diff| = "
                      f"{np.abs(out - ref_out).max():.2e}")


if __name__ == "__main__":
    main()
