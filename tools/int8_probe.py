"""Is int8 matmul worth it for the frozen towers on this chip?

The frozen CLIP/Voltron towers hold ~60 of the 75 TFLOP in the production
train step (docs/BENCHMARKING.md), and a v5e MXU runs int8 x int8 -> int32
at 2x the bf16 rate (394 TOPS vs 197 TFLOP/s). This probe measures whether
XLA actually reaches the int8 path at the towers' GEMM shapes.

Sub-ms kernels drown in the ~10 ms tunnel dispatch floor, so the repeat
loop lives INSIDE one jitted program: a fori_loop chains STEPS GEMMs, each
consuming a scalar of the previous output (no dead-code elimination, no
parallel overlap), and the wall time of one dispatch is divided by STEPS.
The final fetch is a real device->host np.asarray (docs/BENCHMARKING.md).

  1. bf16 dot                      (the production baseline)
  2. int8 dot, pre-quantized both  (the raw MXU ceiling)
  3. w8a8 dynamic: bf16 act -> per-row quantize -> int8 dot -> dequant
     (the realistic frozen-tower pipeline; weight quantize is hoisted)

Usage: python tools/int8_probe.py [M] [STEPS]   (default M=65536, STEPS=24)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_FLOPS = 197e12


def timed_loop(name, jitted, args, flops_per_step, steps, reps=3):
    out = jitted(*args)
    np.asarray(out)  # warmup + drain
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        np.asarray(out)
        dts.append((time.perf_counter() - t0) / steps)
    dt = min(dts)
    mxu = flops_per_step / dt / V5E_PEAK_FLOPS * 100
    print(f"{name:36s} {dt*1e3:8.3f} ms/GEMM  MXU {mxu:5.1f}% of bf16 peak"
          f"   (loops: {', '.join(f'{d*1e3:.2f}' for d in dts)})")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    rng = np.random.default_rng(0)
    # (K, N) pairs of the tower GEMMs: CLIP qkv / mlp-in / mlp-out, Voltron glu
    shapes = [(768, 2304), (768, 3072), (3072, 768), (384, 3072)]

    for K, N in shapes:
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
        wscale = jnp.asarray(rng.uniform(0.01, 0.02, size=(N,)), jnp.float32)
        flops = 2 * M * K * N
        print(f"--- GEMM ({M} x {K}) @ ({K} x {N})  {flops/1e12:.3f} TFLOP, "
              f"{STEPS} chained in-program")

        @jax.jit
        def bf16_loop(x, w):
            def body(_, x):
                out = x @ w
                return x + out.reshape(-1)[0] * 0
            return jax.lax.fori_loop(0, STEPS, body, x).reshape(-1)[0]

        dt = timed_loop("  bf16 dot", bf16_loop, (x, w), flops, STEPS)

        @jax.jit
        def int8_loop(a, b):
            def body(_, a):
                out = jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return a + (out.reshape(-1)[0] * 0).astype(jnp.int8)
            return jax.lax.fori_loop(0, STEPS, body, a).reshape(-1)[0]

        dt8 = timed_loop("  int8 dot (pre-quantized)", int8_loop, (xq, wq),
                         flops, STEPS)
        print(f"      -> int8 speedup {dt/dt8:.2f}x")

        @jax.jit
        def w8a8_loop(x, b, bs):
            def body(_, x):
                s = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                s = jnp.maximum(s.astype(jnp.float32) / 127.0, 1e-8)
                aq = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    aq, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = (acc.astype(jnp.float32) * s * bs[None, :]).astype(jnp.bfloat16)
                return x + out.reshape(-1)[0] * 0
            return jax.lax.fori_loop(0, STEPS, body, x).reshape(-1)[0]

        dtd = timed_loop("  w8a8 dynamic (quant+dq in-graph)", w8a8_loop,
                         (x, wq, wscale), flops, STEPS)
        print(f"      -> w8a8 speedup {dt/dtd:.2f}x")


if __name__ == "__main__":
    main()
