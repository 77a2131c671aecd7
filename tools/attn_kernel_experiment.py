"""Chip microbench: fused-qkv attention kernel layout variants.

The production kernel (ops/fused_qkv_attention.py) is 274.5 ms of the
831 ms train step (trace_ops.py) at ~11 TFLOP/s — ~6x off the combined
FLOP/HBM bound. Hypothesis: the per-head 64-lane slices of the 1152-wide
qkv register block (VPU relayouts) and the VMEM cap forcing block_b=8
(many small grid cells) dominate. Variant "pair-grid" moves head selection
into the BlockSpec index maps: the grid walks (image-block, head-pair) and
the DMA engine delivers 128-lane-aligned q/k/v slices, shrinking per-cell
VMEM ~9x so image blocks can grow.

Chained fetch-barrier methodology (docs/BENCHMARKING.md); 12-layer chains
to emulate a tower pass.

Usage: python tools/attn_kernel_experiment.py [n_voltron] [n_clip]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.perf_probe import chain_bench


def make_pair_grid(n_heads: int, block_b: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[:]  # (bB, T, 128) = two 64-wide heads
        k = k_ref[:]
        v = v_ref[:]
        for h in range(2):
            sl = slice(h * 64, (h + 1) * 64)
            qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
            scores = lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * (64 ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            out = lax.dot_general(
                probs.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:, :, sl] = out.astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=())
    def run(qkv):
        B, T, C3 = qkv.shape
        C = C3 // 3
        assert C % 128 == 0 and C // n_heads == 64, (C, n_heads)
        bB = block_b
        Bp = (B + bB - 1) // bB * bB
        if Bp != B:
            qkv = jnp.pad(qkv, ((0, Bp - B), (0, 0), (0, 0)))
        cb = C // 128
        q_spec = pl.BlockSpec((bB, T, 128), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
        k_spec = pl.BlockSpec((bB, T, 128), lambda i, j: (i, 0, cb + j),
                              memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec((bB, T, 128), lambda i, j: (i, 0, 2 * cb + j),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((bB, T, 128), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bp, T, C), qkv.dtype),
            grid=(Bp // bB, n_heads // 2),
            in_specs=[q_spec, k_spec, v_spec],
            out_specs=o_spec,
            interpret=interpret,
        )(qkv, qkv, qkv)
        return out[:B]

    return run


def main():
    import jax
    import jax.numpy as jnp

    from mdt_policy_tpu.ops.fused_qkv_attention import fused_qkv_attention, _reference
    from mdt_policy_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_c = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_layers = 12
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, {n_layers}-layer chains")

    cases = [
        (f"voltron ({n_v}, 196, 3*384) H=6", (n_v, 196, 3 * 384), 6),
        (f"CLIP-vis ({n_c}, 197, 3*768) H=12", (n_c, 197, 3 * 768), 12),
    ]

    for name, shape, H in cases:
        qkv = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        C = shape[2] // 3

        def chain(fn):
            def run(x, c):
                y = x + c.astype(x.dtype)
                for _ in range(n_layers):
                    # splice the output back over the q lanes to keep the
                    # chain shape-stable and data-dependent
                    o = fn(y)
                    y = y.at[:, :, :C].set(o + 0.1 * y[:, :, :C])
                return y
            return run

        fb = lambda o: o.reshape(-1)[0].astype(jnp.float32) * 0.0

        print(f"\n== {name} ==")
        ref = np.asarray(_reference(qkv, H, False), np.float32)
        base_dt = None
        variants = [("production (head-loop)",
                     lambda x: fused_qkv_attention(x, H))]
        for bB in (16, 20, 24):
            variants.append((f"pair-grid bB={bB}",
                             (lambda f: lambda x: f(x))(make_pair_grid(H, bB))))
        for vname, fn in variants:
            try:
                out = np.asarray(fn(qkv), np.float32)
                err = np.abs(out - ref).max()
            except Exception as e:
                print(f"  {vname:28s} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:110]}")
                continue
            dt, _ = chain_bench(f"  {vname}", chain(fn), fb, qkv)
            line = f"      parity max|diff| {err:.3e}"
            if base_dt is None:
                base_dt = dt
            else:
                line += f"   -> {base_dt/dt:.2f}x vs production"
            print(line)


if __name__ == "__main__":
    main()
