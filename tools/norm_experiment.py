"""Chip microbench: XLA norm lowering vs the single-pass Pallas norm kernels
(ops/fused_norm.py) at production tower shapes, plus output parity of the
COMPILED kernels (not interpret mode) on the same device.

Methodology: docs/BENCHMARKING.md — chained loops (iteration i+1 consumes a
scalar from iteration i) terminated by a real device->host fetch. The XLA
baselines are jitted standalone, which UNDERSTATES the production cost (in
the full step they compete for fusion slots); the decision measurement is
the end-to-end step via tools/step_sweep.py / bench.py.

Usage: python tools/norm_experiment.py [n_layers]
  n_layers chains that many norm applications per iteration (default 12,
  one tower's worth) so per-call overhead amortizes like a real tower.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.perf_probe import chain_bench  # chained fetch-barrier timing


def main():
    import jax
    import jax.numpy as jnp

    from mdt_policy_tpu.ops.fused_norm import (
        _ln_reference,
        _rms_reference,
        fused_layer_norm,
        fused_rms_norm,
    )

    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, chaining {n_layers} norms/iter")

    # production shapes: voltron sees 2 scopes x 2 cams x B=512 images of 196
    # tokens at 384 wide (bf16); CLIP vision 2 scopes x 512 of 197 @ 768
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
            ref_fn = lambda xx: _rms_reference(xx, w, 1e-8)
            fused_fn = lambda xx: fused_rms_norm(xx, w, 1e-8)
        else:
            ref_fn = lambda xx: _ln_reference(xx, w, b, 1e-5)
            fused_fn = lambda xx: fused_layer_norm(xx, w, b, 1e-5)

        def chain(fn):
            def run(xx, c):
                y = xx + c.astype(xx.dtype)
                for _ in range(n_layers):
                    # re-add a tiny residual so consecutive norms don't
                    # collapse to idempotence the compiler could exploit
                    y = fn(y) + 0.5 * y
                return y
            return run

        fb = lambda o: o.reshape(-1)[0].astype(jnp.float32) * 0.0

        print(f"\n== {name}  ({hbm_gb:.2f} GB min traffic/iter) ==")
        dt_x, _ = chain_bench("  XLA lowering", chain(ref_fn), fb, x)
        dt_p, _ = chain_bench("  Pallas single-pass", chain(fused_fn), fb, x)
        bw_x = hbm_gb / dt_x
        bw_p = hbm_gb / dt_p
        print(f"  effective HBM bw: XLA {bw_x:.0f} GB/s, Pallas {bw_p:.0f} GB/s "
              f"(v5e peak 819) -> {dt_x/dt_p:.2f}x")

        # compiled-kernel parity on-device (bf16 in/out, f32 stats)
        y_ref = np.asarray(ref_fn(x), np.float32)
        y_pal = np.asarray(fused_fn(x), np.float32)
        print(f"  compiled parity: max|diff| = {np.abs(y_ref - y_pal).max():.2e}")


if __name__ == "__main__":
    main()
