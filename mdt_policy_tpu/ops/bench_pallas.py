"""Pallas-vs-XLA attention measurement (VERDICT r1 weak #7: make the Pallas
axis win or close it with a documented table).

Microbenchmarks the fused small-seq kernel against the XLA einsum path at the
production shapes of every attention site in the MDT-V step, on the real TPU:

    python -m mdt_policy_tpu.ops.bench_pallas

Shapes (B=512/modality production step):
  decoder self-attn   (B=1024, H=8,  T=10, D=48)   x 4 layers x 2 modalities
  encoder self-attn   (B=1024, H=8,  T=4,  D=48)   x 4 layers
  perceiver cross     (B=1024, H=8,  T=3/395, D=64) x 6  (query T=3)
  voltron ViT         (B=2048, H=6,  T=196, D=64)  x 12 (not small-seq)

Timing protocol: pipelined loop (sync only at the end) per the axon-tunnel
latency note; median of 5 reps of 50 iters.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def _time(fn, q, k, v, iters=2000, reps=3):
    """Time fn(q,k,v) inside ONE jitted lax.scan with a data dependency —
    per-dispatch tunnel latency (~hundreds of us) would otherwise swamp
    kernels this small."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(q, k, v):
        def body(carry, _):
            out = fn(carry, k, v)
            # data dependency: feed the output back as the next query
            return out, ()
        final, _ = jax.lax.scan(body, q, None, length=iters)
        return final

    out = loop(q, k, v)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(q, k, v)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.ops.attention import sdpa
    from mdt_policy_tpu.ops.pallas_attention import small_seq_mha

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    cases = [
        ("decoder_T10", (1024, 8, 10, 48), True),
        ("encoder_T4", (1024, 8, 4, 48), False),
        ("encoder_T23", (1024, 8, 23, 48), False),
        ("decoder_T10_B4096", (4096, 8, 10, 48), True),
    ]
    rows = []
    for name, shape, causal in cases:
        q, k, v = (jnp.asarray(rng.normal(size=shape), jnp.float32)
                   for _ in range(3))

        xla = jax.jit(functools.partial(_xla_sdpa, causal=causal))
        pal = jax.jit(functools.partial(small_seq_mha, causal=causal))
        t_xla = _time(xla, q, k, v)
        t_pal = _time(pal, q, k, v)
        rows.append({"case": name, "shape": list(shape), "causal": causal,
                     "xla_us": round(t_xla * 1e6, 1),
                     "pallas_us": round(t_pal * 1e6, 1),
                     "pallas_speedup": round(t_xla / t_pal, 3)})
        print(rows[-1], file=sys.stderr)
    print(json.dumps({"backend": backend, "rows": rows}))


def _xla_sdpa(q, k, v, causal):
    from mdt_policy_tpu.ops.attention import sdpa

    return sdpa(q, k, v, causal=causal)


if __name__ == "__main__":
    main()
