"""Perceiver resampler (Flamingo-style) — compresses the 2-camera Voltron
token grid into `num_latents` observation tokens.

Functional Flax re-design of the reference
(`mdt/models/networks/transformers/perceiver_resampler.py:11-163`).
Production config (conf/model/mdtv_agent.yaml): dim=384, depth=6, heads=8,
dim_head=64, num_latents=3, num_time_embeds=1.

Parity details: q/k/v/out projections are biasless; keys/values attend over
(features ++ latents); latents and time position embeddings are initialized
from a unit normal (torch.randn, ref :100-101); the feed-forward is
LN -> Linear(4d, no bias) -> GELU -> Linear(d, no bias) (transformers/utils.py:15-27).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from mdt_policy_tpu.ops.attention import sdpa

__all__ = ["PerceiverAttentionLayer", "PerceiverResampler"]


def _factored_kv_attention(q, kv, wk, wv, heads: int, dim_head: int):
    """Cross-attention that never materializes K/V over the token axis.

    The perceiver's query block is tiny (num_latents*heads = 24 rows) while
    the K/V projections sweep the full 392-token media grid (B*395*C*inner
    MACs each) and the (B, T, H, D) head layout costs a physical retile copy
    per tensor (trace_ops --precomputed: ~89 ms/step of copies at B=512,
    dominated by bf16[512,395,8,64] retiles). Matmul associativity removes
    both:

      scores = (q @ Wk^T-folded) @ media^T     — fold W_k into q first
               (B,24,C) @ (B,T,C)^T: contracts C, K never exists
      out    = ((probs @ media) @ Wv) per head — re-associate the V side
               (B,24,T) @ (B,T,C) then (B,H,Tq,C) @ (C,H,D): V never exists

    Same math as sdpa over projected K/V (parity-tested); ~7x fewer FLOPs
    per layer (the T-axis only ever meets 24-row operands) and zero layout
    copies (both big contractions run on the media's native (B, T, C)).
    """
    B, Tq, _ = q.shape
    C = kv.shape[-1]
    scale = dim_head ** -0.5
    low_precision = q.dtype in (jnp.bfloat16, jnp.float16)
    qh = q.reshape(B, Tq, heads, dim_head)
    wkh = wk.reshape(C, heads, dim_head).astype(q.dtype)
    q_eff = jnp.einsum("bqhd,chd->bhqc", qh, wkh).reshape(B, heads * Tq, C)
    scores = jnp.einsum("bqc,btc->bqt", q_eff, kv)
    scores = scores * jnp.asarray(scale, q.dtype) if low_precision \
        else scores.astype(jnp.float32) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bqt,btc->bqc", probs, kv).reshape(B, heads, Tq, C)
    wvh = wv.reshape(C, heads, dim_head).astype(q.dtype)
    out = jnp.einsum("bhqc,chd->bqhd", ctx, wvh)
    return out.reshape(B, Tq, heads * dim_head)


def _factored_folded_attention(q, xhat, lat_n, s, b, wk, wv,
                               heads: int, dim_head: int):
    """_factored_kv_attention with the media LayerNorm AFFINE folded into
    the algebra as well: the media enters both big contractions in its
    stats-normalized form `xhat` (computed once per step by the resampler),
    and this layer's learned affine x = xhat*s + b is applied through

      scores_media = (q_eff * s) @ xhat^T + q_eff @ b      (bias: rank-1)
      ctx_media    = (probs_media @ xhat) * s + rowsum(probs_media) ⊗ b

    so the per-layer (B, T, C) affined media tensor never materializes
    (trace_ops: ~1.7 ms/layer of multiply_add fusions at B=512) and the
    affine's backward becomes tiny 24-row contractions instead of
    (B, T, C)-wide reduces. Latent rows keep their own LayerNorm and attend
    unfolded (they are 3 rows). Same math (parity-tested)."""
    B, Tq, _ = q.shape
    C = xhat.shape[-1]
    scale = dim_head ** -0.5
    low_precision = q.dtype in (jnp.bfloat16, jnp.float16)
    qh = q.reshape(B, Tq, heads, dim_head)
    wkh = wk.reshape(C, heads, dim_head).astype(q.dtype)
    q_eff = jnp.einsum("bqhd,chd->bhqc", qh, wkh).reshape(B, heads * Tq, C)
    scores_m = jnp.einsum("bqc,btc->bqt", q_eff * s[None, None, :], xhat) \
        + (q_eff @ b)[..., None]
    scores_l = jnp.einsum("bqc,btc->bqt", q_eff, lat_n)
    scores = jnp.concatenate([scores_m, scores_l], axis=-1)
    scores = scores * jnp.asarray(scale, q.dtype) if low_precision \
        else scores.astype(jnp.float32) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    n_media = xhat.shape[-2]
    probs_m, probs_l = probs[..., :n_media], probs[..., n_media:]
    ctx = jnp.einsum("bqt,btc->bqc", probs_m, xhat) * s[None, None, :] \
        + probs_m.sum(-1, keepdims=True) * b[None, None, :] \
        + jnp.einsum("bqt,btc->bqc", probs_l, lat_n)
    ctx = ctx.reshape(B, heads, Tq, C)
    wvh = wv.reshape(C, heads, dim_head).astype(q.dtype)
    out = jnp.einsum("bhqc,chd->bqhd", ctx, wvh)
    return out.reshape(B, Tq, heads * dim_head)


class _AffineParams(nn.Module):
    """The PARAMS of _LNAffine (same path/shapes: scale, bias) without the
    elementwise apply — for the folded factored path, which applies the
    affine algebraically inside the attention contractions."""

    @nn.compact
    def __call__(self, d: int):
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        return scale, bias


class _ProjKernel(nn.Module):
    """Bare biasless-Dense kernel — same param path/shape/init as
    nn.Dense(features, use_bias=False), so checkpoints and torch ports are
    layout-identical whether the projection is applied directly (Dense) or
    algebraically folded (factored attention)."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (in_features, self.features))


def _head_slice_attention(q, k, v, heads: int, dim_head: int):
    """Multi-head attention over (B, Tq/Tk, heads*dim_head) operands via
    per-head minor-dim slices — no (B, T, H, D) tensor ever materializes.

    Slicing the feature (minor) axis at dim_head alignment is free; the
    score matmul contracts both operands' minor dims (MXU 'NT') and the PV
    matmul contracts K's second-minor ('NN') — neither needs a physical
    transpose of the (B, T, inner) K/V, unlike the 4-D head layouts XLA
    retiles with full-tensor copies. Same math as ops/attention.sdpa;
    sdpa stays the default for self-attention shapes where Tq == Tk keeps
    the 4-D layout profitable."""
    scale = dim_head ** -0.5
    low_precision = q.dtype in (jnp.bfloat16, jnp.float16)
    outs = []
    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        # same dtype staging as ops/attention.sdpa: scores live in the
        # compute dtype for bf16 inputs, softmax accumulates in f32
        scores = jnp.einsum("bqd,btd->bqt", q[..., sl], k[..., sl])
        scores = scores * jnp.asarray(scale, q.dtype) if low_precision \
            else scores.astype(jnp.float32) * scale
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        outs.append(jnp.einsum("bqt,btd->bqd", probs.astype(q.dtype),
                               v[..., sl]))
    return jnp.concatenate(outs, axis=-1)


class _LNAffine(nn.Module):
    """The affine half of a LayerNorm, applied to an input whose
    normalization statistics were already applied (hoisted by the caller).
    Parameter tree path and shapes are identical to nn.LayerNorm, so
    checkpoints and ports are unaffected."""

    @nn.compact
    def __call__(self, xhat):
        d = xhat.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        return xhat * scale.astype(xhat.dtype) + bias.astype(xhat.dtype)


class PerceiverAttentionLayer(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32   # activation dtype; params stay float32
    # head-sliced attention: per-head minor-dim slices of the (B, T, inner)
    # K/V instead of a (B, T, H, D) reshape — the 4-D layout costs ~61 ms of
    # physical transpose copies per cache-mode step at B=512 (trace_ops
    # --precomputed), while 64-aligned minor-dim slices feed the MXU's
    # NT/NN matmuls with no copy. Math identical to sdpa (parity-tested).
    head_slice: bool = False
    # factored attention: fold W_k into the tiny query block and
    # re-associate the V side so K/V over the 395-token media never
    # materialize (see _factored_kv_attention) — ~7x fewer FLOPs and zero
    # retile copies. Same math (parity-tested); takes precedence over
    # head_slice.
    factored: bool = False

    @nn.compact
    def __call__(self, features, latents, features_prenormed: bool = False):
        """Latents cross-attend to (features ++ latents) (ref :30-77).

        features_prenormed=True means the caller already applied the
        normalization STATISTICS to `features` (they are layer-independent —
        the media never changes across resampler layers), so this layer only
        applies its own learned affine: bit-identical math, one stats pass
        instead of `depth`."""
        assert features.ndim == 3 and latents.ndim == 3
        B, n_queries, _ = latents.shape
        inner = self.dim_head * self.heads
        C = features.shape[-1]
        if self.factored and features_prenormed:
            # folded path: the affined media never materializes
            lat = nn.LayerNorm(name="norm_latents", dtype=self.dtype)(latents)
            q = nn.Dense(inner, use_bias=False, name="to_q",
                         dtype=self.dtype)(lat)
            s, b = _AffineParams(name="norm_media")(C)
            wk = _ProjKernel(inner, name="to_k")(C)
            wv = _ProjKernel(inner, name="to_v")(C)
            out = _factored_folded_attention(
                q, features, lat, s.astype(q.dtype), b.astype(q.dtype),
                wk, wv, self.heads, self.dim_head)
            return nn.Dense(self.dim, use_bias=False, name="to_out",
                            dtype=self.dtype)(out)
        if features_prenormed:
            x = _LNAffine(name="norm_media")(features)
        else:
            x = nn.LayerNorm(name="norm_media", dtype=self.dtype)(features)
        lat = nn.LayerNorm(name="norm_latents", dtype=self.dtype)(latents)
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(lat)
        kv_input = jnp.concatenate([x, lat], axis=-2)
        if self.factored:
            wk = _ProjKernel(inner, name="to_k")(kv_input.shape[-1])
            wv = _ProjKernel(inner, name="to_v")(kv_input.shape[-1])
            out = _factored_kv_attention(q, kv_input, wk, wv,
                                         self.heads, self.dim_head)
            return nn.Dense(self.dim, use_bias=False, name="to_out",
                            dtype=self.dtype)(out)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(kv_input)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(kv_input)
        # bthd layout: contract the head-interleaved tensors directly,
        # skipping the (B,T,H,D)->(B,H,T,D) transposes on the (B, 392+lat,
        # heads, dim_head) K/V grids. End-to-end neutral on the chip
        # (843.9 vs 845 ms/step — XLA overlapped the copies), kept for the
        # smaller program.
        if self.head_slice:
            out = _head_slice_attention(q, k, v, self.heads, self.dim_head)
        else:
            q = q.reshape(B, n_queries, self.heads, self.dim_head)
            k = k.reshape(B, -1, self.heads, self.dim_head)
            v = v.reshape(B, -1, self.heads, self.dim_head)
            out = sdpa(q, k, v, layout="bthd").reshape(B, n_queries, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out",
                        dtype=self.dtype)(out)


class FeedForward(nn.Module):
    """LN -> Linear(mult*d) -> act -> Linear(d), biasless
    (ref transformers/utils.py:15-27)."""
    dim: int
    mult: int = 4
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        acts = {
            "gelu": lambda v: jax.nn.gelu(v, approximate=False),
            "relu": jax.nn.relu,
            "sqrelu": lambda v: jnp.square(jax.nn.relu(v)),
        }
        x = nn.LayerNorm(name="norm", dtype=self.dtype)(x)
        x = nn.Dense(int(self.dim * self.mult), use_bias=False, name="fc1",
                     dtype=self.dtype)(x)
        x = acts[self.activation](x)
        return nn.Dense(self.dim, use_bias=False, name="fc2",
                        dtype=self.dtype)(x)


class PerceiverResampler(nn.Module):
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    num_time_embeds: int = 4
    ff_mult: int = 4
    activation: str = "gelu"
    # activation/compute dtype (params are always float32); bf16 halves the
    # dominant K/V residuals over the 392-token voltron grid at large batch
    dtype: jnp.dtype = jnp.float32
    head_slice: bool = False   # see PerceiverAttentionLayer.head_slice
    factored: bool = False     # see PerceiverAttentionLayer.factored

    @nn.compact
    def __call__(self, x_f, mask=None):
        """x_f: (B, n_frames, n_features, dim) -> (B, num_latents, dim)
        (ref :123-163)."""
        assert x_f.ndim == 4
        B, max_length, _, dim = x_f.shape
        assert dim == self.dim
        latents = self.param("latents", nn.initializers.normal(1.0),
                             (self.num_latents, self.dim))
        time_pos_emb = self.param("time_pos_emb", nn.initializers.normal(1.0),
                                  (self.num_time_embeds, 1, self.dim))
        tpe = jnp.broadcast_to(time_pos_emb[None, :max_length],
                               (B, max_length, 1, self.dim))
        if mask is not None:
            tpe = tpe * mask[:, :, None, None].astype(tpe.dtype)
        x_f = (x_f + tpe.astype(x_f.dtype)).astype(self.dtype)
        x_f = x_f.reshape(B, -1, self.dim)
        # the media is constant across layers, so its LayerNorm STATISTICS
        # are too — normalize once here (no params), each layer applies only
        # its own affine (_LNAffine). Identical math, one stats pass over
        # the (B, 392, dim) grid instead of `depth` (the grid is the HBM-
        # traffic hog of this module at production batch).
        x_f = nn.LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                           name="media_stats")(x_f)
        x = jnp.broadcast_to(latents[None].astype(self.dtype),
                             (B, self.num_latents, self.dim))
        for i in range(self.depth):
            x = x + PerceiverAttentionLayer(self.dim, self.dim_head, self.heads,
                                            dtype=self.dtype,
                                            head_slice=self.head_slice,
                                            factored=self.factored,
                                            name=f"attn_{i}")(
                                                x_f, x, features_prenormed=True)
            x = x + FeedForward(self.dim, self.ff_mult, self.activation,
                                dtype=self.dtype, name=f"ffw_{i}")(x)
        return nn.LayerNorm(name="norm")(x.astype(jnp.float32))
