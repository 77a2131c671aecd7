"""MDT-V denoiser: encoder-decoder score transformer.

Functional Flax re-design of the reference `MDTVTransformer`
(`mdt/models/networks/mdtv_transformer.py:35-313`). Token layout (production
config, conf/model/model/mdtv_transformer.yaml):

  encoder input  = [goal_tok(1), perceiver obs toks(3)]          (AdaLN mode)
                   [sigma_tok(1), goal_tok(1), obs toks(3)]      (non-AdaLN)
  decoder input  = 10 noised-action tokens, causal self-attn with AdaLN-Zero
                   sigma conditioning + cross-attn to encoder context.

Differences from the reference, by design:
* `latent_encoder_emb` is a return value, not module state — pure function.
* `encode` / `decode` are separately applyable methods so samplers hoist the
  encoder context OUT of the denoising scan (the reference recomputes the
  encoder every sampler step, mdtv_transformer.py:208-211).
* sigma is clamped to >= 1e-20 before `log(sigma)/4` (ref :239) so the
  terminal sigma=0 entry of schedules can't produce NaNs in discarded
  `where` branches.
* `modality` ('lang' vs 'vis') and `uncond` are static Python arguments —
  the jitted train step unrolls both modalities (SURVEY §7 hard parts).

The unused-in-MDT-V `pos_emb` parameter is kept for checkpoint-layout parity
(ref :103 allocates it; forward_enc_only never reads it).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import (
    SigmaEmbedding,
    TransformerDecoder,
    TransformerEncoder,
    TransformerFiLMDecoder,
    dense_init,
    mish,
)


def _dense(features, use_bias=True, name=None):
    return nn.Dense(features, use_bias=use_bias, kernel_init=dense_init, name=name)


class GoalEmbed(nn.Module):
    """Linear or MLP goal projection (ref mdtv_transformer.py:83-101)."""
    embed_dim: int
    use_mlp: bool = True

    @nn.compact
    def __call__(self, g):
        if not self.use_mlp:
            return _dense(self.embed_dim, name="linear")(g)
        g = _dense(self.embed_dim * 2, name="fc1")(g)
        g = jax.nn.gelu(g, approximate=False)
        return _dense(self.embed_dim, name="fc2")(g)


class ProprioEmbed(nn.Module):
    """Linear-Mish-Linear proprio projection (ref mdtv_transformer.py:159-163)."""
    embed_dim: int

    @nn.compact
    def __call__(self, p):
        p = _dense(self.embed_dim * 2, name="fc1")(p)
        return _dense(self.embed_dim, name="fc2")(mish(p))


class MDTVTransformer(nn.Module):
    obs_dim: int = 384
    goal_dim: int = 512
    action_dim: int = 7
    proprio_dim: int = 8
    embed_dim: int = 384
    n_enc_layers: int = 4
    n_dec_layers: int = 4
    n_heads: int = 8
    goal_seq_len: int = 1
    obs_seq_len: int = 1
    n_obs_token: int = 3
    action_seq_len: int = 10
    embed_pdrob: float = 0.0
    attn_pdrop: float = 0.3
    resid_pdrop: float = 0.1
    mlp_pdrop: float = 0.05
    goal_drop: float = 0.0
    bias: bool = False
    goal_conditioned: bool = True
    linear_output: bool = True
    use_ada_conditioning: bool = True
    use_noise_encoder: bool = False
    use_modality_encoder: bool = True
    use_mlp_goal: bool = True
    # computation dtype of the encoder/decoder block stacks (None = f32
    # bit-parity default): params stay f32, GEMMs/attention run in `dtype`,
    # the residual stream re-promotes to f32 on every residual add — the
    # TPU analogue of the reference's AMP-16 training (conf/config.yaml:46).
    # Embedding projections / sigma MLP / action head stay f32 (tiny).
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.tok_emb = _dense(self.embed_dim, name="tok_emb")
        self.goal_emb = GoalEmbed(self.embed_dim, self.use_mlp_goal, name="goal_emb")
        if self.use_modality_encoder:
            self.lang_emb = GoalEmbed(self.embed_dim, self.use_mlp_goal, name="lang_emb")
        seq_size = self.goal_seq_len + self.obs_seq_len * self.n_obs_token + self.action_seq_len
        # dead in MDT-V forward; kept for checkpoint-layout parity (ref :103)
        self.pos_emb = self.param("pos_emb", dense_init, (1, seq_size, self.embed_dim))
        self.drop = nn.Dropout(self.embed_pdrob)
        self.proprio_emb = ProprioEmbed(self.embed_dim, name="proprio_emb")
        self.sigma_emb = SigmaEmbedding(self.embed_dim, name="sigma_emb")
        self.action_emb = _dense(self.embed_dim, name="action_emb")
        self.encoder = TransformerEncoder(
            self.embed_dim, self.n_heads, self.n_enc_layers,
            self.attn_pdrop, self.resid_pdrop, self.mlp_pdrop, self.bias,
            dtype=self.compute_dtype, name="encoder")
        if self.use_ada_conditioning:
            self.decoder = TransformerFiLMDecoder(
                self.embed_dim, self.n_heads, self.n_dec_layers, self.embed_dim,
                self.attn_pdrop, self.resid_pdrop, self.mlp_pdrop, self.bias,
                use_cross_attention=True, use_noise_encoder=self.use_noise_encoder,
                dtype=self.compute_dtype, name="decoder")
        else:
            self.decoder = TransformerDecoder(
                self.embed_dim, self.n_heads, self.n_dec_layers,
                self.attn_pdrop, self.resid_pdrop, self.mlp_pdrop, self.bias,
                use_cross_attention=True, dtype=self.compute_dtype,
                name="decoder")
        if self.linear_output:
            self.action_pred = _dense(self.action_dim, name="action_pred")
        else:
            self.action_pred = nn.Sequential([
                _dense(100), lambda x: jax.nn.gelu(x, approximate=False),
                _dense(self.action_dim)])

    # ---- sigma -------------------------------------------------------------

    def _sigma_token(self, sigma, batch: int):
        """sigma -> (B, 1, embed) token via log(sigma)/4 (ref :238-244)."""
        sigma = jnp.asarray(sigma, jnp.float32)
        if sigma.ndim == 0:
            sigma = jnp.broadcast_to(sigma, (batch,))
        log_sigma = jnp.log(jnp.maximum(sigma, 1e-20)) / 4.0
        return self.sigma_emb(log_sigma.reshape(batch, 1))

    # ---- goal handling -----------------------------------------------------

    def _preprocess_goals(self, goals, states_length: int, *, train: bool, uncond: bool):
        """(ref :246-258) normalize goal shape, CFG goal-dropout, uncond zeroing."""
        if goals.ndim == 2:
            goals = goals[:, None, :]
        if goals.shape[1] == states_length and self.goal_seq_len == 1:
            goals = goals[:, :1, :]
        if goals.shape[-1] == 2 * self.obs_dim:
            goals = goals[:, :, : self.obs_dim]
        if train and self.goal_drop > 0.0:
            rng = self.make_rng("goal_mask")
            mask = jax.random.bernoulli(rng, self.goal_drop, goals.shape)
            goals = goals * (1.0 - mask.astype(goals.dtype))
        if uncond:
            goals = jnp.zeros_like(goals)
        return goals

    # ---- public API ----------------------------------------------------------

    def encode(self, states: Dict[str, jax.Array], goals: jax.Array, sigma,
               *, modality: str = "vis", train: bool = False, uncond: bool = False):
        """Encoder context (ref forward_enc_only, :213-222). Returns the
        latent used by the aux losses (latent_encoder_emb)."""
        state_images = states["state_images"]
        B = state_images.shape[0]
        goals = self._preprocess_goals(goals, state_images.shape[1], train=train, uncond=uncond)
        state_embed = self.tok_emb(state_images)
        # both projections run so flax creates both param sets at init; the
        # select is static, XLA dead-codes the unused one (goal is 1 token)
        goal_embed = self.goal_emb(goals)
        if self.use_modality_encoder:
            lang_embed = self.lang_emb(goals)
            if modality == "lang":
                goal_embed = lang_embed
        parts = []
        if self.goal_conditioned:
            parts.append(goal_embed)
        parts.append(state_embed)
        if "state_obs" in states:
            parts.append(self.proprio_emb(states["state_obs"]))
        elif not self.goal_conditioned:
            parts.append(self.drop(goal_embed, deterministic=not train))
        if not self.use_ada_conditioning:
            parts.insert(0, self._sigma_token(sigma, B))
        input_seq = jnp.concatenate(parts, axis=1)
        return self.encoder(input_seq, deterministic=not train)

    def decode(self, context: jax.Array, actions: jax.Array, sigma,
               *, train: bool = False):
        """Decoder pass over noised action tokens (ref forward_dec_only, :224-236)."""
        B = actions.shape[0]
        emb_t = self._sigma_token(sigma, B)
        action_x = self.drop(self.action_emb(actions), deterministic=not train)
        if self.use_ada_conditioning:
            x = self.decoder(action_x, emb_t, context, deterministic=not train)
        else:
            x = self.decoder(action_x, context, deterministic=not train)
        return self.action_pred(x)

    def __call__(self, states, actions, goals, sigma, *, modality: str = "vis",
                 train: bool = False, uncond: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """Full score-model forward. Returns (pred_actions, encoder_context);
        the context doubles as `latent_encoder_emb` for the aux losses."""
        context = self.encode(states, goals, sigma, modality=modality,
                              train=train, uncond=uncond)
        pred = self.decode(context, actions, sigma, train=train)
        return pred, context
