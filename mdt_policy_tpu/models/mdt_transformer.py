"""MDT (ResNet-variant) denoiser transformer.

Functional Flax re-design of the reference `MDTTransformer`
(`mdt/models/networks/mdt_transformer.py:38-335`). Differences from MDT-V:

* states are per-camera feature vectors {'static': (B,T,512), 'gripper':
  (B,T,512)} embedded by separate linears and interleaved into 2T state
  tokens (ref :309-316);
* absolute position embeddings ARE applied (ref :318-324), with the
  reference's exact slicing: goal gets pos[:goal_seq_len], state tokens share
  pos[goal : goal+T], action tokens get pos[1:];
* no proprio path in production (proprio_dim None in config).

Like MDTVTransformer, encode/decode are separately applyable and the encoder
context is returned explicitly.
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
)
from .mdtv_transformer import GoalEmbed


def _dense(features, name=None):
    return nn.Dense(features, kernel_init=dense_init, name=name)


class MDTTransformer(nn.Module):
    obs_dim: int = 512
    goal_dim: int = 512
    action_dim: int = 7
    embed_dim: int = 512
    n_enc_layers: int = 4
    n_dec_layers: int = 6
    n_heads: int = 8
    goal_seq_len: int = 1
    obs_seq_len: int = 1
    action_seq_len: int = 10
    embed_pdrob: float = 0.0
    attn_pdrop: float = 0.3
    resid_pdrop: float = 0.1
    mlp_pdrop: float = 0.05
    goal_drop: float = 0.0
    bias: bool = False
    goal_conditioned: bool = True
    use_abs_pos_emb: bool = True
    linear_output: bool = True
    use_ada_conditioning: bool = True
    use_noise_encoder: bool = False
    use_modality_encoder: bool = True
    use_mlp_goal: bool = True
    # computation dtype of the block stacks (see MDTVTransformer.compute_dtype)
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.tok_emb = _dense(self.embed_dim, name="tok_emb")
        self.incam_embed = _dense(self.embed_dim, name="incam_embed")
        seq_size = self.goal_seq_len + self.action_seq_len  # ref :81
        self.pos_emb = self.param("pos_emb", dense_init, (1, seq_size, self.embed_dim))
        self.drop = nn.Dropout(self.embed_pdrob)
        self.goal_emb = GoalEmbed(self.embed_dim, self.use_mlp_goal, name="goal_emb")
        if self.use_modality_encoder:
            self.lang_emb = GoalEmbed(self.embed_dim, self.use_mlp_goal, name="lang_emb")
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
                _dense(self.embed_dim), lambda x: jax.nn.gelu(x, approximate=False),
                _dense(self.action_dim)])

    def _sigma_token(self, sigma, batch: int):
        sigma = jnp.asarray(sigma, jnp.float32)
        if sigma.ndim == 0:
            sigma = jnp.broadcast_to(sigma, (batch,))
        log_sigma = jnp.log(jnp.maximum(sigma, 1e-20)) / 4.0
        return self.sigma_emb(log_sigma.reshape(batch, 1))

    def _preprocess_goals(self, goals, states_length: int, *, train: bool, uncond: bool):
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

    def _state_tokens(self, states: Dict[str, jax.Array]):
        """Interleave static/gripper camera tokens (ref :309-316)."""
        static = self.tok_emb(states["static"].astype(jnp.float32))
        gripper = self.incam_embed(states["gripper"].astype(jnp.float32))
        B, T = static.shape[0], static.shape[1]
        return jnp.stack([static, gripper], axis=2).reshape(B, 2 * T, self.embed_dim)

    def encode(self, states: Dict[str, jax.Array], goals: jax.Array, sigma,
               *, modality: str = "vis", train: bool = False, uncond: bool = False,
               modality_embed: bool = False):
        """(ref enc_only_forward, :211-229).

        Reference quirk preserved: the MAIN forward path embeds the goal with
        `goal_emb` regardless of modality (mdt_transformer.py:215), while the
        `forward_enc_only` variant used by clip_extra_forward IS
        modality-aware (:257-285). `modality_embed=True` selects the latter."""
        B, T = states["static"].shape[0], states["static"].shape[1]
        goals = self._preprocess_goals(goals, T, train=train, uncond=uncond)
        state_embed = self._state_tokens(states)
        # both projections run so flax creates both param sets at init; the
        # select is static, XLA dead-codes the unused one (goal is 1 token)
        goal_embed = self.goal_emb(goals)
        if self.use_modality_encoder:
            lang_embed = self.lang_emb(goals)
            if modality_embed and modality == "lang":
                goal_embed = lang_embed
        det = not train
        if self.use_abs_pos_emb:
            # ref apply_position_embeddings (:318-324); T=1 production path
            goal_x = self.drop(goal_embed + self.pos_emb[:, : self.goal_seq_len, :],
                               deterministic=det)
            state_x = self.drop(
                state_embed + self.pos_emb[:, self.goal_seq_len : self.goal_seq_len + T, :],
                deterministic=det)
        else:
            goal_x = self.drop(goal_embed, deterministic=det)
            state_x = self.drop(state_embed, deterministic=det)
        parts = []
        if self.goal_conditioned:
            parts = [goal_x, state_x]
            if not self.use_ada_conditioning:
                parts.insert(0, self._sigma_token(sigma, B))
        else:
            parts = [self._sigma_token(sigma, B), state_x]
        input_seq = jnp.concatenate(parts, axis=1)
        return self.encoder(input_seq, deterministic=det)

    def decode(self, context: jax.Array, actions: jax.Array, sigma,
               *, train: bool = False):
        """(ref dec_only_forward, :231-242)."""
        B = actions.shape[0]
        det = not train
        emb_t = self._sigma_token(sigma, B)
        # note: the reference applies NO positional embedding to decoder action
        # tokens (dec_only_forward :231-242); order comes from causal masking
        action_x = self.drop(self.action_emb(actions), deterministic=det)
        if self.use_ada_conditioning:
            x = self.decoder(action_x, emb_t, context, deterministic=det)
        else:
            x = self.decoder(action_x, context, deterministic=det)
        return self.action_pred(x)

    def __call__(self, states, actions, goals, sigma, *, modality: str = "vis",
                 train: bool = False, uncond: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        context = self.encode(states, goals, sigma, modality=modality,
                              train=train, uncond=uncond)
        pred = self.decode(context, actions, sigma, train=train)
        return pred, context
