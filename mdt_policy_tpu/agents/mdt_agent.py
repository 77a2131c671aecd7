"""MDT (ResNet-variant) agent.

Functional re-design of the reference `MDTAgent`
(`mdt/models/mdt_agent.py:42-807`). Differences from MDT-V
(agents/mdtv_agent.py):

* per-camera TRAINABLE ResNet-18(GroupNorm) encoders -> one 512-d token per
  camera (ref :75-76, embed_visual_obs :368-382) instead of frozen Voltron
  tokens + perceiver;
* denoiser = MDTTransformer (512d, 4 enc / 6 dec layers) over
  {'static','gripper'} state tokens;
* clip_proj style 'single_token' with token index 1 over 3 context tokens
  (ref :112-117).

The train-step/optimizer/EMA machinery is shared with the MDT-V module.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from mdt_policy_tpu.diffusion import make_sample_density
from mdt_policy_tpu.diffusion.precond import append_dims, get_scalings
from mdt_policy_tpu.models.blocks import ClipStyleProjection
from mdt_policy_tpu.models.clip import CLIPTextTower
from mdt_policy_tpu.models.masked_decoder import MaskedTransformerImgDecoder
from mdt_policy_tpu.models.mdt_transformer import MDTTransformer
from mdt_policy_tpu.models.resnet import BesoResNetEncoder

from .config import MDTVConfig
from .mdtv_agent import TrainState, make_optimizer as _make_optimizer_base

Batch = Dict[str, jax.Array]

import dataclasses


@dataclasses.dataclass(frozen=True)
class MDTConfig(MDTVConfig):
    """MDT production hyperparameters (conf/model/mdt_agent.yaml +
    conf/model/model/mdt_transformer.yaml): 512-d latent, 4/6 layers."""
    latent_dim: int = 512
    obs_dim: int = 512
    embed_dim: int = 512
    n_enc_layers: int = 4
    n_dec_layers: int = 6


class MDTAgentNet(nn.Module):
    """All MDT sub-networks under one module tree."""
    cfg: MDTConfig
    # MDT freezes only the CLIP goal towers; both ResNets train
    # (ref configure_optimizers puts static/gripper resnets in the optimizer)
    frozen_prefixes: Tuple[str, ...] = ("visual_goal", "language_goal")

    def setup(self):
        c = self.cfg
        from .mdtv_agent import make_visual_goal_tower, resolve_fused_attention
        fused_attn = resolve_fused_attention(c)
        scan_layers = bool(getattr(c, "scan_tower_layers", False))
        self.static_resnet = BesoResNetEncoder(latent_dim=c.latent_dim,
                                               name="static_resnet")
        self.gripper_resnet = BesoResNetEncoder(latent_dim=c.latent_dim,
                                                name="gripper_resnet")
        self.visual_goal = make_visual_goal_tower(c, fused_attn, scan_layers)
        self.language_goal = CLIPTextTower(
            embed_dim=c.clip_embed_dim, context_length=c.clip_context_length,
            vocab_size=c.clip_vocab_size, width=c.clip_text_width,
            heads=c.clip_text_heads, layers=c.clip_text_layers,
            fused_attention=fused_attn,
            scan_layers=scan_layers, name="language_goal")
        self.inner = MDTTransformer(
            obs_dim=c.obs_dim, goal_dim=c.goal_dim, action_dim=c.action_dim,
            embed_dim=c.embed_dim, n_enc_layers=c.n_enc_layers,
            n_dec_layers=c.n_dec_layers, n_heads=c.n_heads,
            goal_seq_len=c.goal_seq_len, obs_seq_len=c.obs_seq_len,
            action_seq_len=c.act_window_size, embed_pdrob=c.embed_pdrob,
            attn_pdrop=c.attn_pdrop, resid_pdrop=c.resid_pdrop,
            mlp_pdrop=c.mlp_pdrop, goal_drop=c.goal_drop,
            use_ada_conditioning=c.use_ada_conditioning,
            use_noise_encoder=c.use_noise_encoder,
            use_modality_encoder=c.use_modality_encoder,
            use_mlp_goal=c.use_mlp_goal,
            compute_dtype=(lambda d: None if d == jnp.float32 else d)(
                jnp.dtype(getattr(c, "denoiser_compute_dtype", "float32"))),
            name="inner")
        gen_dt = jnp.dtype(getattr(c, "gen_compute_dtype", "float32"))
        self.gen_img = MaskedTransformerImgDecoder(
            resolution=c.gen_img_res, patch_size=c.gen_patch_size,
            decoder_depth=c.gen_decoder_depth, decoder_embed_dim=c.gen_decoder_dim,
            decoder_n_heads=c.gen_decoder_heads, context_dim=c.latent_dim,
            mask_ratio=c.gen_mask_ratio,
            dtype=None if gen_dt == jnp.float32 else gen_dt, name="gen_img")
        # ref mdt_agent.py:112-117
        self.clip_proj = ClipStyleProjection(
            clip_style="single_token", token_dim=c.latent_dim,
            clip_token_index=1, num_token=3, name="clip_proj")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(math.log(1 / 0.07), jnp.float32))

    # ---- encoders ------------------------------------------------------------

    def embed_visual_obs(self, rgb_static, rgb_gripper):
        """Per-camera ResNet token (ref embed_visual_obs, mdt_agent.py:368-382).
        Inputs (B, T, H, W, 3) preprocessed."""
        B, T = rgb_static.shape[:2]
        flat_s = rgb_static.reshape((B * T,) + rgb_static.shape[2:])
        flat_g = rgb_gripper.reshape((B * T,) + rgb_gripper.shape[2:])
        static_tokens = self.static_resnet(flat_s).reshape(B, T, -1)
        gripper_tokens = self.gripper_resnet(flat_g).reshape(B, T, -1)
        return {"static": static_tokens, "gripper": gripper_tokens}

    def perceive(self, rgb_static, rgb_gripper):
        """Uniform perception entry across agent variants."""
        return self.embed_visual_obs(rgb_static, rgb_gripper)

    def _to_vit_size(self, x):
        s = self.cfg.img_size
        if x.shape[1] == s and x.shape[2] == s:
            return x
        return jax.image.resize(x, (x.shape[0], s, s, x.shape[3]),
                                method="linear", antialias=True)

    def encode_visual_goal(self, goal_image):
        cdt = jnp.dtype(self.cfg.compute_dtype)
        out = self.visual_goal(self._to_vit_size(goal_image).astype(cdt))
        return jax.lax.stop_gradient(out.astype(jnp.float32))

    def encode_language_goal(self, lang_tokens):
        out = self.language_goal(lang_tokens)
        return jax.lax.stop_gradient(out.astype(jnp.float32))

    def encode_context(self, perceptual_emb, latent_goal, sigma, *, modality,
                       train: bool = False):
        return self.inner.encode(perceptual_emb, latent_goal, sigma,
                                 modality=modality, train=train)

    def decode_actions(self, context, actions, sigma, *, train: bool = False):
        return self.inner.decode(context, actions, sigma, train=train)

    def gen_img_forward(self, context, goal_imgs):
        return self.gen_img(context, goal_imgs)

    def gen_img_loss(self, goal_imgs, recon, mask):
        return self.gen_img.compute_loss(goal_imgs, recon, mask)

    # ---- losses ---------------------------------------------------------------

    def __call__(self, batch: Batch, *, modality: str, train: bool = True):
        """Per-scope losses (ref MDTAgent.training_step, mdt_agent.py:202-278).
        Same loss structure as MDT-V."""
        c = self.cfg
        rgb_static_goal = batch["rgb_static"][:, -1]
        rgb_static = batch["rgb_static"][:, :-1]
        rgb_gripper = batch["rgb_gripper"][:, :-1]
        actions = batch["actions"]
        B = actions.shape[0]

        image_latent_goal = self.encode_visual_goal(rgb_static_goal)
        if modality == "lang":
            latent_goal = self.encode_language_goal(batch["lang_tokens"])
        else:
            latent_goal = image_latent_goal

        perceptual_emb = self.embed_visual_obs(rgb_static, rgb_gripper)
        if c.use_proprio and "state_obs" in batch:
            perceptual_emb = {**perceptual_emb,
                              "state_obs": batch["state_obs"].astype(jnp.float32)}

        density = make_sample_density(c.sigma_sample_density_type, c.sigma_data,
                                      c.sigma_min, c.sigma_max)
        sigmas = density(self.make_rng("sigma"), (B,))
        noise = jax.random.normal(self.make_rng("noise"), actions.shape, actions.dtype)

        c_skip, c_out, c_in = (append_dims(s, actions.ndim)
                               for s in get_scalings(sigmas, c.sigma_data))
        noised = actions + noise * append_dims(sigmas, actions.ndim)
        context = self.encode_context(perceptual_emb, latent_goal, sigmas,
                                      modality=modality, train=train)
        model_out = self.decode_actions(context, noised * c_in, sigmas, train=train)
        target = (actions - c_skip * noised) / c_out
        action_loss = jnp.mean(jnp.square(model_out - target))

        goal_imgs = jnp.stack([batch["gen_static"], batch["gen_gripper"]], axis=1)
        recon, mask, _, _ = self.gen_img(context, goal_imgs)
        img_gen_loss = self.gen_img.compute_loss(goal_imgs, recon, mask)

        if modality == "lang":
            # clip_extra_forward path IS modality-aware in MDT
            # (mdt_transformer.py:280-285); the main path above is not
            vis_context = self.inner.encode(
                perceptual_emb, image_latent_goal, sigmas, modality="lang",
                train=train, modality_embed=True)
            lang_embed = self.clip_proj(context)
            vis_embed = self.clip_proj(vis_context)
            cont_loss = self.clip_auxiliary_loss(vis_embed, lang_embed)
        else:
            cont_loss = jnp.zeros((), actions.dtype)

        total = action_loss + c.masked_beta * img_gen_loss + c.cont_alpha * cont_loss
        return {"action_loss": action_loss, "img_gen_loss": img_gen_loss,
                "cont_loss": cont_loss, "total_loss": total}

    def clip_auxiliary_loss(self, image_features, lang_features):
        """(ref mdt_agent.py:757-782) — identical formula to MDT-V."""
        img = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
        lang = lang_features / jnp.linalg.norm(lang_features, axis=-1, keepdims=True)
        logit_scale = jnp.exp(self.logit_scale)
        sim = logit_scale * img @ lang.T
        labels = jnp.arange(sim.shape[0])
        loss_i2t = optax.softmax_cross_entropy_with_integer_labels(sim, labels).mean()
        loss_t2i = optax.softmax_cross_entropy_with_integer_labels(sim.T, labels).mean()
        return (loss_i2t + loss_t2i) / 2


def make_optimizer(cfg: MDTConfig) -> optax.GradientTransformation:
    from mdt_policy_tpu.utils.schedulers import lr_schedule_from_cfg
    sched = lr_schedule_from_cfg(cfg)
    return optax.adamw(learning_rate=sched, b1=cfg.optimizer.betas[0],
                       b2=cfg.optimizer.betas[1],
                       weight_decay=cfg.optimizer.transformer_weight_decay)


def init_agent(cfg: MDTConfig, rng: jax.Array, example_batch: Batch
               ) -> Tuple[MDTAgentNet, TrainState]:
    from .mdtv_agent import split_params
    net = MDTAgentNet(cfg)
    init_rngs = dict(zip(
        ("params", "dropout", "sigma", "noise", "mask", "goal_mask"),
        jax.random.split(rng, 6)))
    init_fn = jax.jit(partial(net.init, modality="lang", train=True))
    variables = init_fn(init_rngs, example_batch)
    params = variables["params"]
    cdt = jnp.dtype(cfg.compute_dtype)
    if cdt != jnp.float32:
        for k in net.frozen_prefixes:
            if k in params:
                params[k] = jax.tree.map(lambda x: x.astype(cdt), params[k])
    tx = make_optimizer(cfg)
    trainable, _ = split_params(params, net.frozen_prefixes)
    return net, TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(trainable),
                           ema_params=jax.tree.map(jnp.copy, params), tx=tx)
