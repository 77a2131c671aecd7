"""MDT-V agent: network bundle, losses, jitted train/val steps, and the
action-chunked inference protocol.

Functional re-design of the reference `MDTVAgent` LightningModule
(`mdt/models/mdtv_agent.py:44-824`):

* all sub-networks live in ONE flax module so the whole train step — frozen
  encoders included — compiles into a single XLA program (the SURVEY §6
  north-star);
* `training_step`'s dict-of-modalities loop (ref :222-298) becomes a static
  Python unroll over ('vis', 'lang') inside one jitted `train_step`;
* the contrastive loss computes InfoNCE over the *global* batch; under a
  sharded `jit` XLA inserts the all-gather over the data axis automatically —
  the TPU equivalent of `self.all_gather(sync_grads=True)` (ref :458-465);
* frozen towers (Voltron ViT, CLIP vision/text) get `stop_gradient` on their
  outputs + an optax mask, mirroring the reference's `requires_grad=False` /
  optimizer-group membership (ref voltron_encoder.py:85-87, :164-199);
* EMA is part of TrainState and updates inside the jitted step (ref EMA
  callback, mdt/callbacks/ema.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import flax.struct
import optax

from mdt_policy_tpu.diffusion import (
    get_noise_schedule,
    make_sample_density,
)
from mdt_policy_tpu.diffusion.precond import append_dims, get_scalings, precond_denoise
from mdt_policy_tpu.diffusion.samplers import sample_loop
from mdt_policy_tpu.models.blocks import ClipStyleProjection
from mdt_policy_tpu.models.clip import CLIPTextTower, CLIPVisionTower
from mdt_policy_tpu.models.masked_decoder import MaskedTransformerImgDecoder
from mdt_policy_tpu.models.mdtv_transformer import MDTVTransformer
from mdt_policy_tpu.models.perceiver import PerceiverResampler
from mdt_policy_tpu.models.voltron_vit import VoltronViT
from mdt_policy_tpu.utils.ema import ema_decay, ema_update
from mdt_policy_tpu.utils.schedulers import lr_schedule_from_cfg

from .config import MDTVConfig

Batch = Dict[str, jax.Array]

# param-tree prefixes that stay frozen (ref: only inner model, perceiver,
# gen_img, img_encoder, clip_proj, logit_scale enter the optimizer —
# mdtv_agent.py:164-199 — and the Voltron tower is itself frozen)
FROZEN_PREFIXES = ("visual_goal", "language_goal", "img_encoder")


def resolve_fused_attention(cfg) -> bool:
    """Resolve the fused_tower_attention tri-state ("auto"/True/False).

    Auto enables the Pallas kernel on TPU backends only — on CPU (tests,
    virtual meshes) the XLA einsum path runs instead; both paths compute
    identical math (ops/fused_qkv_attention.py `_reference`)."""
    flag = getattr(cfg, "fused_tower_attention", "auto")
    if flag == "auto":
        import jax
        return jax.default_backend() == "tpu"
    return bool(flag)


def make_visual_goal_tower(c, fused_attn: bool, scan_layers: bool,
                           name: str = "visual_goal"):
    """Goal image tower per cfg.clip_vision_family: the ViT family
    (production ViT-B/16) or CLIP's ModifiedResNet (the reference
    VisionClip default, model_name='RN50' — vision_clip.py:10). The RN
    tower is a conv net: fused_attention/scan_layers do not apply."""
    from mdt_policy_tpu.models.clip import CLIPResNetTower
    if getattr(c, "clip_vision_family", "vit") == "resnet":
        return CLIPResNetTower(
            embed_dim=c.clip_embed_dim, layers=tuple(c.clip_rn_layers),
            width=c.clip_rn_width, image_resolution=c.img_size, name=name)
    return CLIPVisionTower(
        embed_dim=c.clip_embed_dim, image_resolution=c.img_size,
        layers=c.clip_vision_layers, width=c.clip_vision_width,
        patch_size=c.clip_vision_patch, fused_attention=fused_attn,
        scan_layers=scan_layers, name=name)


def split_params(params, frozen_prefixes=FROZEN_PREFIXES):
    """Partition the param tree into (trainable, frozen) top-level subtrees.

    Grads are taken w.r.t. the trainable subtree ONLY: the frozen towers are
    closed over as constants, so no zero-gradient trees are materialized and
    the optimizer/EMA touch ~30M instead of ~150M params per step."""
    trainable = {k: v for k, v in params.items() if k not in frozen_prefixes}
    frozen = {k: v for k, v in params.items() if k in frozen_prefixes}
    return trainable, frozen


class MDTVAgentNet(nn.Module):
    """All MDT-V sub-networks under one module tree."""
    cfg: MDTVConfig
    frozen_prefixes: Tuple[str, ...] = FROZEN_PREFIXES

    def setup(self):
        c = self.cfg
        fused_attn = resolve_fused_attention(c)
        scan_layers = bool(getattr(c, "scan_tower_layers", False))
        self.img_encoder = VoltronViT(
            patch_size=c.vit_patch, embed_dim=c.perceiver_dim, depth=c.vit_depth,
            n_heads=c.vit_heads, img_size=c.img_size,
            fused_attention=fused_attn,
            scan_layers=scan_layers,
            blocks_2d=bool(getattr(c, "voltron_blocks_2d", False)),
            name="img_encoder")
        # remat: the perceiver's K/V activations over the 392-token voltron
        # grid dominate backward memory at production batch; recompute-in-
        # backward trades a cheap re-forward for ~GBs of residuals
        perceiver_cls = nn.remat(PerceiverResampler) if c.remat_perceiver \
            else PerceiverResampler
        self.perceiver = perceiver_cls(
            dim=c.perceiver_dim, depth=c.perceiver_depth, dim_head=c.perceiver_dim_head,
            heads=c.perceiver_heads, num_latents=c.num_latents,
            num_time_embeds=c.perceiver_num_time_embeds,
            dtype=jnp.dtype(c.compute_dtype),
            factored=bool(getattr(c, "perceiver_factored_kv", False)),
            name="perceiver")
        self.visual_goal = make_visual_goal_tower(c, fused_attn, scan_layers)
        self.language_goal = CLIPTextTower(
            embed_dim=c.clip_embed_dim, context_length=c.clip_context_length,
            vocab_size=c.clip_vocab_size, width=c.clip_text_width,
            heads=c.clip_text_heads, layers=c.clip_text_layers,
            fused_attention=fused_attn,
            scan_layers=scan_layers, name="language_goal")
        den_dt = jnp.dtype(getattr(c, "denoiser_compute_dtype", "float32"))
        self.inner = MDTVTransformer(
            obs_dim=c.obs_dim, goal_dim=c.goal_dim, action_dim=c.action_dim,
            proprio_dim=c.proprio_dim, embed_dim=c.embed_dim,
            n_enc_layers=c.n_enc_layers, n_dec_layers=c.n_dec_layers,
            n_heads=c.n_heads, goal_seq_len=c.goal_seq_len, obs_seq_len=c.obs_seq_len,
            n_obs_token=c.num_latents, action_seq_len=c.act_window_size,
            embed_pdrob=c.embed_pdrob, attn_pdrop=c.attn_pdrop,
            resid_pdrop=c.resid_pdrop, mlp_pdrop=c.mlp_pdrop, goal_drop=c.goal_drop,
            use_ada_conditioning=c.use_ada_conditioning,
            use_noise_encoder=c.use_noise_encoder,
            use_modality_encoder=c.use_modality_encoder,
            use_mlp_goal=c.use_mlp_goal,
            compute_dtype=None if den_dt == jnp.float32 else den_dt,
            name="inner")
        gen_dt = jnp.dtype(getattr(c, "gen_compute_dtype", "float32"))
        self.gen_img = MaskedTransformerImgDecoder(
            resolution=c.gen_img_res, patch_size=c.gen_patch_size,
            decoder_depth=c.gen_decoder_depth, decoder_embed_dim=c.gen_decoder_dim,
            decoder_n_heads=c.gen_decoder_heads, context_dim=c.latent_dim,
            mask_ratio=c.gen_mask_ratio,
            dtype=None if gen_dt == jnp.float32 else gen_dt, name="gen_img")
        # clip_proj: style 'map', token_dim=latent_dim, index 1, 4 tokens
        # (ref mdtv_agent.py:133-138)
        self.clip_proj = ClipStyleProjection(
            clip_style="map", token_dim=c.latent_dim, clip_token_index=1,
            num_token=4, name="clip_proj")
        # learnable temperature, init log(1/0.07) (ref :140)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(math.log(1 / 0.07), jnp.float32))

    # ---- encoders ------------------------------------------------------------

    def _to_vit_size(self, x):
        """Resize to the ViT input size — the reference's in-encoder
        `self.preprocess` (voltron_encoder.py:99); gripper frames arrive at
        84px from the data pipeline."""
        s = self.cfg.img_size
        if x.shape[1] == s and x.shape[2] == s:
            return x
        return jax.image.resize(x, (x.shape[0], s, s, x.shape[3]),
                                method="linear", antialias=True)

    def voltron_camera_tokens(self, rgb_static, rgb_gripper):
        """Frozen Voltron tokens for a 2-camera frame pair: (B*, 2N, D) in
        compute dtype, stop_gradient'd when frozen. Inputs (B*, H, W, 3),
        already CLIP-normalized. This is the frozen boundary the offline
        embedding extractor (data/extract_embeddings.py) caches."""
        cdt = jnp.dtype(self.cfg.compute_dtype)
        flat_s = self._to_vit_size(rgb_static)
        flat_g = self._to_vit_size(rgb_gripper)
        # tokens STAY in compute dtype into the perceiver (bf16 halves the
        # 392-token grid residency — the round-1 B=1024 OOM hog); the
        # perceiver computes in compute_dtype and returns float32 latents
        if self.cfg.fuse_camera_batch:
            # one ViT call over [static; gripper] — same weights per-sample,
            # half the kernel launches, 2x the per-matmul batch
            both = self.img_encoder(
                jnp.concatenate([flat_s, flat_g], axis=0).astype(cdt))
            static_tokens, gripper_tokens = jnp.split(both, 2, axis=0)
        else:
            static_tokens = self.img_encoder(flat_s.astype(cdt))
            gripper_tokens = self.img_encoder(flat_g.astype(cdt))
        if self.cfg.freeze_img_encoder:
            static_tokens = jax.lax.stop_gradient(static_tokens)
            gripper_tokens = jax.lax.stop_gradient(gripper_tokens)
        return jnp.concatenate([static_tokens, gripper_tokens], axis=1)

    def compute_voltron_embeddings(self, rgb_static, rgb_gripper):
        """2-camera frozen ViT tokens -> perceiver latents
        (ref mdtv_agent.py:392-403). Inputs (B, T, H, W, 3), already
        CLIP-normalized by the on-device preprocessing stage."""
        B, T = rgb_static.shape[:2]
        tokens = self.voltron_camera_tokens(
            rgb_static.reshape((B * T,) + rgb_static.shape[2:]),
            rgb_gripper.reshape((B * T,) + rgb_gripper.shape[2:]))[:, None]
        return {"state_images": self.perceiver(tokens)}

    def perceive(self, rgb_static, rgb_gripper):
        """Uniform perception entry across agent variants (MDT-V: voltron +
        perceiver; MDT: per-camera ResNets)."""
        return self.compute_voltron_embeddings(rgb_static, rgb_gripper)

    def perceive_tokens(self, voltron_tokens):
        """Perceiver latents from cached frozen Voltron tokens — the
        precomputed-embedding entry (data/extract_embeddings.py). Accepts
        (B, 2N, D) per-frame rows or the (B, 1, 2N, D) perceiver layout."""
        vt = voltron_tokens[:, None] if voltron_tokens.ndim == 3 \
            else voltron_tokens
        return {"state_images": self.perceiver(
            vt.astype(jnp.dtype(self.cfg.compute_dtype)))}

    def encode_visual_goal(self, goal_image):
        """Frozen CLIP ViT-B/16 image embed (ref vision_clip.py:33-47);
        input already CLIP-normalized."""
        cdt = jnp.dtype(self.cfg.compute_dtype)
        out = self.visual_goal(self._to_vit_size(goal_image).astype(cdt))
        return jax.lax.stop_gradient(out.astype(jnp.float32))

    def encode_language_goal(self, lang_tokens):
        """Frozen CLIP text embed (ref clip_lang_encoder.py:24-28)."""
        out = self.language_goal(lang_tokens)
        return jax.lax.stop_gradient(out.astype(jnp.float32))

    # ---- score-model wrappers --------------------------------------------------

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

    # ---- losses (one modality scope) ------------------------------------------

    def __call__(self, batch: Batch, *, modality: str, train: bool = True):
        """Per-scope losses (ref training_step body, mdtv_agent.py:246-288).

        batch keys: rgb_static/rgb_gripper (B, T+1, H, W, 3) — last frame is
        the goal frame; gen_static/gen_gripper (B, h, w, 3); actions (B, W, A);
        lang_tokens (B, 77) (used when modality == 'lang'). A batch carrying
        voltron_tokens/image_latent_goal instead of camera frames is an
        offline-embedding-cache batch (data/extract_embeddings.py).
        Returns dict(action_loss, img_gen_loss, cont_loss, total_loss).
        """
        c = self.cfg
        actions = batch["actions"]
        B = actions.shape[0]

        towers = None
        if "voltron_tokens" in batch and "image_latent_goal" in batch:
            # precomputed frozen-tower batch keys (the offline embedding
            # cache, data/extract_embeddings.py — the reference's
            # extract_by_key idiom applied to the frozen towers): the camera
            # ViTs never run; constants of the loss, like the in-program
            # stop_gradient'd towers
            towers = {
                "voltron_tokens": batch["voltron_tokens"],
                "image_latent_goal":
                    batch["image_latent_goal"].astype(jnp.float32),
            }
            if modality == "lang":
                # cached text-goal embeddings (extract_lang_goals) when the
                # loader provides them — then NO tower runs in this step;
                # otherwise the (frozen) text tower encodes in-program
                towers["lang_latent_goal"] = (
                    batch["lang_latent_goal"].astype(jnp.float32)
                    if "lang_latent_goal" in batch
                    else self.encode_language_goal(batch["lang_tokens"]))

        if towers is not None:
            image_latent_goal = towers["image_latent_goal"]
            latent_goal = towers["lang_latent_goal"] if modality == "lang" \
                else image_latent_goal
            perceptual_emb = self.perceive_tokens(towers["voltron_tokens"])
        else:
            image_latent_goal = self.encode_visual_goal(batch["rgb_static"][:, -1])
            if modality == "lang":
                latent_goal = self.encode_language_goal(batch["lang_tokens"])
            else:
                latent_goal = image_latent_goal
            perceptual_emb = self.compute_voltron_embeddings(
                batch["rgb_static"][:, :-1], batch["rgb_gripper"][:, :-1])
        if c.use_proprio and "state_obs" in batch:
            # processed 8-d proprio (data/proprio.py) -> proprio_emb token
            perceptual_emb = {**perceptual_emb,
                              "state_obs": batch["state_obs"].astype(jnp.float32)}

        # --- diffusion loss (ref diffusion_loss :508-521 + GCDenoiser.loss) ---
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

        # --- masked generative foresight loss (ref :259-269, 411-438) ---
        goal_imgs = jnp.stack([batch["gen_static"], batch["gen_gripper"]], axis=1)
        recon, mask, _, _ = self.gen_img(context, goal_imgs)
        img_gen_loss = self.gen_img.compute_loss(goal_imgs, recon, mask)

        # --- contrastive latent alignment (lang scope only, ref :440-484) ---
        if modality == "lang":
            vis_context = self.encode_context(perceptual_emb, image_latent_goal,
                                              sigmas, modality="lang", train=train)
            lang_embed = self.clip_proj(context)
            vis_embed = self.clip_proj(vis_context)
            cont_loss = self.clip_auxiliary_loss(vis_embed, lang_embed)
        else:
            cont_loss = jnp.zeros((), actions.dtype)

        total = action_loss + c.masked_beta * img_gen_loss + c.cont_alpha * cont_loss
        return {
            "action_loss": action_loss,
            "img_gen_loss": img_gen_loss,
            "cont_loss": cont_loss,
            "total_loss": total,
        }

    def clip_auxiliary_loss(self, image_features, lang_features):
        """Symmetric InfoNCE (ref clip_auxiliary_loss, mdtv_agent.py:774-799).
        Under a data-sharded jit this computes over the GLOBAL batch — XLA
        all-gathers across the mesh, the `use_distributed_clip` equivalent."""
        img = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
        lang = lang_features / jnp.linalg.norm(lang_features, axis=-1, keepdims=True)
        logit_scale = jnp.exp(self.logit_scale)
        sim = logit_scale * img @ lang.T
        labels = jnp.arange(sim.shape[0])
        loss_i2t = optax.softmax_cross_entropy_with_integer_labels(sim, labels).mean()
        loss_t2i = optax.softmax_cross_entropy_with_integer_labels(sim.T, labels).mean()
        return (loss_i2t + loss_t2i) / 2


# ---------------------------------------------------------------------------
# Train state + steps
# ---------------------------------------------------------------------------

class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def make_optimizer(cfg: MDTVConfig) -> optax.GradientTransformation:
    """AdamW(lr=1e-4, betas=(0.9,0.9), wd=0.05) with tri-stage cosine schedule
    (ref configure_optimizers, mdtv_agent.py:164-199). Applied to the
    TRAINABLE subtree only (frozen towers never enter the optimizer — exactly
    the reference's optimizer-group membership)."""
    sched = lr_schedule_from_cfg(cfg)
    return optax.adamw(
        learning_rate=sched,
        b1=cfg.optimizer.betas[0], b2=cfg.optimizer.betas[1],
        weight_decay=cfg.optimizer.transformer_weight_decay,
    )


def init_agent(cfg: MDTVConfig, rng: jax.Array, example_batch: Batch) -> Tuple[MDTVAgentNet, TrainState]:
    net = MDTVAgentNet(cfg)
    init_rngs = dict(zip(
        ("params", "dropout", "sigma", "noise", "mask", "goal_mask"),
        jax.random.split(rng, 6)))
    # init must touch EVERY submodule — a precomputed-embedding batch
    # (voltron_tokens/image_latent_goal keys) would skip the frozen camera
    # towers and leave their params uninitialized, breaking checkpoint
    # layout and eval restore; init through the full rgb path instead
    # (dummy frames if the loader emits none), precomputed keys stripped
    example_batch = {k: v for k, v in example_batch.items()
                     if k not in ("voltron_tokens", "image_latent_goal",
                                  "lang_latent_goal")}
    if "rgb_static" not in example_batch:
        B = example_batch["actions"].shape[0]
        s = cfg.img_size
        example_batch["rgb_static"] = jnp.zeros((B, 2, s, s, 3), jnp.float32)
        example_batch["rgb_gripper"] = jnp.zeros((B, 2, 84, 84, 3), jnp.float32)
    # jitted init: eager op-by-op dispatch of a full init is ~100x slower
    init_fn = jax.jit(partial(net.init, modality="lang", train=True))
    variables = init_fn(init_rngs, example_batch)
    params = variables["params"]
    # frozen towers are inference-only: store them in the compute dtype
    # (bf16 halves their HBM traffic and doubles MXU rate; trainables stay f32)
    cdt = jnp.dtype(cfg.compute_dtype)
    if cdt != jnp.float32:
        for k in net.frozen_prefixes:
            if k in params:
                params[k] = jax.tree.map(lambda x: x.astype(cdt), params[k])
    tx = make_optimizer(cfg)
    trainable, _ = split_params(params, net.frozen_prefixes)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(trainable),
        ema_params=jax.tree.map(jnp.copy, params),
        tx=tx,
    )
    return net, state


def train_step(net, state: TrainState, batch: Dict[str, Batch],
               rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimizer step over the dual-modality batch
    (ref training_step, mdtv_agent.py:222-298). jit with
    `jax.jit(partial(train_step, net), donate_argnums=(0,))`.

    Gradients are taken w.r.t. the trainable subtree only; frozen towers are
    constants of the loss (no zero-grad materialization, ~5x less
    optimizer/EMA HBM traffic)."""
    scopes = tuple(sorted(batch.keys()))
    trainable, frozen = split_params(state.params, net.frozen_prefixes)

    def loss_fn(trainable_params):
        params = {**trainable_params, **frozen}
        metrics = {}
        total = 0.0
        for i, scope in enumerate(scopes):
            rngs = dict(zip(("dropout", "sigma", "noise", "mask", "goal_mask"),
                            jax.random.split(jax.random.fold_in(rng, i), 5)))
            out = net.apply({"params": params}, batch[scope], modality=scope,
                            train=True, rngs=rngs)
            total = total + out["total_loss"]
            for k, v in out.items():
                metrics[f"{scope}/{k}"] = v
        total = total / len(scopes)
        metrics["train/total_loss"] = total
        return total, metrics

    grads, metrics = jax.grad(loss_fn, has_aux=True)(trainable)
    updates, new_opt_state = state.tx.update(grads, state.opt_state, trainable)
    new_trainable = optax.apply_updates(trainable, updates)
    # observability scalars of the reference (mdt_agent.py:181-192 grad/param
    # norms over the optimized params; LearningRateMonitor) — computed inside
    # the compiled step, so they cost two reductions, no extra host syncs
    metrics["train/grad_norm"] = optax.global_norm(grads)
    metrics["train/param_norm"] = optax.global_norm(new_trainable)
    metrics["train/lr"] = lr_schedule_from_cfg(net.cfg)(state.step)
    new_params = {**new_trainable, **frozen}
    # reference EMA sees the POST-increment global step (ema.py:131-142);
    # EMA over trainables only — frozen towers never move, their EMA is
    # themselves (the reference EMAs the whole state_dict; identical values)
    decay = ema_decay(state.step + 1)
    ema_trainable, _ = split_params(state.ema_params, net.frozen_prefixes)
    new_ema = {**ema_update(ema_trainable, new_trainable, decay), **frozen}
    metrics["train/ema_rate"] = decay
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt_state, ema_params=new_ema), metrics


# ---------------------------------------------------------------------------
# Inference: denoise_actions with hoisted encoder context
# ---------------------------------------------------------------------------

def denoise_actions(
    net: MDTVAgentNet,
    params,
    perceptual_emb: Dict[str, jax.Array],
    latent_goal: jax.Array,
    rng: jax.Array,
    *,
    modality: str = "lang",
    sampler_type: Optional[str] = None,
    num_sampling_steps: Optional[int] = None,
    sigma_min: Optional[float] = None,
    sigma_max: Optional[float] = None,
    noise_scheduler: Optional[str] = None,
    return_context: bool = False,
):
    """Sample an action chunk (ref denoise_actions, mdtv_agent.py:523-550).

    The encoder runs ONCE; the sampler scan closes over the context — unlike
    the reference, which re-encodes every step (SURVEY §3.2).
    """
    cfg = net.cfg
    sampler_type = sampler_type or cfg.sampler_type
    n_steps = num_sampling_steps or cfg.num_sampling_steps
    smin = sigma_min if sigma_min is not None else cfg.sigma_min
    smax = sigma_max if sigma_max is not None else cfg.sigma_max
    scheduler = noise_scheduler or cfg.noise_scheduler

    sigmas = np.asarray(get_noise_schedule(n_steps, scheduler, smin, smax))
    if latent_goal.ndim == 2:
        latent_goal = latent_goal[:, None, :]
    B = latent_goal.shape[0]

    def encode(sigma_b):
        return net.apply({"params": params}, perceptual_emb, latent_goal,
                         sigma_b, modality=modality, train=False,
                         method="encode_context")

    # With AdaLN conditioning (production default) the encoder never consumes
    # sigma, so the context is hoisted out of the sampling loop — unlike the
    # reference, which re-encodes every step (SURVEY §3.2). When the encoder
    # DOES see sigma (sigma-token or noise-encoder configs), re-encode per
    # step for exactness.
    hoist_context = cfg.use_ada_conditioning and not cfg.use_noise_encoder
    context = encode(jnp.full((B,), float(sigmas[0]))) if hoist_context else None

    def denoise_fn(x, sigma):
        sigma_b = jnp.broadcast_to(jnp.asarray(sigma, x.dtype), (B,))
        ctx = context if hoist_context else encode(sigma_b)
        inner = lambda xin, s: net.apply({"params": params}, ctx, xin, s,
                                         train=False, method="decode_actions")
        return precond_denoise(inner, x, sigma_b, cfg.sigma_data)

    k_init, k_samp = jax.random.split(rng)
    x = jax.random.normal(k_init, (B, cfg.act_window_size, cfg.action_dim)) * smax
    actions = sample_loop(sampler_type, denoise_fn, x, sigmas, key=k_samp)
    if return_context:
        if context is None:
            context = encode(jnp.full((B,), float(sigmas[0])))
        return actions, context
    return actions


def reconstruction_forward(net, params, b: Batch, rng: jax.Array, *,
                           modality: str = "lang"):
    """Masked-foresight reconstruction for visualization (the reference's
    `store_img` validation branch, mdt/models/mdt_agent.py:398-417): encode
    the scene context once at sigma_max (the sampler's hoisted-context
    sigma), run the generative decoder, return (goal_imgs, recon, mask) for
    models/masked_decoder.reconstruct_images. Works for both agent variants
    and for precomputed-embedding batches. jit with
    `jax.jit(partial(reconstruction_forward, net))`."""
    cfg = net.cfg
    if "voltron_tokens" in b and "image_latent_goal" in b:
        emb = net.apply({"params": params}, b["voltron_tokens"],
                        method="perceive_tokens")
        image_goal = jnp.asarray(b["image_latent_goal"], jnp.float32)
    else:
        emb = net.apply({"params": params}, b["rgb_static"][:, :-1],
                        b["rgb_gripper"][:, :-1], method="perceive")
        image_goal = net.apply({"params": params}, b["rgb_static"][:, -1],
                               method="encode_visual_goal")
    if modality == "lang" and "lang_tokens" in b:
        goal = net.apply({"params": params}, b["lang_tokens"],
                         method="encode_language_goal")
    else:
        goal = image_goal
    if goal.ndim == 2:
        goal = goal[:, None]
    sigma = jnp.full((goal.shape[0],), cfg.sigma_max)
    context = net.apply({"params": params}, emb, goal, sigma,
                        modality=modality, train=False,
                        method="encode_context")
    goal_imgs = jnp.stack([b["gen_static"], b["gen_gripper"]], axis=1)
    recon, mask, _, _ = net.apply({"params": params}, context, goal_imgs,
                                  rngs={"mask": rng}, method="gen_img_forward")
    return goal_imgs, recon, mask


def validation_step(net: MDTVAgentNet, params, batch: Dict[str, Batch],
                    rng: jax.Array) -> Dict[str, jax.Array]:
    """Validation metrics (ref validation_step, mdtv_agent.py:300-357): full
    10-step sampling + MSE vs ground-truth actions + masked-foresight loss,
    per modality. jit with `jax.jit(partial(validation_step, net))`."""
    cfg = net.cfg
    metrics: Dict[str, jax.Array] = {}
    total = 0.0
    for i, scope in enumerate(sorted(batch.keys())):
        b = batch[scope]
        if "voltron_tokens" in b and "image_latent_goal" in b:
            # precomputed frozen-tower batches (data/extract_embeddings.py):
            # frozen towers never change during training, so the cached
            # outputs are exact for validation too
            emb = net.apply({"params": params}, b["voltron_tokens"],
                            method="perceive_tokens")
            image_goal = jnp.asarray(b["image_latent_goal"], jnp.float32)
        else:
            emb = net.apply({"params": params}, b["rgb_static"][:, :-1],
                            b["rgb_gripper"][:, :-1], method="perceive")
            image_goal = net.apply({"params": params}, b["rgb_static"][:, -1],
                                   method="encode_visual_goal")
        if scope == "lang":
            goal = jnp.asarray(b["lang_latent_goal"], jnp.float32) \
                if "lang_latent_goal" in b else \
                net.apply({"params": params}, b["lang_tokens"],
                          method="encode_language_goal")
        else:
            goal = image_goal
        pred, context = denoise_actions(
            net, params, emb, goal, jax.random.fold_in(rng, i),
            modality=scope, return_context=True)
        pred_loss = jnp.mean(jnp.square(pred - b["actions"]))
        goal_imgs = jnp.stack([b["gen_static"], b["gen_gripper"]], axis=1)
        recon, mask, _, _ = net.apply(
            {"params": params}, context, goal_imgs,
            rngs={"mask": jax.random.fold_in(rng, 100 + i)}, method="gen_img_forward")
        img_loss = net.apply({"params": params}, goal_imgs, recon, mask,
                             method="gen_img_loss")
        metrics[f"val_act/{scope}_act_loss_pp"] = pred_loss
        metrics[f"val_act/{scope}_img_gen_loss"] = img_loss
        total = total + pred_loss
    metrics["val_act/action_loss"] = total / len(batch)
    return metrics


class MDTVPolicy:
    """Stateful rollout wrapper implementing the reference inference protocol
    `reset() / step(obs, goal)` with action chunking (ref mdtv_agent.py:680-746).
    Works for BOTH agent variants through the uniform `perceive` entry
    (MDTPolicy in agents/__init__ is an alias).

    The full pipeline (goal encode -> voltron -> perceiver -> encoder ->
    10-step sampler scan) is one jitted function, compiled once; re-planning
    happens every `multistep` env steps, cached chunk replayed otherwise.
    """

    def __init__(self, net: MDTVAgentNet, params, rng: Optional[jax.Array] = None,
                 **sampler_overrides):
        self.net = net
        self.params = params
        self.cfg = net.cfg
        if self.cfg.multistep > self.cfg.act_window_size:
            # a larger re-plan period would silently replay the last chunk
            # action (JAX clamps out-of-bounds indices)
            raise ValueError(
                f"multistep={self.cfg.multistep} exceeds "
                f"act_window_size={self.cfg.act_window_size}")
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.rollout_step_counter = 0
        self.pred_action_seq = None
        # lang-goal cache: within a subtask the instruction does not change,
        # so the CLIP text tower runs ONCE per goal and every later replan
        # takes the _predict_emb path (round-4 VERDICT #3b; the reference
        # re-encodes the unchanged text every replan, mdtv_agent.py:693-698)
        self._goal_tokens = None
        self._goal_emb = None
        self._encode_lang = jax.jit(
            lambda params, toks: self.net.apply(
                {"params": params}, toks, method="encode_language_goal"))
        self._predict_emb = jax.jit(partial(self._predict_emb_impl,
                                            **sampler_overrides))
        self._predict_vis = jax.jit(partial(self._predict_vis_impl,
                                            **sampler_overrides))

    def _predict_emb_impl(self, params, rgb_static, rgb_gripper, lang_emb, rng,
                          **overrides):
        """Language-goal-embedding replan: the latent goal arrives already
        encoded — either a stored embedding (the reference's
        use_text_not_embedding=False branch, mdtv_agent.py:693-698) or this
        policy's own per-subtask text-tower cache. The CLIP text tower never
        runs in this program."""
        emb = self.net.apply({"params": params}, rgb_static, rgb_gripper,
                             method="perceive")
        return denoise_actions(self.net, params, emb, lang_emb, rng,
                               modality="lang", **overrides)

    def _predict_vis_impl(self, params, rgb_static, rgb_gripper, goal_image,
                          rng, **overrides):
        """Goal-image conditioning (the reference Rollout callback's 'vis'
        modality, rollout.py:324-330: goal = the demo's last static frame,
        embedded by the frozen CLIP image tower)."""
        emb = self.net.apply({"params": params}, rgb_static, rgb_gripper,
                             method="perceive")
        latent_goal = self.net.apply({"params": params}, goal_image,
                                     method="encode_visual_goal")
        return denoise_actions(self.net, params, emb, latent_goal, rng,
                               modality="vis", **overrides)

    def reset(self):
        self.rollout_step_counter = 0
        self.pred_action_seq = None
        self._goal_tokens = None
        self._goal_emb = None

    def step(self, obs: Dict[str, jax.Array], goal: Dict[str, jax.Array]):
        """obs: {'rgb_static': (B,T,H,W,3), 'rgb_gripper': ...};
        goal: {'lang_tokens': (B,77)}, {'lang': (B,512) precomputed emb} or
        {'rgb_static_goal': (B,H,W,3) preprocessed goal image}.
        Returns the current 7-DoF action."""
        if self.rollout_step_counter % self.cfg.multistep == 0:
            self.rng, k = jax.random.split(self.rng)
            if "lang_tokens" in goal:
                toks = np.asarray(goal["lang_tokens"])
                if self._goal_tokens is None or \
                        not np.array_equal(toks, self._goal_tokens):
                    self._goal_tokens = toks
                    self._goal_emb = self._encode_lang(self.params, toks)
                self.pred_action_seq = self._predict_emb(
                    self.params, obs["rgb_static"], obs["rgb_gripper"],
                    self._goal_emb, k)
            elif "rgb_static_goal" in goal:
                g = jnp.asarray(goal["rgb_static_goal"])
                if g.ndim == 3:  # unbatched (H,W,3) goal frame
                    g = g[None]
                self.pred_action_seq = self._predict_vis(
                    self.params, obs["rgb_static"], obs["rgb_gripper"], g, k)
            else:
                lang = jnp.atleast_2d(jnp.asarray(goal["lang"]))
                self.pred_action_seq = self._predict_emb(
                    self.params, obs["rgb_static"], obs["rgb_gripper"], lang, k)
        action = self.pred_action_seq[:, self.rollout_step_counter % self.cfg.multistep]
        self.rollout_step_counter += 1
        if self.rollout_step_counter == self.cfg.multistep:
            self.rollout_step_counter = 0
        return action
