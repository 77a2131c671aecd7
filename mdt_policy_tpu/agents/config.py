"""Agent configuration.

Mirrors the reference Hydra config surface (conf/model/mdtv_agent.yaml,
conf/model/model/mdtv_transformer.yaml, conf/config.yaml) as frozen
dataclasses so a config is a static, hashable jit constant.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """(ref conf/model/mdt_agent.yaml optimizer block)"""
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.9)
    transformer_weight_decay: float = 0.05
    obs_encoder_weight_decay: float = 0.05

    def __post_init__(self):
        # YAML delivers tuples as lists; configs must stay hashable (they
        # are static jit constants)
        object.__setattr__(self, "betas", tuple(self.betas))


@dataclasses.dataclass(frozen=True)
class LRSchedulerConfig:
    """(ref conf/model/mdt_agent.yaml lr_scheduler block)"""
    init_lr: float = 1e-4
    init_lr_scale: float = 0.1
    final_lr_scale: float = 1e-6
    total_steps: int = 50_000
    phase_ratio: Tuple[float, float, float] = (0.02, 0.08, 0.9)

    def __post_init__(self):
        object.__setattr__(self, "phase_ratio", tuple(self.phase_ratio))


@dataclasses.dataclass(frozen=True)
class MDTVConfig:
    """MDT-V agent hyperparameters (ref conf/model/mdtv_agent.yaml +
    conf/model/model/mdtv_transformer.yaml + conf/config.yaml globals)."""
    # diffusion
    latent_dim: int = 384
    multistep: int = 10
    sampler_type: str = "ddim"
    num_sampling_steps: int = 10
    sigma_data: float = 0.5
    sigma_min: float = 0.001
    sigma_max: float = 80.0
    noise_scheduler: str = "exponential"
    sigma_sample_density_type: str = "loglogistic"
    act_window_size: int = 10
    action_dim: int = 7
    # aux losses
    cont_alpha: float = 1.0
    masked_beta: float = 1.0
    use_distributed_clip: bool = True
    use_text_not_embedding: bool = True
    # denoiser transformer (conf/model/model/mdtv_transformer.yaml)
    obs_dim: int = 384
    goal_dim: int = 512
    proprio_dim: int = 8
    embed_dim: int = 384
    n_enc_layers: int = 4
    n_dec_layers: int = 4
    n_heads: int = 8
    n_obs_token: int = 3
    goal_seq_len: int = 1
    obs_seq_len: int = 1
    attn_pdrop: float = 0.3
    resid_pdrop: float = 0.1
    mlp_pdrop: float = 0.05
    embed_pdrob: float = 0.0
    goal_drop: float = 0.0
    use_ada_conditioning: bool = True
    use_noise_encoder: bool = False
    use_modality_encoder: bool = True
    use_mlp_goal: bool = True
    # feed the 8-d processed proprio vector (data/proprio.py) through the
    # denoiser's proprio_emb token (ref mdtv_transformer.py:159-163; the
    # reference ships the hook but its production config never feeds it)
    use_proprio: bool = False
    # perceiver (conf/model/mdtv_agent.yaml)
    perceiver_depth: int = 6
    perceiver_heads: int = 8
    perceiver_dim_head: int = 64
    perceiver_num_time_embeds: int = 1
    perceiver_dim: int = 384
    num_latents: int = 3
    # image encoder (Voltron v-cond ViT-S/16 @224)
    img_size: int = 224
    vit_patch: int = 16
    vit_depth: int = 12
    vit_heads: int = 6
    freeze_img_encoder: bool = True
    # goal towers (conf/config.yaml: ViT-B/16 vision, ViT-B/32 text)
    clip_embed_dim: int = 512
    clip_vision_width: int = 768
    clip_vision_layers: int = 12
    clip_vision_patch: int = 16
    # goal image tower family: "vit" (ViT-B/16, the production config) or
    # "resnet" (CLIP ModifiedResNet — the reference VisionClip's DEFAULT
    # model_name="RN50", vision_clip.py:10; RN50 emits 1024-d embeddings, so
    # pair with clip_embed_dim=1024 / goal_dim accordingly)
    clip_vision_family: str = "vit"
    clip_rn_layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    clip_rn_width: int = 64
    clip_text_width: int = 512
    clip_text_layers: int = 12
    clip_text_heads: int = 8
    clip_context_length: int = 77
    clip_vocab_size: int = 49408
    # masked foresight decoder (conf/model/img_gen/masked_transformer.yaml)
    gen_img_res: int = 112
    gen_patch_size: int = 16
    gen_decoder_depth: int = 6
    gen_decoder_dim: int = 192
    gen_decoder_heads: int = 8
    gen_mask_ratio: float = 0.75
    img_gen_frame_diff: int = 3
    # computation dtype of the (trainable) masked foresight decoder; master
    # params stay f32 and the loss always accumulates in f32. bfloat16 is
    # the production default — the reference trains the WHOLE model under
    # AMP fp16 (conf/config.yaml precision: 16), so a bf16 foresight decoder
    # is conservative by comparison, and it measured 826.8 -> 762.6 ms/step
    # (full mode) and 304 -> 238 ms (cache mode) at B=512 (ROUND3_NOTES).
    # "float32" is the bit-parity escape hatch.
    gen_compute_dtype: str = "bfloat16"
    # computation dtype of the TRAINABLE denoiser's block stacks (master
    # params + residual stream + norms + sigma/goal/action projections stay
    # f32; only the per-block GEMMs/attention run reduced). The reference
    # trains the whole model under AMP fp16 (conf/config.yaml:46), so
    # "bfloat16" is conservative by comparison; "float32" (default) is the
    # bit-parity lowering used by the torch-port activation tests.
    denoiser_compute_dtype: str = "float32"
    # factored perceiver cross-attention: fold W_k into the 24-row query
    # block and re-associate the V side so K/V over the 395-token media
    # never materialize (models/perceiver.py _factored_kv_attention) —
    # ~7x fewer perceiver FLOPs and none of the (B,T,H,D) retile copies.
    # Same math by matmul associativity (parity-tested to 7.5e-7 f32);
    # checkpoint layout unchanged. PRODUCTION DEFAULT — measured at
    # B=512/modality on the v5e chip (tools/ab_step.py, fetch-barrier):
    # full mode 762.6 -> 665.0 ms/step (1,343 -> 1,540 chunks/s/chip),
    # cache mode 238.5 -> 140.2 ms/step (4,294 -> 7,305 chunks/s/chip).
    # False is the exact-reference-lowering escape hatch.
    perceiver_factored_kv: bool = True
    # training
    optimizer: OptimizerConfig = OptimizerConfig()
    lr_scheduler: LRSchedulerConfig = LRSchedulerConfig()

    def __post_init__(self):
        # agent_overrides from YAML/CLI deliver nested blocks as plain dicts
        # (e.g. `agent_overrides: {lr_scheduler: {total_steps: 1000}}`);
        # coerce them so the config stays a hashable static jit constant
        if isinstance(self.optimizer, dict):
            object.__setattr__(self, "optimizer",
                               OptimizerConfig(**self.optimizer))
        if isinstance(self.lr_scheduler, dict):
            object.__setattr__(self, "lr_scheduler",
                               LRSchedulerConfig(**self.lr_scheduler))
        object.__setattr__(self, "clip_rn_layers", tuple(self.clip_rn_layers))
    # dtype for the FROZEN encoder towers (params + activations). bf16 is the
    # TPU-native analogue of the reference's AMP fp16 (conf/config.yaml:46);
    # trainable modules stay float32.
    compute_dtype: str = "bfloat16"
    # recompute the perceiver in backward (jax.checkpoint). Existed to free
    # the 392-token K/V residuals that dominated HBM at large batch — but
    # the factored perceiver (above) never materializes them, so since
    # round 4 the recompute is pure waste: full-mode B=512 measured
    # 665.0 -> 638.4 ms/step (1,540 -> 1,604 chunks/s) with remat OFF, no
    # OOM (and even the unfactored escape hatch fits: 770 ms measured
    # remat-off in round 3). Default False; True re-enables the trade for
    # larger-batch/smaller-HBM regimes.
    remat_perceiver: bool = False
    # run both cameras through the frozen ViT as ONE batched call (numerically
    # identical: the same weights apply per-sample); halves kernel launches
    fuse_camera_batch: bool = True
    # Pallas fused qkv-attention in the frozen towers
    # (ops/fused_qkv_attention.py): "auto" = on for TPU backends, off
    # elsewhere; measured 1.5x on the Voltron tower (docs/PALLAS.md)
    fused_tower_attention: str = "auto"
    # Run each frozen tower's 12 identical blocks as ONE lax.scan block over
    # depth-stacked params (models/layer_stack.py converts checkpoints
    # between layouts). Measured: -11% StableHLO module text, ~1.5x faster
    # trace+lower (the program bulk is optimizer/EMA leaf boilerplate, not
    # tower blocks). Default off (the unrolled layout is the checkpoint/
    # port layout; step-time impact measured via tools/ab_step.py).
    scan_tower_layers: bool = False
    # Flatten the Voltron tower's norm/MLP segment to 2-D tokens (3-D only
    # around attention). Targets a measured TPU layout trap: the 3-D mlp_out
    # dot fuses with the next block's RMSNorm stats into a batch-minor
    # ({0,2,1}) output (~2.11 vs ~1.2 ms ideal per layer at B=1024) plus
    # layout-fix copies before the attention custom-call. Same math, same
    # param tree (models/voltron_vit.py VoltronBlock.two_d).
    voltron_blocks_2d: bool = False


# Config fields of MEASURED-AND-REJECTED experiments, retired from the
# production surface (VERDICT r3 weak #7). The experiment code + tests
# remain (ops/mxu_norm.py, models/perceiver.py head_slice, tools/) and the
# measurements live in docs/PALLAS.md + the round decision tables; old run
# snapshots carrying these keys still re-hydrate (filter below):
# - mxu_tower_norm: MXU-stat tower norms — 3% end-to-end regression
# - perceiver_head_slice: minor-dim-sliced perceiver attention — 264 vs
#   238.5 ms cache-mode step (and superseded by perceiver_factored_kv)
# - fuse_scope_towers: cross-scope fused frozen towers — 845.3 vs 826.8
#   ms/step (tower matmuls already MXU-saturated per scope)
RETIRED_OVERRIDES = ("mxu_tower_norm", "perceiver_head_slice",
                     "fuse_scope_towers")


def filter_retired_overrides(overrides: dict) -> dict:
    """Drop retired experiment keys from a run snapshot's agent_overrides
    (with a log) so historical run dirs keep re-hydrating."""
    import logging
    retired = {k: v for k, v in overrides.items() if k in RETIRED_OVERRIDES}
    if retired:
        logging.getLogger(__name__).warning(
            "dropping retired agent overrides %s (rejected experiments; "
            "see agents/config.py RETIRED_OVERRIDES)", retired)
    return {k: v for k, v in overrides.items() if k not in RETIRED_OVERRIDES}
