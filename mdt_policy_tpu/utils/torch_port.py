"""PyTorch -> JAX checkpoint porting.

Maps reference-format state_dicts (the published `mdtv-*` checkpoints, EMA
weights path `mdt/models/mdtv_agent.py:145-162`) onto this framework's flax
param trees. Conventions:

* torch nn.Linear weight (out, in)  -> flax Dense kernel (in, out): transpose
* torch LayerNorm weight/bias       -> flax scale/bias
* torch Conv2d weight (O, I, H, W)  -> flax Conv kernel (H, W, I, O)
* biasless LayerNorms live under a nested `LayerNorm_0` scope (models/blocks
  BiaslessLayerNorm wraps nn.LayerNorm)

`port_mdtv_transformer` covers the denoiser — the component the BASELINE
denoised-chunk-parity check runs through. Tensors may be torch.Tensor or
numpy arrays (state_dicts loaded with torch.load(..., map_location='cpu')).
"""

from __future__ import annotations

import logging
from typing import Dict, Mapping

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["port_mdtv_transformer", "port_mdt_transformer"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _dense(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Mapping, prefix: str) -> Dict:
    out = {"scale": _np(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _biasless_ln(sd: Mapping, prefix: str) -> Dict:
    # BiaslessLayerNorm nests a LayerNorm_0 scope
    return {"LayerNorm_0": _ln(sd, prefix)}


def _goal_embed(sd: Mapping, prefix: str, use_mlp: bool) -> Dict:
    """GoalEmbed: torch Sequential(Linear, GELU, Linear) -> fc1/fc2
    (ref mdtv_transformer.py:83-101)."""
    if use_mlp:
        return {"fc1": _dense(sd, f"{prefix}.0"), "fc2": _dense(sd, f"{prefix}.2")}
    return {"linear": _dense(sd, prefix)}


def _sigma_embed(sd: Mapping, prefix: str) -> Dict:
    """SigmaEmbedding: Sequential(SinusoidalPosEmb, Linear, Mish, Linear)
    (ref mdtv_transformer.py:169-174)."""
    return {"fc1": _dense(sd, f"{prefix}.1"), "fc2": _dense(sd, f"{prefix}.3")}


def _attention(sd: Mapping, prefix: str) -> Dict:
    return {
        "query": _dense(sd, f"{prefix}.query"),
        "key": _dense(sd, f"{prefix}.key"),
        "value": _dense(sd, f"{prefix}.value"),
        "c_proj": _dense(sd, f"{prefix}.c_proj"),
    }


def _mlp(sd: Mapping, prefix: str) -> Dict:
    return {"c_fc": _dense(sd, f"{prefix}.c_fc"),
            "c_proj": _dense(sd, f"{prefix}.c_proj")}


def _block(sd: Mapping, prefix: str, cross: bool) -> Dict:
    out = {
        "ln_1": _biasless_ln(sd, f"{prefix}.ln_1"),
        "attn": _attention(sd, f"{prefix}.attn"),
        "ln_2": _biasless_ln(sd, f"{prefix}.ln_2"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }
    if cross:
        out["ln3"] = _ln(sd, f"{prefix}.ln3")  # full LayerNorm (ref :205)
        out["cross_att"] = _attention(sd, f"{prefix}.cross_att")
    return out


def _conditioned_block(sd: Mapping, prefix: str, cross: bool) -> Dict:
    out = _block(sd, prefix, cross)
    out["adaLN_zero"] = {"modulation": _dense(sd, f"{prefix}.adaLN_zero.modulation.1")}
    return out


def _encoder(sd: Mapping, prefix: str, n_layers: int) -> Dict:
    out = {f"block_{i}": _block(sd, f"{prefix}.blocks.{i}", cross=False)
           for i in range(n_layers)}
    out["ln"] = _biasless_ln(sd, f"{prefix}.ln")
    return out


def _film_decoder(sd: Mapping, prefix: str, n_layers: int) -> Dict:
    out = {f"block_{i}": _conditioned_block(sd, f"{prefix}.blocks.{i}", cross=True)
           for i in range(n_layers)}
    out["ln"] = _biasless_ln(sd, f"{prefix}.ln")
    return out


def port_mdtv_transformer(sd: Mapping, *, n_enc_layers: int = 4,
                          n_dec_layers: int = 4, use_mlp_goal: bool = True,
                          use_modality_encoder: bool = True) -> Dict:
    """Reference MDTVTransformer state_dict -> flax params for
    models.mdtv_transformer.MDTVTransformer (production: AdaLN decoder)."""
    params: Dict = {
        "pos_emb": _np(sd["pos_emb"]),
        "tok_emb": _dense(sd, "tok_emb"),
        "goal_emb": _goal_embed(sd, "goal_emb", use_mlp_goal),
        "proprio_emb": {"fc1": _dense(sd, "proprio_emb.0"),
                        "fc2": _dense(sd, "proprio_emb.2")},
        "sigma_emb": _sigma_embed(sd, "sigma_emb"),
        "action_emb": _dense(sd, "action_emb"),
        "action_pred": _dense(sd, "action_pred"),
        "encoder": _encoder(sd, "encoder", n_enc_layers),
        "decoder": _film_decoder(sd, "decoder", n_dec_layers),
    }
    if use_modality_encoder:
        params["lang_emb"] = _goal_embed(sd, "lang_emb", use_mlp_goal)
    return params


def port_mdt_transformer(sd: Mapping, *, n_enc_layers: int = 4,
                         n_dec_layers: int = 6, use_mlp_goal: bool = True,
                         use_modality_encoder: bool = True) -> Dict:
    """Reference MDTTransformer state_dict -> flax params for
    models.mdt_transformer.MDTTransformer."""
    params: Dict = {
        "pos_emb": _np(sd["pos_emb"]),
        "tok_emb": _dense(sd, "tok_emb"),
        "incam_embed": _dense(sd, "incam_embed"),
        "goal_emb": _goal_embed(sd, "goal_emb", use_mlp_goal),
        "sigma_emb": _sigma_embed(sd, "sigma_emb"),
        "action_emb": _dense(sd, "action_emb"),
        "action_pred": _dense(sd, "action_pred"),
        "encoder": _encoder(sd, "encoder", n_enc_layers),
        "decoder": _film_decoder(sd, "decoder", n_dec_layers),
    }
    if use_modality_encoder:
        params["lang_emb"] = _goal_embed(sd, "lang_emb", use_mlp_goal)
    return params


# ---------------------------------------------------------------------------
# OpenAI CLIP towers (goal encoders)
# ---------------------------------------------------------------------------

def _conv_nhwc(sd: Mapping, prefix: str) -> Dict:
    """torch Conv2d (O, I, H, W) -> flax NHWC kernel (H, W, I, O)."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _clip_resblock(sd: Mapping, prefix: str) -> Dict:
    """OpenAI ResidualAttentionBlock -> models.clip.ResidualAttentionBlock.
    Packed qkv `attn.in_proj_*` maps to the fused `in_proj` Dense."""
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "in_proj": {"kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
                    "bias": _np(sd[f"{prefix}.attn.in_proj_bias"])},
        "out_proj": _dense(sd, f"{prefix}.attn.out_proj"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "c_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
    }


def port_clip_vision(sd: Mapping, *, layers: int = 12, prefix: str = "visual"
                     ) -> Dict:
    """OpenAI CLIP `visual.*` ViT tower -> models.clip.CLIPVisionTower params
    (weights published at mdt/models/networks/clip.py:33-40 URL table)."""
    p = prefix
    params: Dict = {
        "conv1": _conv_nhwc(sd, f"{p}.conv1"),
        "class_embedding": _np(sd[f"{p}.class_embedding"]),
        "positional_embedding": _np(sd[f"{p}.positional_embedding"]),
        "ln_pre": _ln(sd, f"{p}.ln_pre"),
        "ln_post": _ln(sd, f"{p}.ln_post"),
        "proj": _np(sd[f"{p}.proj"]),
    }
    for i in range(layers):
        params[f"resblock_{i}"] = _clip_resblock(sd, f"{p}.transformer.resblocks.{i}")
    return params


def port_clip_text(sd: Mapping, *, layers: int = 12) -> Dict:
    """OpenAI CLIP text tower -> models.clip.CLIPTextTower params."""
    params: Dict = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(layers):
        params[f"resblock_{i}"] = _clip_resblock(sd, f"transformer.resblocks.{i}")
    return params


def port_clip_resnet(sd: Mapping, *, layers=(3, 4, 6, 3),
                     prefix: str = "visual") -> Dict:
    """OpenAI CLIP `visual.*` ModifiedResNet tower (RN50 family) ->
    models.clip.CLIPResNetTower params (ref mdt/models/networks/
    clip.py:134-206). BatchNorm running statistics land on the frozen
    tower's mean/var params (_FrozenBatchNorm)."""
    def bn(pfx):
        return {"scale": _np(sd[f"{pfx}.weight"]),
                "bias": _np(sd[f"{pfx}.bias"]),
                "mean": _np(sd[f"{pfx}.running_mean"]),
                "var": _np(sd[f"{pfx}.running_var"])}

    p = prefix
    params: Dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv_nhwc(sd, f"{p}.conv{i}")
        params[f"bn{i}"] = bn(f"{p}.bn{i}")
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f"{p}.layer{stage + 1}.{b}"
            blk = {
                "conv1": _conv_nhwc(sd, f"{src}.conv1"),
                "bn1": bn(f"{src}.bn1"),
                "conv2": _conv_nhwc(sd, f"{src}.conv2"),
                "bn2": bn(f"{src}.bn2"),
                "conv3": _conv_nhwc(sd, f"{src}.conv3"),
                "bn3": bn(f"{src}.bn3"),
            }
            # downsample Sequential: "-1"=avgpool (no params), "0"=conv, "1"=bn
            if f"{src}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv_nhwc(sd, f"{src}.downsample.0")
                blk["downsample_norm"] = bn(f"{src}.downsample.1")
            params[f"layer{stage + 1}_{b}"] = blk
    ap = f"{p}.attnpool"
    params["attnpool"] = {
        "positional_embedding": _np(sd[f"{ap}.positional_embedding"]),
        "q_proj": _dense(sd, f"{ap}.q_proj"),
        "k_proj": _dense(sd, f"{ap}.k_proj"),
        "v_proj": _dense(sd, f"{ap}.v_proj"),
        "c_proj": _dense(sd, f"{ap}.c_proj"),
    }
    return params


def port_resnet18_gn(sd: Mapping, *, prefix: str = "backbone", fc_prefix: str = "fc_layers.0") -> Dict:
    """torchvision-style resnet18 (BatchNorm already swapped to GroupNorm,
    ref resnets.py:119-126) -> models.resnet.BesoResNetEncoder params.

    The reference wraps the torchvision trunk in nn.Sequential, so module
    names are positional: 0=conv1, 1=norm, 4..7=layer1..4 (ref resnets.py:114-115).
    """
    def gn(pfx):
        return {"scale": _np(sd[f"{pfx}.weight"]), "bias": _np(sd[f"{pfx}.bias"])}

    def block(src, stride_block: bool):
        out = {
            "conv1": _conv_nhwc(sd, f"{src}.conv1"),
            "bn1": gn(f"{src}.bn1"),
            "conv2": _conv_nhwc(sd, f"{src}.conv2"),
            "bn2": gn(f"{src}.bn2"),
        }
        if f"{src}.downsample.0.weight" in sd:
            out["downsample_conv"] = _conv_nhwc(sd, f"{src}.downsample.0")
            out["downsample_norm"] = gn(f"{src}.downsample.1")
        return out

    p = prefix
    params: Dict = {"backbone": {
        "conv1": _conv_nhwc(sd, f"{p}.0"),
        "bn1": gn(f"{p}.1"),
    }}
    for stage in range(4):
        seq_idx = 4 + stage
        for b in range(2):
            params["backbone"][f"layer{stage + 1}_{b}"] = block(
                f"{p}.{seq_idx}.{b}", stride_block=(b == 0 and stage > 0))
    if f"{fc_prefix}.weight" in sd:
        params["fc"] = _dense(sd, fc_prefix)
    return params


# ---------------------------------------------------------------------------
# Perceiver resampler, Voltron ViT, masked decoder, and the full-agent port
# ---------------------------------------------------------------------------

def port_perceiver(sd: Mapping, *, depth: int = 6, prefix: str = "") -> Dict:
    """Reference PerceiverResampler state_dict -> models.perceiver params
    (ref mdt/models/networks/transformers/perceiver_resampler.py:80-163;
    layers are ModuleList pairs [attn, feed_forward])."""
    p = (prefix + ".") if prefix else ""
    params: Dict = {
        "latents": _np(sd[f"{p}latents"]),
        "time_pos_emb": _np(sd[f"{p}time_pos_emb"]),
        "norm": _ln(sd, f"{p}norm"),
    }
    for i in range(depth):
        params[f"attn_{i}"] = {
            "norm_media": _ln(sd, f"{p}layers.{i}.0.norm_media"),
            "norm_latents": _ln(sd, f"{p}layers.{i}.0.norm_latents"),
            "to_q": _dense(sd, f"{p}layers.{i}.0.to_q"),
            "to_k": _dense(sd, f"{p}layers.{i}.0.to_k"),
            "to_v": _dense(sd, f"{p}layers.{i}.0.to_v"),
            "to_out": _dense(sd, f"{p}layers.{i}.0.to_out"),
        }
        # feed_forward_layer: Sequential(LN, Linear, act, Linear)
        # (ref transformers/utils.py:15-27)
        params[f"ffw_{i}"] = {
            "norm": _ln(sd, f"{p}layers.{i}.1.0"),
            "fc1": _dense(sd, f"{p}layers.{i}.1.1"),
            "fc2": _dense(sd, f"{p}layers.{i}.1.3"),
        }
    return params


def _layer_scale(sd: Mapping, prefix: str, idx: int) -> Dict:
    """LayerScale gamma under any of the spellings seen across voltron/timm
    vintages: ls{i}.gamma, layer_scale{i}.gamma, lambda{i} (bare parameter)."""
    for cand in (f"{prefix}.ls{idx}.gamma", f"{prefix}.layer_scale{idx}.gamma",
                 f"{prefix}.lambda{idx}"):
        if cand in sd:
            return {"gamma": _np(sd[cand])}
    raise KeyError(f"no LayerScale {idx} parameter under {prefix} "
                   f"(tried ls/layer_scale/lambda spellings)")


def _voltron_block(sd: Mapping, prefix: str) -> Dict:
    """Voltron `models/util/transformer.Block` (RMSNorm + fused-qkv attention
    + SwishGLU MLP + LayerScale, pre-norm residuals) ->
    models.voltron_vit.VoltronBlock params. Layout parity-tested against a
    torch reconstruction of the published block in
    tests/test_voltron_port.py; LayerScale key spellings are normalized by
    _layer_scale."""
    return {
        "norm1": {"g": _np(sd[f"{prefix}.norm1.g"])} if f"{prefix}.norm1.g" in sd
                 else _ln(sd, f"{prefix}.norm1"),
        "attn": {"qkv": _dense(sd, f"{prefix}.attn.qkv"),
                 "proj": _dense(sd, f"{prefix}.attn.proj")},
        "ls1": _layer_scale(sd, prefix, 1),
        "norm2": {"g": _np(sd[f"{prefix}.norm2.g"])} if f"{prefix}.norm2.g" in sd
                 else _ln(sd, f"{prefix}.norm2"),
        "mlp_glu": {"project": _dense(sd, f"{prefix}.mlp.0.project")},
        "mlp_out": _dense(sd, f"{prefix}.mlp.1"),
        "ls2": _layer_scale(sd, prefix, 2),
    }


def port_masked_decoder(sd: Mapping, *, depth: int = 6, prefix: str = "") -> Dict:
    """Reference MaskedTransformerImgDecoder state_dict ->
    models.masked_decoder params (ref masked_transformer_decoder.py:69-124;
    decoder_pe is a fixed sin-cos buffer and is recomputed, not ported)."""
    p = (prefix + ".") if prefix else ""
    params: Dict = {
        "patch2embed": {"proj": _conv_nhwc(sd, f"{p}patch2embed.proj")},
        "encoder2decoder": _dense(sd, f"{p}encoder2decoder"),
        "mask_token": _np(sd[f"{p}mask_token"]),
        "ctx_dec_pe": _np(sd[f"{p}ctx_dec_pe"]),
        "decoder_norm": {"g": _np(sd[f"{p}decoder_norm.g"])},
        "decoder_patch_prediction": _dense(sd, f"{p}decoder_patch_prediction"),
    }
    for i in range(depth):
        params[f"block_{i}"] = _voltron_block(sd, f"{p}decoder_blocks.{i}")
    return params


def port_mdtv_agent(sd: Mapping, *, n_enc_layers: int = 4, n_dec_layers: int = 4,
                    perceiver_depth: int = 6, gen_depth: int = 6,
                    clip_vision_layers: int = 12, clip_text_layers: int = 12
                    ) -> Dict:
    """Full MDTVAgent checkpoint -> MDTVAgentNet param tree.

    Reference module attribute prefixes (mdt/models/mdtv_agent.py:81-143):
      model.inner_model.*            -> inner
      perceiver.*                    -> perceiver
      img_encoder.vcond.*            -> img_encoder  (Voltron v-cond ViT)
      visual_goal.clip_model.visual.* -> visual_goal  (CLIP ViT-B/16)
      language_goal.clip_rn50.*      -> language_goal (CLIP text tower)
      gen_img.*                      -> gen_img
      clip_proj.latent_proj.*        -> clip_proj
      logit_scale                    -> logit_scale
    """
    def sub(prefix):
        plen = len(prefix)
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}

    params: Dict = {
        "inner": port_mdtv_transformer(sub("model.inner_model."),
                                       n_enc_layers=n_enc_layers,
                                       n_dec_layers=n_dec_layers),
        "perceiver": port_perceiver(sub("perceiver."), depth=perceiver_depth),
        "visual_goal": port_clip_vision(sub("visual_goal.clip_model."),
                                        layers=clip_vision_layers),
        "language_goal": port_clip_text(sub("language_goal.clip_rn50."),
                                        layers=clip_text_layers),
        "gen_img": port_masked_decoder(sub("gen_img."), depth=gen_depth),
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    # clip_proj: MAPBlock under latent_proj (ref ClipStyleProjection style 'map')
    cp = sub("clip_proj.latent_proj.")
    if cp:
        params["clip_proj"] = {"latent_proj": {
            "latents": _np(cp["latents"]),
            "projection": {"kernel": _np(cp["projection.weight"]).T,
                           "bias": _np(cp["projection.bias"])},
            "attn_norm": {"g": _np(cp["attn_norm.g"])},
            "attn": {"q": {"kernel": _np(cp["attn.q.weight"]).T},
                     "kv": {"kernel": _np(cp["attn.kv.weight"]).T},
                     "proj": {"kernel": _np(cp["attn.proj.weight"]).T,
                              "bias": _np(cp["attn.proj.bias"])}},
            "mlp_norm": {"g": _np(cp["mlp_norm.g"])},
            "mlp_glu": {"project": {"kernel": _np(cp["mlp.0.project.weight"]).T,
                                    "bias": _np(cp["mlp.0.project.bias"])}},
            "mlp_out": {"kernel": _np(cp["mlp.1.weight"]).T,
                        "bias": _np(cp["mlp.1.bias"])},
        }}
    # img_encoder (Voltron v-cond backbone)
    ve = sub("img_encoder.vcond.")
    if ve:
        try:
            params["img_encoder"] = port_voltron_vit(ve)
        except (KeyError, ValueError) as e:
            logger.warning("voltron backbone port failed (%s); leaving "
                           "random-init — port manually", e)
    return params


def port_voltron_vit(ve: Mapping) -> Dict:
    """Voltron v-cond ViT state_dict (patch2embed + blocks.N + encoder_norm)
    -> models.voltron_vit.VoltronViT params. Block layout parity-tested in
    tests/test_voltron_port.py against a torch reconstruction of the
    published voltron block (RMSNorm/SwishGLU/LayerScale pre-norm)."""
    n_blocks = 1 + max(int(k.split(".")[1]) for k in ve if k.startswith("blocks."))
    enc: Dict = {
        "patch_embed": {"proj": _conv_nhwc(ve, "patch2embed.proj")},
        "norm": _ln(ve, "encoder_norm"),
    }
    for i in range(n_blocks):
        enc[f"block_{i}"] = _voltron_block(ve, f"blocks.{i}")
    return enc


# ---------------------------------------------------------------------------
# Checkpoint-file conversion CLI
# ---------------------------------------------------------------------------

def load_reference_state_dict(ckpt_path, *, prefer_ema: bool = True) -> Dict:
    """Load a reference Lightning checkpoint and return a flat state_dict.

    The published `mdtv-*` checkpoints store EMA weights as a LIST in
    callback state ordered like named_parameters (ref
    mdt/models/mdtv_agent.py:145-162, mdt/callbacks/ema.py:144-153); when
    present (and prefer_ema), the list is zipped back onto the state_dict
    keys the same way load_pretrained_parameters does.
    """
    import torch

    data = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = data["state_dict"] if "state_dict" in data else data
    ema = None
    try:
        ema = data["callbacks"]["EMA"]["ema_weights"]
    except (KeyError, TypeError):
        pass
    if prefer_ema and ema is not None:
        sd = dict(zip(sd.keys(), ema))
    return {k: _np(v) for k, v in sd.items()}


def convert_checkpoint(ckpt_path, out_dir, *, agent: str = "mdtv",
                       prefer_ema: bool = True, scan_layout: bool = False,
                       agent_overrides: Mapping = None):
    """Reference .ckpt -> a ready-to-evaluate RUN DIR.

    Emits `<out_dir>/config.yaml` (the run-config snapshot the evaluate CLI
    re-hydrates — the `.hydra` contract) and `<out_dir>/checkpoints/` (orbax),
    so `evaluate.py --train-folder <out_dir>` restores the converted weights
    directly. Ported params are merged over a fresh init (components absent
    from the checkpoint keep their init); `agent_overrides` sizes the target
    MDTVConfig (production sizes by default) and the port depths follow it."""
    import dataclasses
    from pathlib import Path

    import jax
    import numpy as np
    import yaml
    from mdt_policy_tpu.agents import MDTVConfig, init_agent
    from mdt_policy_tpu.utils.checkpoint import Checkpointer

    overrides = dict(agent_overrides or {})
    if scan_layout:
        # the restore-side model must init the stacked-tower layout too
        overrides["scan_tower_layers"] = True
    sd = load_reference_state_dict(ckpt_path, prefer_ema=prefer_ema)
    cfg = MDTVConfig(**overrides)
    example = {
        "rgb_static": np.zeros((1, 2, cfg.img_size, cfg.img_size, 3), np.float32),
        "rgb_gripper": np.zeros((1, 2, cfg.img_size, cfg.img_size, 3), np.float32),
        "gen_static": np.zeros((1, cfg.gen_img_res, cfg.gen_img_res, 3), np.float32),
        "gen_gripper": np.zeros((1, cfg.gen_img_res, cfg.gen_img_res, 3), np.float32),
        "actions": np.zeros((1, cfg.act_window_size, cfg.action_dim), np.float32),
        "lang_tokens": np.zeros((1, cfg.clip_context_length), np.int32),
    }
    # init the unrolled (checkpoint/port) layout; convert after the merge
    init_cfg = dataclasses.replace(cfg, scan_tower_layers=False) \
        if scan_layout else cfg
    net, state = init_agent(init_cfg, jax.random.PRNGKey(0), example)
    ported = port_mdtv_agent(sd, n_enc_layers=cfg.n_enc_layers,
                             n_dec_layers=cfg.n_dec_layers,
                             perceiver_depth=cfg.perceiver_depth,
                             gen_depth=cfg.gen_decoder_depth,
                             clip_vision_layers=cfg.clip_vision_layers,
                             clip_text_layers=cfg.clip_text_layers)
    dropped = []

    def deep_merge(base, over, path=""):
        """Ported leaves override init leaves. Init-only subtrees survive and
        ported-only subtrees are DROPPED (logged): the restored tree must be
        structurally identical to a fresh init from the same config — e.g.
        the reference always stores proprio_emb weights but our init only
        materializes that head when use_proprio."""
        if not isinstance(base, dict) or not isinstance(over, dict):
            return over
        out = dict(base)
        for k, v in over.items():
            if k in base:
                out[k] = deep_merge(base[k], v, f"{path}/{k}")
            else:
                dropped.append(f"{path}/{k}")
        return out

    merged = deep_merge(dict(state.params), ported)
    if dropped:
        logger.info("checkpoint subtrees absent from the target config, "
                    "dropped: %s", dropped)
    if scan_layout:
        # stacked-tower layout for scan_tower_layers=True runs
        from mdt_policy_tpu.models.layer_stack import convert_tower_layout
        merged = convert_tower_layout(merged, to_scan=True)
    state = state.replace(params=merged,
                          ema_params=jax.tree.map(lambda x: x, merged))
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # run-config snapshot so evaluate.build_policy re-hydrates the same
    # agent sizes (lazy import: training pulls optax/orbax)
    from mdt_policy_tpu.training import RunConfig
    run_cfg = RunConfig(agent=agent, run_name=out_dir.name,
                        log_dir=str(out_dir.parent), agent_overrides=overrides)
    (out_dir / "config.yaml").write_text(yaml.safe_dump(dataclasses.asdict(run_cfg)))
    Checkpointer(out_dir / "checkpoints").save(state, wait=True)  # durable
    return out_dir


def main():
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a reference MDT-V PyTorch checkpoint to an "
                    "mdt_policy_tpu orbax checkpoint.")
    ap.add_argument("ckpt", help="reference .ckpt path")
    ap.add_argument("out", help="output checkpoint directory")
    ap.add_argument("--raw", action="store_true",
                    help="use raw weights instead of EMA")
    ap.add_argument("--scan", action="store_true",
                    help="emit the stacked-tower layout for "
                         "scan_tower_layers=True runs")
    args = ap.parse_args()
    convert_checkpoint(args.ckpt, args.out, prefer_ema=not args.raw,
                       scan_layout=args.scan)


if __name__ == "__main__":
    main()
