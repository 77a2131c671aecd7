"""Analytic FLOP accounting for the Pallas attention custom calls.

XLA's `compiled.cost_analysis()['flops']` counts every op it lowered itself
but treats a `pallas_call` as an opaque custom call with ZERO flops. The
benchmark's MXU-utilization self-check (bench.py, tools/ab_step.py) divides
measured step time into that count, so with the fused tower-attention kernel
routed (ops/fused_qkv_attention.py, `fused_tower_attention="auto"` on TPU)
both the utilization figure and the derived physical throughput ceiling were
biased by the missing tower-attention FLOPs (VERDICT r2 "what's weak" #2;
previously a footnote in docs/PALLAS.md).

This module counts those FLOPs exactly from the agent config: the kernel
body computes the two attention matmuls Q·Kᵀ and P·V — 2·T²·C MACs = 4·T²·C
FLOPs per image per layer (the softmax's exp/sum are VPU transcendentals,
not MXU work; XLA's own flop counter likewise counts matmul flops for its
einsum lowering, so this keeps the two paths comparable). The towers are
frozen with stop_gradient outputs, so each appears in the step exactly once
(forward only — the custom-vjp backward never runs).
"""

from __future__ import annotations

__all__ = ["attention_matmul_flops", "tower_custom_call_flops",
           "mdt_tower_custom_call_flops"]


def attention_matmul_flops(batch: int, seq: int, channels: int,
                           layers: int = 1) -> float:
    """FLOPs of the attention-core matmuls (Q·Kᵀ + P·V) for `layers`
    attention layers over `batch` sequences of length `seq`, model width
    `channels` (= n_heads · head_dim)."""
    return 4.0 * batch * seq * seq * channels * layers


def tower_custom_call_flops(cfg, B: int) -> float:
    """Per-train-step FLOPs inside the frozen towers' Pallas attention calls
    for the dual-modality MDT-V step at batch B per modality stream.

    Counts what the production step actually runs (independent of
    fuse_camera_batch / scan_tower_layers — those change the batching of the
    SAME math, not the op counts):

    - Voltron ViT: 2 cameras x 2 scopes x B images (obs_seq_len=1 frames),
      (img/patch)^2 tokens, perceiver_dim wide, vit_depth layers;
    - CLIP vision goal tower: 2 scopes x B goal frames, (img/patch)^2 + 1
      tokens (class token), clip_vision_width wide;
    - CLIP text tower: B sentences (the lang scope only — the vis scope's
      text call is dead code XLA eliminates), context_length tokens,
      clip_text_width wide.

    Returns 0.0 when the Pallas kernel isn't routed (CPU backends /
    fused_tower_attention=False): XLA lowers the einsum itself then and
    already counts it.
    """
    from mdt_policy_tpu.agents.mdtv_agent import resolve_fused_attention

    if not resolve_fused_attention(cfg):
        return 0.0
    n_vit = (cfg.img_size // cfg.vit_patch) ** 2
    return (attention_matmul_flops(4 * B, n_vit, cfg.perceiver_dim,
                                   cfg.vit_depth)
            + _clip_goal_tower_flops(cfg, B))


def _clip_goal_tower_flops(cfg, B: int) -> float:
    """Pallas attention FLOPs of the frozen CLIP goal towers shared by both
    agent families: vision goal over 2 scopes x B goal frames + text over the
    lang scope's B sentences. The ModifiedResNet goal-tower family is XLA
    convolutions + an einsum attention pool — no Pallas calls."""
    vision = 0.0
    if getattr(cfg, "clip_vision_family", "vit") != "resnet":
        n_clip = (cfg.img_size // cfg.clip_vision_patch) ** 2 + 1
        vision = attention_matmul_flops(2 * B, n_clip, cfg.clip_vision_width,
                                        cfg.clip_vision_layers)
    return vision + attention_matmul_flops(B, cfg.clip_context_length,
                                           cfg.clip_text_width,
                                           cfg.clip_text_layers)


def mdt_tower_custom_call_flops(cfg, B: int) -> float:
    """Per-train-step Pallas custom-call FLOPs of the MDT (ResNet) agent at
    batch B per modality stream (round-4 VERDICT #6: give the MDT family the
    same exact-FLOP accounting as MDT-V). Only the frozen CLIP goal towers
    route through the Pallas attention kernel — the trainable per-camera
    ResNets are XLA convolutions, already in cost_analysis' count."""
    from mdt_policy_tpu.agents.mdtv_agent import resolve_fused_attention

    if not resolve_fused_attention(cfg):
        return 0.0
    return _clip_goal_tower_flops(cfg, B)
