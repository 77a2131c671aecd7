"""Learning-rate schedules.

Tri-stage schedule re-implementing the reference
(`mdt/utils/lr_schedulers/tri_stage_scheduler.py:52-148`, with its
cosine-anneal decay stage) as an optax-compatible `step -> lr` function.

Production config (conf/model/mdt_agent.yaml lr_scheduler): peak 1e-4,
init_lr_scale 0.1, final_lr_scale 1e-6, total_steps 50000,
phase_ratio (0.02, 0.08, 0.9).

Stage semantics (ref `step()`, :130-148, noting the reference increments
update_step AFTER setting the lr, so lr(step) is evaluated at the pre-step
counter):
  warmup: lr = init + (peak-init) * step/warmup_steps   (linear)
  hold:   lr = peak
  decay:  lr = final + 0.5*(peak-final)*(1+cos(pi * s/decay_steps))
  after:  lr = final
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["tri_stage_schedule", "lr_schedule_from_cfg"]


def lr_schedule_from_cfg(cfg):
    """The production schedule from an agent config's optimizer/lr_scheduler
    blocks — single construction point shared by both agents' optimizers and
    the train-step `train/lr` metric (the reference's LearningRateMonitor
    scalar, mdt/training.py:62)."""
    return tri_stage_schedule(
        peak_lr=cfg.optimizer.learning_rate,
        init_lr_scale=cfg.lr_scheduler.init_lr_scale,
        final_lr_scale=cfg.lr_scheduler.final_lr_scale,
        total_steps=cfg.lr_scheduler.total_steps,
        phase_ratio=cfg.lr_scheduler.phase_ratio)


def tri_stage_schedule(
    peak_lr: float = 1e-4,
    init_lr_scale: float = 0.1,
    final_lr_scale: float = 1e-6,
    total_steps: int = 50_000,
    phase_ratio: tuple[float, float, float] = (0.02, 0.08, 0.9),
):
    warmup_steps = int(total_steps * phase_ratio[0])
    hold_steps = int(total_steps * phase_ratio[1])
    decay_steps = int(total_steps * phase_ratio[2])
    init_lr = init_lr_scale * peak_lr
    final_lr = final_lr_scale * peak_lr
    warmup_rate = (peak_lr - init_lr) / warmup_steps if warmup_steps else 0.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        in_warmup = step < warmup_steps
        in_hold = step < warmup_steps + hold_steps
        in_decay = step <= warmup_steps + hold_steps + decay_steps
        s_decay = step - (warmup_steps + hold_steps)
        lr_warm = init_lr + warmup_rate * step
        lr_decay = final_lr + 0.5 * (peak_lr - final_lr) * (
            1 + jnp.cos(s_decay / decay_steps * math.pi))
        return jnp.where(in_warmup, lr_warm,
               jnp.where(in_hold, peak_lr,
               jnp.where(in_decay, lr_decay, final_lr)))

    return schedule
