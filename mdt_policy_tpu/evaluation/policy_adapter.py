"""Env-facing rollout policy: raw env obs -> jitted agent inputs.

The env protocol (env_adapter.py, ref mdt/wrappers/hulc_wrapper.py:47-62)
emits nested raw uint8 camera obs `{'rgb_obs': {'rgb_static': ...}}`, while
the jitted `MDTVPolicy` consumes flat, CLIP-normalized frames. This adapter
bridges the two — the TPU analogue of the reference running its torchvision
val transforms inside the wrapper's `transform_observation`
(hulc_wrapper.py:47-62) — and is shared by the evaluate CLI and both
training-time rollout callbacks.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["PreprocessingPolicy", "make_rollout_policy"]


class PreprocessingPolicy:
    """Wraps a jitted `MDTVPolicy` with on-device eval preprocessing of raw
    env observations (and of raw uint8 goal images for the 'vis' modality)."""

    def __init__(self, policy, preprocessor):
        self.inner = policy  # the MDTVPolicy (exposed for tooling)
        self.pp = preprocessor
        # (raw goal frame, processed) — holding the raw object pins it so
        # identity can't be recycled by the GC
        self._goal_cache = (None, None)

    def reset(self):
        self.inner.reset()

    def step(self, obs: Dict, goal: Dict):
        batch = self.pp.eval_batch({
            "rgb_static": obs["rgb_obs"]["rgb_static"],
            "rgb_gripper": obs["rgb_obs"]["rgb_gripper"],
        })
        if "rgb_static_goal" in goal:
            # raw uint8 goal frame -> same camera pipeline as the obs; the
            # goal is constant for a whole rollout (a few hundred steps), so
            # cache by frame identity
            raw = goal["rgb_static_goal"]
            if self._goal_cache[0] is not raw:
                g = self.pp.eval_batch({"rgb_static": np.asarray(raw)})
                self._goal_cache = (raw, g["rgb_static"][:, -1])
            goal = {**goal, "rgb_static_goal": self._goal_cache[1]}
        return np.asarray(self.inner.step(
            {"rgb_static": batch["rgb_static"],
             "rgb_gripper": batch["rgb_gripper"]},
            goal))


def make_rollout_policy(net, params, *, rng=None, **sampler_overrides
                        ) -> PreprocessingPolicy:
    """Jitted chunked policy + raw-obs preprocessing in one object."""
    from mdt_policy_tpu.agents.mdtv_agent import MDTVPolicy
    from mdt_policy_tpu.data.loader import Preprocessor

    cfg = net.cfg
    pp = Preprocessor(static_size=cfg.img_size,
                      gripper_size=min(84, cfg.img_size),
                      gen_size=cfg.gen_img_res)
    return PreprocessingPolicy(MDTVPolicy(net, params, rng=rng,
                                          **sampler_overrides), pp)
