"""Rollout video recording — the RolloutVideo equivalent
(`mdt/rollout/rollout_video.py:39-320`): collects frames per subtask, draws a
success/fail border and the language caption, writes an animated GIF (PIL;
moviepy/wandb are not in this image — GIF-to-file replaces video-to-wandb).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image, ImageDraw

__all__ = ["RolloutVideo"]

GREEN = (40, 180, 70)
RED = (200, 50, 40)


class RolloutVideo:
    def __init__(self, save_dir, fps: int = 15, border: int = 4):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.fps = fps
        self.border = border
        self._frames: List[np.ndarray] = []
        self._subtask_start = 0
        self._tag = "rollout"
        self._caption: Optional[str] = None

    def new_video(self, tag: str, caption: Optional[str] = None):
        self._frames = []
        self._subtask_start = 0
        self._tag = tag
        self._caption = caption

    def new_subtask(self):
        self._subtask_start = len(self._frames)

    def update(self, rgb_frame: np.ndarray):
        """Add one env frame (H, W, 3) uint8 (or any squeezable shape)."""
        f = np.asarray(rgb_frame)
        f = f.reshape(f.shape[-3], f.shape[-2], f.shape[-1]).astype(np.uint8)
        self._frames.append(f)

    def draw_outcome(self, success: bool):
        """Tint the border of the finished subtask's frames (ref :draw border)."""
        color = GREEN if success else RED
        b = self.border
        for i in range(self._subtask_start, len(self._frames)):
            f = self._frames[i].copy()
            f[:b, :] = color
            f[-b:, :] = color
            f[:, :b] = color
            f[:, -b:] = color
            self._frames[i] = f

    def add_language_instruction(self, text: str):
        for i in range(self._subtask_start, len(self._frames)):
            img = Image.fromarray(self._frames[i])
            d = ImageDraw.Draw(img)
            d.text((self.border + 2, self.border + 2), text, fill=(255, 255, 255))
            self._frames[i] = np.asarray(img)

    def write(self) -> Optional[Path]:
        if not self._frames:
            return None
        path = self.save_dir / f"{self._tag}.gif"
        imgs = [Image.fromarray(f) for f in self._frames]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / self.fps), loop=0)
        return path
