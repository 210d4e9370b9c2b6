"""TensorBoard writer wrapper (parity: ss_baselines/common/tensorboard_utils.py:
18-72 — no-op writer when no logdir, video logging helper)."""

from __future__ import annotations

from typing import Optional

import numpy as np


class TensorboardWriter:
    def __init__(self, log_dir: Optional[str], flush_secs: int = 30):
        self.writer = None
        if log_dir:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_dir, flush_secs=flush_secs)

    def __enter__(self):
        return self

    def __exit__(self, *args):
        if self.writer:
            self.writer.close()

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self.writer:
            self.writer.add_scalar(tag, float(value), step)

    def add_scalars(self, tag: str, values: dict, step: int) -> None:
        if self.writer:
            self.writer.add_scalars(tag, {k: float(v) for k, v in values.items()}, step)

    def add_video_from_np_images(self, tag: str, step: int, images, fps: int = 10) -> None:
        if not self.writer:
            return
        frames = np.stack(images).transpose(0, 3, 1, 2)[None]
        try:
            self.writer.add_video(tag, frames, step, fps=fps)
        except ImportError:
            pass  # tensorboardX video needs moviepy; disk videos still written
