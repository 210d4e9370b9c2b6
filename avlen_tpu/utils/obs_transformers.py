"""Observation transformers.

Capability match for habitat_baselines' obs_transformers (resize/center-crop
— the surface ss_baselines uses via `ResizeCenterCropper`,
ss_baselines/common/utils.py:412-530). Pure batched jax ops applied to
observation dicts; registry-selectable.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from avlen_tpu.core.registry import registry

IMAGE_KEYS = ("rgb", "depth", "semantic")


@registry.register_model(name="ResizeShortestEdge")
class ResizeShortestEdge:
    """Resize image observations so the shortest edge equals `size`."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(obs)
        for k in IMAGE_KEYS:
            if k not in obs:
                continue
            img = obs[k]
            h, w = img.shape[1], img.shape[2]
            scale = self.size / min(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            resized = jax.image.resize(
                img.astype(jnp.float32), (img.shape[0], nh, nw, img.shape[3]), "bilinear"
            )
            out[k] = resized.astype(img.dtype) if img.dtype == jnp.uint8 else resized
        return out


@registry.register_model(name="CenterCropper")
class CenterCropper:
    """Center-crop image observations to (h, w) (ResizeCenterCropper crop
    stage, common/utils.py:432-530)."""

    def __init__(self, shape: Tuple[int, int]):
        self.shape = shape

    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(obs)
        ch, cw = self.shape
        for k in IMAGE_KEYS:
            if k not in obs:
                continue
            img = obs[k]
            h, w = img.shape[1], img.shape[2]
            top, left = max((h - ch) // 2, 0), max((w - cw) // 2, 0)
            out[k] = img[:, top : top + ch, left : left + cw, :]
        return out


class ResizeCenterCropper:
    """Resize then center-crop (common/utils.py:432)."""

    def __init__(self, size: Tuple[int, int]):
        self.resize = ResizeShortestEdge(min(size))
        self.crop = CenterCropper(size)

    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return self.crop(self.resize(obs))


def apply_obs_transforms(obs: Dict[str, jnp.ndarray], transforms: Sequence) -> Dict[str, jnp.ndarray]:
    for t in transforms:
        obs = t(obs)
    return obs
