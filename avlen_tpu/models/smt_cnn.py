"""SMT visual encoder.

Capability match for SMTCNN (ss_baselines/savi/models/smt_cnn.py:19-130):
per-modality GroupNorm ResNet-18 towers over 64×64 center-cropped RGB and
depth, each projected to a 64-d embedding; outputs their concatenation
(feature_dims = 128 with both modalities).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from avlen_tpu.models.resnet import ResNet18


def center_crop(x: jnp.ndarray, size: int = 64) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    if h <= size and w <= size:
        return x
    top, left = max((h - size) // 2, 0), max((w - size) // 2, 0)
    return x[:, top : top + min(size, h), left : left + min(size, w), :]


class SMTCNN(nn.Module):
    use_rgb: bool = True
    use_depth: bool = True
    embedding_size: int = 64
    crop_size: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def feature_dims(self) -> int:
        return self.embedding_size * (int(self.use_rgb) + int(self.use_depth))

    @nn.compact
    def __call__(self, rgb: jnp.ndarray | None = None, depth: jnp.ndarray | None = None) -> jnp.ndarray:
        outs = []
        if self.use_rgb:
            x = center_crop(rgb.astype(jnp.float32) / 255.0, self.crop_size)
            outs.append(ResNet18(num_outputs=self.embedding_size, dtype=self.dtype, name="rgb_tower")(x))
        if self.use_depth:
            x = center_crop(depth.astype(jnp.float32), self.crop_size)
            outs.append(ResNet18(num_outputs=self.embedding_size, dtype=self.dtype, name="depth_tower")(x))
        return jnp.concatenate(outs, axis=-1)
