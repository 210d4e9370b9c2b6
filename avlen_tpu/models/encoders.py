"""Convolutional observation encoders (Flax).

Capability match for the reference's 3-conv encoders
(ss_baselines/av_nav/models/audio_cnn.py:15-89, visual_cnn.py:44-154):
VALID-padded conv stacks with the same kernel/stride schedules, flattened
into a ReLU-projected embedding, Kaiming-normal init. RGB inputs are uint8
and normalized by /255 inside the module, depth is already [0, 1].

TPU notes: NHWC layout (XLA-native), bf16-friendly compute dtype, batch is
the leading dim so the same module serves (B, ...) and (T*B, ...) calls.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

KAIMING = nn.initializers.kaiming_normal()


class ConvEncoder(nn.Module):
    """3-layer VALID conv stack → flatten → Dense(output_size) → ReLU."""

    output_size: int
    kernels: Sequence[Tuple[int, int]]
    strides: Sequence[Tuple[int, int]]
    channels: Sequence[int] = (32, 64, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i, (k, s, c) in enumerate(zip(self.kernels, self.strides, self.channels)):
            # clamp kernels to the running spatial dims so tiny test inputs
            # (e.g. low-sample-rate spectrograms) never collapse to size 0
            k = (min(k[0], x.shape[1]), min(k[1], x.shape[2]))
            x = nn.Conv(c, k, strides=s, padding="VALID", kernel_init=KAIMING, dtype=self.dtype)(x)
            if i < len(self.kernels) - 1:
                x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.output_size, kernel_init=KAIMING, dtype=self.dtype)(x)
        return nn.relu(x).astype(jnp.float32)


class AudioCNN(nn.Module):
    """Spectrogram encoder (audio_cnn.py:15-89): small-input kernel schedule
    when either spatial dim < 30 (the 65×26 spectrogram hits this)."""

    output_size: int
    input_hw: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spectrogram: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_hw
        if h < 30 or w < 30:
            kernels, strides = [(5, 5), (3, 3), (3, 3)], [(2, 2), (2, 2), (1, 1)]
        else:
            kernels, strides = [(8, 8), (4, 4), (3, 3)], [(4, 4), (2, 2), (1, 1)]
        return ConvEncoder(self.output_size, kernels, strides, dtype=self.dtype)(spectrogram)


class VisualCNN(nn.Module):
    """RGB-D encoder (visual_cnn.py:44-154). Accepts rgb (uint8) and/or depth
    (float) stacked channel-wise; rgb normalized by /255."""

    output_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb: Optional[jnp.ndarray] = None, depth: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        parts = []
        if rgb is not None:
            parts.append(rgb.astype(jnp.float32) / 255.0)
        if depth is not None:
            parts.append(depth.astype(jnp.float32))
        assert parts, "VisualCNN requires rgb and/or depth"
        x = jnp.concatenate(parts, axis=-1)
        if min(x.shape[1], x.shape[2]) < 40:
            # small-input schedule (keeps spatial dims positive; the reference
            # only ever sees >=128 px frames here)
            kernels, strides = [(5, 5), (3, 3), (3, 3)], [(2, 2), (2, 2), (1, 1)]
        else:
            kernels, strides = [(8, 8), (4, 4), (3, 3)], [(4, 4), (2, 2), (2, 2)]
        return ConvEncoder(self.output_size, kernels, strides, dtype=self.dtype)(x)
