"""GroupNorm ResNet-18 (Flax).

Capability match for the reference's custom resnet18
(ss_baselines/savi/models/smt_resnet.py: BasicBlock ResNet-18 with
GroupNorm(16) in place of BatchNorm) used by SMTCNN and the online belief
predictor. The reference's offline label classifier uses a torchvision
BatchNorm ResNet-18 (belief_predictor.py:79-81); here GroupNorm is used
uniformly — batch-statistics-free normalization is the TPU-native choice
(no cross-replica sync, identical train/eval behavior).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

KAIMING = nn.initializers.kaiming_normal()


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1,
                    use_bias=False, kernel_init=KAIMING, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=self.groups)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=KAIMING, dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=self.groups)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False, kernel_init=KAIMING, dtype=self.dtype)(x)
            residual = nn.GroupNorm(num_groups=self.groups)(residual)
        return nn.relu(residual + y)


class ResNet18(nn.Module):
    """Stages (2,2,2,2), widths 64..512, global-avg-pool → optional Dense head."""

    num_outputs: int = 0  # 0 = return pooled 512-d features
    width: int = 64
    groups: int = 16
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), (2, 2), padding=3, use_bias=False,
                    kernel_init=KAIMING, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, blocks in enumerate(self.stage_sizes):
            feats = self.width * (2**i)
            for b in range(blocks):
                strides = 2 if i > 0 and b == 0 else 1
                x = BasicBlock(feats, strides, self.groups, dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.num_outputs:
            x = nn.Dense(self.num_outputs, kernel_init=KAIMING)(x)
        return x
