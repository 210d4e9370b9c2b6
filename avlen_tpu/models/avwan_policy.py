"""AV-WAN waypoint policy.

Capability match for av_wan/ppo/policy.py (AudioNavBaselinePolicy over
MapCNN ⊕ AudioCNN → GRU → masked categorical over action-map cells, with
`CategoricalNetWithMask` masking invalid waypoints —
ss_baselines/common/utils.py:75-128) and av_wan/models/map_cnn.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avlen_tpu.models.encoders import AudioCNN, ConvEncoder
from avlen_tpu.models.policy import CriticHead, categorical_entropy, categorical_log_prob
from avlen_tpu.models.rnn_state_encoder import RNNStateEncoder

KAIMING = nn.initializers.kaiming_normal()
ORTHO_001 = nn.initializers.orthogonal(0.01)
NEG_INF = -1e9


class MapCNN(nn.Module):
    """3-conv encoder over a map tensor (av_wan/models/map_cnn.py)."""

    output_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ConvEncoder(
            self.output_size, kernels=[(4, 4), (3, 3), (3, 3)], strides=[(2, 2), (1, 1), (1, 1)],
            dtype=self.dtype,
        )(x)


def masked_categorical_sample(key, logits, mask):
    logits = jnp.where(mask > 0, logits, NEG_INF)
    return jax.random.categorical(key, logits, axis=-1), logits


class AVWanNet(nn.Module):
    hidden_size: int = 256
    spectrogram_hw: Tuple[int, int] = (65, 26)
    use_gm: bool = True
    use_am: bool = True
    action_map_size: int = 9
    rnn_type: str = "GRU"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.audio_encoder = AudioCNN(self.hidden_size, self.spectrogram_hw, dtype=self.dtype)
        if self.use_gm:
            self.gm_encoder = MapCNN(self.hidden_size, dtype=self.dtype)
        if self.use_am:
            self.am_encoder = MapCNN(self.hidden_size, dtype=self.dtype)
        n = 1 + int(self.use_gm) + int(self.use_am)
        self.state_encoder = RNNStateEncoder(n * self.hidden_size, self.hidden_size, self.rnn_type)

    def features(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        parts = [self.audio_encoder(obs["spectrogram"])]
        if self.use_gm:
            parts.append(self.gm_encoder(obs["gm"]))
        if self.use_am:
            parts.append(self.am_encoder(obs["am"]))
        return jnp.concatenate(parts, axis=-1)

    def __call__(self, obs, hidden, masks):
        return self.state_encoder(self.features(obs), hidden, masks)

    def forward_sequence(self, obs, hidden, masks):
        t, b = masks.shape
        flat = jax.tree.map(lambda v: v.reshape((t * b,) + v.shape[2:]), obs)
        feats = self.features(flat).reshape(t, b, -1)
        return self.state_encoder.forward_sequence(feats, hidden, masks)

    def initial_state(self, batch):
        return self.state_encoder.initial_state(batch)


class AVWanPolicy(nn.Module):
    """Masked waypoint actor-critic."""

    net: AVWanNet

    @property
    def num_waypoints(self) -> int:
        return self.net.action_map_size**2

    def setup(self):
        self.action_head = nn.Dense(self.num_waypoints, kernel_init=ORTHO_001)
        self.critic = CriticHead()

    def initial_state(self, batch):
        return self.net.initial_state(batch)

    def act(self, obs, hidden, masks, action_mask, key, deterministic: bool = False):
        feats, hidden = self.net(obs, hidden, masks)
        logits = self.action_head(feats)
        logits = jnp.where(action_mask > 0, logits, NEG_INF)
        value = self.critic(feats)
        action = jnp.where(deterministic, jnp.argmax(logits, -1), jax.random.categorical(key, logits))
        return action, categorical_log_prob(logits, action), value, hidden, logits

    def get_value(self, obs, hidden, masks, action_mask):
        feats, _ = self.net(obs, hidden, masks)
        return self.critic(feats)

    def evaluate_actions(self, obs, hidden, masks, actions, action_masks):
        feats, _ = self.net.forward_sequence(obs, hidden, masks)
        logits = self.action_head(feats)
        logits = jnp.where(action_masks > 0, logits, NEG_INF)
        values = self.critic(feats)
        return values, categorical_log_prob(logits, actions), categorical_entropy(logits), logits
