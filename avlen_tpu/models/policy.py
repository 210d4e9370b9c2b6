"""Actor-critic policies (Flax).

Capability match for the reference policy stack (ss_baselines/av_nav/ppo/
policy.py:22-212 and the shared heads of ss_baselines/savi/ppo/policy.py:
39-376): a Net producing recurrent features, a linear categorical actor
(`CategoricalNet`, common/utils.py:61), and a linear critic. Action sampling,
log-probs and entropy are computed with pure jnp so `act` / `evaluate_actions`
jit and vmap cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avlen_tpu.models.encoders import AudioCNN, VisualCNN
from avlen_tpu.models.rnn_state_encoder import RNNStateEncoder

ORTHO_001 = nn.initializers.orthogonal(0.01)
ORTHO_1 = nn.initializers.orthogonal(1.0)
ZEROS = nn.initializers.zeros


class CategoricalHead(nn.Module):
    """Linear logits head (CategoricalNet, ss_baselines/common/utils.py:61-72)."""

    num_actions: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.num_actions, kernel_init=ORTHO_001, bias_init=ZEROS)(x)


class CriticHead(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(1, kernel_init=ORTHO_1, bias_init=ZEROS)(x)[..., 0]


def categorical_sample(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    return jax.random.categorical(key, logits, axis=-1)


def categorical_log_prob(logits: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    return jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]


def categorical_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


class AudioNavBaselineNet(nn.Module):
    """Spectrogram CNN ⊕ visual CNN → GRU (av_nav/ppo/policy.py:136-212)."""

    hidden_size: int = 512
    spectrogram_hw: Tuple[int, int] = (65, 26)
    use_rgb: bool = False
    use_depth: bool = True
    use_spectrogram: bool = True
    use_pointgoal: bool = False
    pointgoal_dim: int = 2
    rnn_type: str = "GRU"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.use_spectrogram:
            self.audio_encoder = AudioCNN(self.hidden_size, self.spectrogram_hw, dtype=self.dtype)
        if self.use_rgb or self.use_depth:
            self.visual_encoder = VisualCNN(self.hidden_size, dtype=self.dtype)
        rnn_input = (
            (self.hidden_size if self.use_spectrogram else 0)
            + (self.hidden_size if (self.use_rgb or self.use_depth) else 0)
            + (self.pointgoal_dim if self.use_pointgoal else 0)
        )
        self.state_encoder = RNNStateEncoder(rnn_input, self.hidden_size, self.rnn_type)

    def features(self, observations: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        x = []
        if self.use_pointgoal:
            x.append(observations["pointgoal_with_gps_compass"])
        if self.use_spectrogram:
            x.append(self.audio_encoder(observations["spectrogram"]))
        if self.use_rgb or self.use_depth:
            x.append(
                self.visual_encoder(
                    observations.get("rgb") if self.use_rgb else None,
                    observations.get("depth") if self.use_depth else None,
                )
            )
        return jnp.concatenate(x, axis=-1)

    def __call__(self, observations, hidden, masks):
        feats = self.features(observations)
        return self.state_encoder(feats, hidden, masks)

    def forward_sequence(self, observations, hidden, masks):
        """observations: (T, B, ...) pytree; masks (T, B)."""
        t, b = masks.shape
        flat = jax.tree.map(lambda v: v.reshape((t * b,) + v.shape[2:]), observations)
        feats = self.features(flat).reshape(t, b, -1)
        return self.state_encoder.forward_sequence(feats, hidden, masks)

    def initial_state(self, batch: int) -> jnp.ndarray:
        return self.state_encoder.initial_state(batch)


class Policy(nn.Module):
    """Actor-critic over a recurrent net (av_nav/ppo/policy.py:22-99)."""

    net: nn.Module
    num_actions: int

    def setup(self):
        self.action_head = CategoricalHead(self.num_actions)
        self.critic = CriticHead()

    def initial_state(self, batch: int) -> jnp.ndarray:
        return self.net.initial_state(batch)

    def act(self, observations, hidden, masks, key, deterministic: bool = False):
        feats, hidden = self.net(observations, hidden, masks)
        logits = self.action_head(feats)
        value = self.critic(feats)
        action = jnp.where(
            deterministic, jnp.argmax(logits, -1), categorical_sample(key, logits)
        )
        log_prob = categorical_log_prob(logits, action)
        return action, log_prob, value, hidden, logits

    def get_value(self, observations, hidden, masks):
        feats, _ = self.net(observations, hidden, masks)
        return self.critic(feats)

    def evaluate_actions(self, observations, hidden, masks, actions):
        """Sequence re-evaluation for PPO: observations (T, B, ...)."""
        feats, _ = self.net.forward_sequence(observations, hidden, masks)
        logits = self.action_head(feats)
        values = self.critic(feats)
        log_probs = categorical_log_prob(logits, actions)
        entropy = categorical_entropy(logits)
        return values, log_probs, entropy, logits
