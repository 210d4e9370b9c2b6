"""SMT-based audio-visual navigation policy (π_g of SAVi/AVLEN).

Capability match for AudioNavSMTPolicy / AudioNavSMTNet (ss_baselines/savi/
ppo/policy.py:330-377, 501-674): features = SMTCNN(rgb,depth) 128 ⊕
action-embedding 16 ⊕ AudioCNN(spectrogram) 128 ⊕ pose 4 = 276-d, attended
by the Scene Memory Transformer whose decoder query is the belief vector
(category belief in [:21], location belief in [21:23] of a d_model-zero
vector — policy.py:605-621), with categorical actor + critic heads.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avlen_tpu.models.encoders import AudioCNN
from avlen_tpu.models.policy import (
    CategoricalHead,
    CriticHead,
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
)
from avlen_tpu.models.smt import SMTStateEncoder
from avlen_tpu.models.smt_cnn import SMTCNN

KAIMING = nn.initializers.kaiming_normal()


class AudioNavSMTNet(nn.Module):
    spectrogram_hw: Tuple[int, int] = (65, 26)
    num_actions: int = 4
    d_model: int = 256
    nhead: int = 8
    use_rgb: bool = True
    use_depth: bool = True
    use_belief_as_goal: bool = True
    use_label_belief: bool = True
    use_location_belief: bool = True
    normalize_category_distribution: bool = False
    use_category_input: bool = False
    pretraining: bool = False
    num_categories: int = 21
    dtype: jnp.dtype = jnp.float32
    smt_fused: bool = False  # fused Pallas SMT encode (TPU.PALLAS_SMT)

    @property
    def feature_size(self) -> int:
        visual = 64 * (int(self.use_rgb) + int(self.use_depth))
        return visual + 16 + 128 + (self.num_categories if self.use_category_input else 0) + 4

    @property
    def pose_indices(self) -> Tuple[int, int]:
        return (self.feature_size - 4, self.feature_size)

    def setup(self):
        self.goal_encoder = AudioCNN(128, self.spectrogram_hw, dtype=self.dtype)
        self.visual_encoder = SMTCNN(use_rgb=self.use_rgb, use_depth=self.use_depth, dtype=self.dtype)
        self.action_encoder = nn.Dense(16, kernel_init=KAIMING)
        self.smt = SMTStateEncoder(
            input_size=self.feature_size,
            d_model=self.d_model,
            nhead=self.nhead,
            pose_indices=self.pose_indices,
            pretraining=self.pretraining,
            dtype=self.dtype,
            fused=self.smt_fused,
        )

    def get_features(self, obs: Dict[str, jnp.ndarray], prev_actions: jnp.ndarray) -> jnp.ndarray:
        """(B, feature_size); prev_actions (B,) int32 (one-hot embedded,
        policy.py:629-637, 664-676)."""
        parts = []
        if self.use_rgb or self.use_depth:
            parts.append(self.visual_encoder(obs.get("rgb"), obs.get("depth")))
        parts += [
            self.action_encoder(jax.nn.one_hot(prev_actions, self.num_actions)),
            self.goal_encoder(obs["spectrogram"]),
        ]
        if self.use_category_input:
            parts.append(obs["category"])
        parts.append(obs["pose"])
        return jnp.concatenate(parts, axis=-1)

    def belief_goal(self, obs: Dict[str, jnp.ndarray]) -> Optional[jnp.ndarray]:
        if not self.use_belief_as_goal:
            return None
        b = obs["pose"].shape[0]
        belief = jnp.zeros((b, self.d_model), jnp.float32)
        if self.use_label_belief:
            cat = obs["category_belief"]
            if self.normalize_category_distribution:
                cat = jax.nn.softmax(cat, axis=-1)
            belief = belief.at[:, : self.num_categories].set(cat)
        if self.use_location_belief:
            belief = belief.at[:, self.num_categories : self.num_categories + 2].set(obs["location_belief"])
        return belief

    def __call__(self, obs, prev_actions, memory_feats, memory_valid):
        """Returns (attended state (B, d_model), raw features (B, F))."""
        x = self.get_features(obs, prev_actions)
        att = self.smt(x, memory_feats, memory_valid, goal=self.belief_goal(obs))
        return att, x

    def forward_with_features(self, obs, features, memory_feats, memory_valid):
        """Like __call__ but with externally supplied current features."""
        att = self.smt(features, memory_feats, memory_valid, goal=self.belief_goal(obs))
        return att


class SMTPolicy(nn.Module):
    """Actor-critic over AudioNavSMTNet (the goal policy π_g)."""

    net: AudioNavSMTNet

    def setup(self):
        self.action_head = CategoricalHead(self.net.num_actions)
        self.critic = CriticHead()

    def act(self, obs, prev_actions, memory_feats, memory_valid, key, deterministic: bool = False):
        att, x = self.net(obs, prev_actions, memory_feats, memory_valid)
        logits = self.action_head(att)
        value = self.critic(att)
        action = jnp.where(deterministic, jnp.argmax(logits, -1), categorical_sample(key, logits))
        return action, categorical_log_prob(logits, action), value, x, logits

    def evaluate_step(self, obs, prev_actions, memory_feats, memory_valid, actions):
        """One step of PPO re-evaluation (scanned over T outside)."""
        att, x = self.net(obs, prev_actions, memory_feats, memory_valid)
        logits = self.action_head(att)
        value = self.critic(att)
        return value, categorical_log_prob(logits, actions), categorical_entropy(logits), logits, x

    def evaluate_step_frozen(self, obs, prev_actions, memory_feats, memory_valid, actions):
        """PPO re-evaluation under SCENE_MEMORY_TRANSFORMER.freeze_encoders
        (reference policy.py:646-656; savi.yaml:45 sets it for stage 2).

        The frozen goal/visual/action towers make the step feature a pure
        function of (obs, prev_action) and the frozen params, so the stored
        rollout feature ``obs["__feature"]`` IS the tower output — the
        towers are skipped entirely and gradients reach only the SMT
        transformer + heads, exactly the reference's requires_grad=False
        split. This removes the dominant per-epoch cost of the update (the
        2x GroupNorm-resnet18 + AudioCNN recompute per (t, b) per epoch)."""
        att = self.net.forward_with_features(
            obs, obs["__feature"], memory_feats, memory_valid
        )
        logits = self.action_head(att)
        value = self.critic(att)
        return (
            value,
            categorical_log_prob(logits, actions),
            categorical_entropy(logits),
            logits,
            obs["__feature"],
        )

    def get_value(self, obs, prev_actions, memory_feats, memory_valid):
        att, _ = self.net(obs, prev_actions, memory_feats, memory_valid)
        return self.critic(att)
