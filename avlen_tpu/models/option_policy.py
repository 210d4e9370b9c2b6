"""Query/option policy π_q.

Capability match for AudioNavOptionPolicy / AudioNavOptionNet
(ss_baselines/savi/ppo/policy.py:286-327, 919-1114): SMT features augmented
with a query-state embedding (sinusoidal query-count encoding built by the
trainer, ddppo_trainer.py:301-513), the memory entry stores
concat(features, last_query_info) (policy.py:1062-1065), and the heads are a
2-action option distribution, a critic, and the auxiliary **uncertainty**
2-class head trained with CE (CriticHead2 / unct loss, savi/ppo/policy.py:
46-61, ppo.py:254-261).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avlen_tpu.models.policy import (
    CategoricalHead,
    CriticHead,
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
)
from avlen_tpu.models.smt import SMTStateEncoder
from avlen_tpu.models.smt_cnn import SMTCNN
from avlen_tpu.models.encoders import AudioCNN

KAIMING = nn.initializers.kaiming_normal()


class AudioNavOptionNet(nn.Module):
    spectrogram_hw: Tuple[int, int] = (65, 26)
    num_actions: int = 4  # low-level action count (for prev-action embedding)
    d_model: int = 256
    nhead: int = 8
    use_rgb: bool = True
    use_depth: bool = True
    use_belief_as_goal: bool = True
    use_label_belief: bool = True
    use_location_belief: bool = True
    query_count_emb_size: int = 32
    pretraining: bool = False
    smt_fused: bool = False  # fused Pallas SMT encode (TPU.PALLAS_SMT)
    num_categories: int = 21
    dtype: jnp.dtype = jnp.float32

    @property
    def base_feature_size(self) -> int:
        visual = 64 * (int(self.use_rgb) + int(self.use_depth))
        return visual + 16 + 128 + 4

    @property
    def feature_size(self) -> int:
        # query-state embedding appended after pose (policy.py:978-982)
        return self.base_feature_size + self.query_count_emb_size

    @property
    def pose_indices(self) -> Tuple[int, int]:
        return (self.base_feature_size - 4, self.base_feature_size)

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

    def get_base_features(self, obs: Dict[str, jnp.ndarray], prev_actions: jnp.ndarray) -> jnp.ndarray:
        parts = [
            self.visual_encoder(obs.get("rgb"), obs.get("depth")),
            self.action_encoder(jax.nn.one_hot(prev_actions, self.num_actions)),
            self.goal_encoder(obs["spectrogram"]),
            obs["pose"],
        ]
        return jnp.concatenate(parts, axis=-1)

    def belief_goal(self, obs):
        if not self.use_belief_as_goal:
            return None
        b = obs["pose"].shape[0]
        belief = jnp.zeros((b, self.d_model), jnp.float32)
        if self.use_label_belief:
            belief = belief.at[:, : self.num_categories].set(obs["category_belief"])
        if self.use_location_belief:
            belief = belief.at[:, self.num_categories : self.num_categories + 2].set(obs["location_belief"])
        return belief

    def __call__(
        self,
        obs,
        prev_actions,
        memory_feats,  # (B, M, feature_size) entries = concat(x, last_query_info)
        memory_valid,
        query_state,  # (B, query_count_emb_size)
        last_query_info,  # (B, query_count_emb_size)
    ):
        """Returns (attended state, memory entry concat(x, last_query_info))."""
        x = self.get_base_features(obs, prev_actions)
        x_query = jnp.concatenate([x, query_state], axis=-1)
        att = self.smt(x_query, memory_feats, memory_valid, goal=self.belief_goal(obs))
        x_for_memory = jax.lax.stop_gradient(jnp.concatenate([x, last_query_info], axis=-1))
        return att, x_for_memory


class OptionPolicy(nn.Module):
    """π_q heads: 2-action option distribution + critic + uncertainty head
    (savi/ppo/policy.py:46-61, act_option :98-127)."""

    net: AudioNavOptionNet

    def setup(self):
        self.action_head = CategoricalHead(2)
        self.critic = CriticHead()
        self.uncertainty_head = nn.Dense(2, kernel_init=KAIMING, name="uncertainty")

    def act(
        self, obs, prev_actions, memory_feats, memory_valid,
        query_state, last_query_info, key, deterministic: bool = False,
    ):
        att, x_mem = self.net(obs, prev_actions, memory_feats, memory_valid, query_state, last_query_info)
        logits = self.action_head(att)
        value = self.critic(att)
        unct_logits = self.uncertainty_head(att)
        action = jnp.where(deterministic, jnp.argmax(logits, -1), categorical_sample(key, logits))
        return action, categorical_log_prob(logits, action), value, x_mem, logits, unct_logits

    def evaluate_step(
        self, obs, prev_actions, memory_feats, memory_valid,
        query_state, last_query_info, actions,
    ):
        att, x_mem = self.net(obs, prev_actions, memory_feats, memory_valid, query_state, last_query_info)
        logits = self.action_head(att)
        value = self.critic(att)
        unct_logits = self.uncertainty_head(att)
        return value, categorical_log_prob(logits, actions), categorical_entropy(logits), logits, unct_logits, x_mem
