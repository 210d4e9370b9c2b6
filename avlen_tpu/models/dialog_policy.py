"""Language (dialog) policy π_l.

Capability match for AudioNavDialogPolicy / AudioNavDialogNet
(ss_baselines/savi/ppo/policy.py:203-283, 679-916): the SMT encoder path of
π_g plus a CLIP-grounded dialog stage — the oracle instruction is embedded
with the frozen CLIP text tower, projected by `dialog_layer`, and a second
transformer (DialogStateEncoder) attends over the short state memory of SMT
states within the dialog window. Trained supervised against oracle actions
(PPO.update_dialog, savi/ppo/ppo.py:99-154).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avlen_tpu.models.clip_text import CLIPTextEncoder
from avlen_tpu.models.dialog_encoder import DialogStateEncoder
from avlen_tpu.models.policy import (
    CategoricalHead,
    CriticHead,
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
)
from avlen_tpu.models.smt_policy import AudioNavSMTNet

KAIMING = nn.initializers.kaiming_normal()


class AudioNavDialogNet(nn.Module):
    spectrogram_hw: Tuple[int, int] = (65, 26)
    num_actions: int = 4
    d_model: int = 256
    nhead: int = 8
    use_rgb: bool = True
    use_depth: bool = True
    use_belief_as_goal: bool = True
    use_label_belief: bool = True
    use_location_belief: bool = True
    pretraining: bool = False
    smt_fused: bool = False  # fused Pallas SMT encode (TPU.PALLAS_SMT)
    clip_width: int = 512
    clip_layers: int = 12
    num_categories: int = 21
    dtype: jnp.dtype = jnp.float32

    @property
    def feature_size(self) -> int:
        return self.smt_net.feature_size

    def setup(self):
        self.smt_net = AudioNavSMTNet(
            spectrogram_hw=self.spectrogram_hw,
            num_actions=self.num_actions,
            d_model=self.d_model,
            nhead=self.nhead,
            use_rgb=self.use_rgb,
            use_depth=self.use_depth,
            use_belief_as_goal=self.use_belief_as_goal,
            use_label_belief=self.use_label_belief,
            use_location_belief=self.use_location_belief,
            pretraining=self.pretraining,
            num_categories=self.num_categories,
            dtype=self.dtype,
            smt_fused=self.smt_fused,
        )
        self.clip = CLIPTextEncoder(width=self.clip_width, layers=self.clip_layers, dtype=self.dtype)
        self.dialog_layer = nn.Dense(self.d_model, kernel_init=KAIMING)
        self.dialog_state_encoder = DialogStateEncoder(
            state_size=self.d_model,
            dialog_emb_size=self.d_model,
            d_model=self.d_model,
            nhead=self.nhead,
            dtype=self.dtype,
        )

    def clip_embed(self, dialog_tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, 77) tokens → (B, clip_width) FROZEN CLIP text features.

        Exposed so callers can run the (frozen, stop-gradient) tower ONCE
        per trajectory row and reuse the embedding across the π_l replay-CE
        epochs — re-running 12 transformer layers per evaluate_step was
        ~17% of the interactive superstep's device time (r4 profile)."""
        return jax.lax.stop_gradient(self.clip(dialog_tokens))

    def encode_dialog(self, dialog_tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, 77) tokens → (B, d_model). CLIP runs frozen (policy.py:847-849)."""
        return self.dialog_layer(self.clip_embed(dialog_tokens))

    def __call__(
        self,
        obs: Dict[str, jnp.ndarray],
        prev_actions: jnp.ndarray,
        memory_feats: jnp.ndarray,
        memory_valid: jnp.ndarray,
        state_memory: jnp.ndarray,  # (B, Md, d_model) past x_att states
        state_memory_valid: jnp.ndarray,  # (B, Md)
        dialog_tokens: Optional[jnp.ndarray],  # (B, 77)
        agent_step: jnp.ndarray,  # (B,)
        dialog_clip: Optional[jnp.ndarray] = None,  # (B, clip_width) precomputed
    ):
        """Returns (x_att_dialog (B, d_model), features (B, F), x_att (B, d_model)).

        ``dialog_clip``: optional precomputed frozen CLIP embedding (see
        clip_embed) — skips the in-call text tower."""
        x = self.smt_net.get_features(obs, prev_actions)
        belief = self.smt_net.belief_goal(obs)
        x_att = self.smt_net.smt(x, memory_feats, memory_valid, goal=belief)
        if dialog_clip is not None:
            dialog_emb = self.dialog_layer(jax.lax.stop_gradient(dialog_clip))
        else:
            dialog_emb = self.encode_dialog(dialog_tokens) if dialog_tokens is not None else None
        goal = belief if belief is not None else jnp.zeros((x.shape[0], self.d_model), jnp.float32)
        x_att_dialog = self.dialog_state_encoder(
            x_att, state_memory, state_memory_valid, dialog_emb, agent_step, goal
        )
        return x_att_dialog, x, x_att


class DialogPolicy(nn.Module):
    """Actor-critic over AudioNavDialogNet (π_l; act_dialog of
    savi/ppo/policy.py:130-162)."""

    net: AudioNavDialogNet

    def setup(self):
        self.action_head = CategoricalHead(self.net.num_actions)
        self.critic = CriticHead()

    def clip_embed(self, dialog_tokens):
        return self.net.clip_embed(dialog_tokens)

    def act(
        self, obs, prev_actions, memory_feats, memory_valid,
        state_memory, state_memory_valid, dialog_tokens, agent_step,
        key, deterministic: bool = False, dialog_clip=None,
    ):
        att, x, x_att = self.net(
            obs, prev_actions, memory_feats, memory_valid,
            state_memory, state_memory_valid, dialog_tokens, agent_step,
            dialog_clip=dialog_clip,
        )
        logits = self.action_head(att)
        value = self.critic(att)
        action = jnp.where(deterministic, jnp.argmax(logits, -1), categorical_sample(key, logits))
        return action, categorical_log_prob(logits, action), value, x, x_att, logits

    def evaluate_step(
        self, obs, prev_actions, memory_feats, memory_valid,
        state_memory, state_memory_valid, dialog_tokens, agent_step, actions,
        dialog_clip=None,
    ):
        att, x, x_att = self.net(
            obs, prev_actions, memory_feats, memory_valid,
            state_memory, state_memory_valid, dialog_tokens, agent_step,
            dialog_clip=dialog_clip,
        )
        logits = self.action_head(att)
        value = self.critic(att)
        return value, categorical_log_prob(logits, actions), categorical_entropy(logits), logits, x, x_att
