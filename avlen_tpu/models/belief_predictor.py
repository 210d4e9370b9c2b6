"""Goal-descriptor (belief) predictor.

Capability match for BeliefPredictor (ss_baselines/savi/models/
belief_predictor.py:56-230): a ResNet-18 over the 2-channel spectrogram
producing (a) a 21-way category belief and (b) a 2-d relative goal location,
fused across steps by an EMA in the *odometry* frame — predictions are
rotated between the agent's current base frame and the episode-start odom
frame with each step's pose (base_to_odom/odom_to_base,
belief_predictor.py:214-230). With a distractor, the category one-hot is
broadcast-concatenated onto the spectrogram channels (cnn_forward,
belief_predictor.py:128-140).

TPU-native: the whole update (CNN forward + frame transforms + EMA) is one
batched jit over envs; the per-env Python loop and host round-trips of the
reference are gone. Fused belief state lives in a BeliefState pytree carried
through the rollout scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avlen_tpu.models.resnet import ResNet18


class BeliefState(NamedTuple):
    last_pointgoal: jnp.ndarray  # (B, 2) odom frame
    has_pointgoal: jnp.ndarray  # (B,) f32
    last_label: jnp.ndarray  # (B, 21)
    has_label: jnp.ndarray  # (B,) f32


def init_belief_state(batch: int, num_categories: int = 21) -> BeliefState:
    return BeliefState(
        last_pointgoal=jnp.zeros((batch, 2), jnp.float32),
        has_pointgoal=jnp.zeros((batch,), jnp.float32),
        last_label=jnp.zeros((batch, num_categories), jnp.float32),
        has_label=jnp.zeros((batch,), jnp.float32),
    )


class BeliefPredictorNet(nn.Module):
    """Location regressor + category classifier towers."""

    num_categories: int = 21
    predict_label: bool = True
    predict_location: bool = True
    has_distractor_sound: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spectrogram: jnp.ndarray, category: Optional[jnp.ndarray] = None):
        """spectrogram (B, F, T, 2); category (B, 21) one-hot for distractor mode.
        Returns (location (B,2) | None, label_logits (B,21) | None)."""
        x = spectrogram
        if self.has_distractor_sound and category is not None:
            cat_maps = jnp.broadcast_to(
                category[:, None, None, :], x.shape[:3] + (category.shape[-1],)
            )
            x_loc = jnp.concatenate([x, cat_maps], axis=-1)
        else:
            x_loc = x
        location = label = None
        if self.predict_location:
            location = ResNet18(num_outputs=2, dtype=self.dtype, name="predictor")(x_loc)
        if self.predict_label:
            label = ResNet18(num_outputs=self.num_categories, dtype=self.dtype, name="classifier")(x)
        return location, label


def base_to_odom(pg_base: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """(B,2) base-frame pointgoal → odom frame (belief_predictor.py:214-221)."""
    angle = -pose[:, 2]
    d = jnp.linalg.norm(pg_base, axis=-1)
    theta = jnp.arctan2(pg_base[:, 1], pg_base[:, 0])
    return jnp.stack(
        [pose[:, 0] + d * jnp.cos(theta + angle), pose[:, 1] + d * jnp.sin(theta + angle)], -1
    )


def odom_to_base(pg_odom: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """(belief_predictor.py:223-230)."""
    angle = -pose[:, 2]
    delta = pg_odom - pose[:, :2]
    delta_theta = jnp.arctan2(delta[:, 1], delta[:, 0]) - angle
    d = jnp.linalg.norm(delta, axis=-1)
    return jnp.stack([d * jnp.cos(delta_theta), d * jnp.sin(delta_theta)], -1)


def update_beliefs(
    params,
    net: BeliefPredictorNet,
    belief_state: BeliefState,
    obs: dict,
    new_episode: jnp.ndarray,  # (B,) bool — clears the EMA like dones do
    weighting_factor: float = 0.5,
    current_pred_only: bool = False,
) -> Tuple[BeliefState, jnp.ndarray, jnp.ndarray]:
    """One belief refresh (semantics of BeliefPredictor.update,
    belief_predictor.py:141-206). Returns (state, category_belief (B,21),
    location_belief (B,2)) — the values the reference writes into the
    CategoryBelief/LocationBelief observation slots."""
    spec = obs["spectrogram"]
    pose = obs["pose"]
    b = spec.shape[0]
    has_audio = (jnp.abs(spec).sum(axis=(1, 2, 3)) != 0).astype(jnp.float32)

    location, label_logits = net.apply(params, spec, obs.get("category"))
    w = weighting_factor

    cleared = new_episode
    has_pg = jnp.where(cleared, 0.0, belief_state.has_pointgoal)
    has_lb = jnp.where(cleared, 0.0, belief_state.has_label)

    # ---- location belief
    # predicted frame: X rightward, -Y forward → base frame (forward, rightward)
    pg_base = jnp.stack([-location[:, 1], location[:, 0]], -1)
    last_in_base = odom_to_base(belief_state.last_pointgoal, pose)
    if current_pred_only:
        pg_avg_audio = pg_base
    else:
        pg_avg_audio = jnp.where(
            has_pg[:, None] > 0, (1 - w) * pg_base + w * last_in_base, pg_base
        )
    pg_avg_silent = jnp.where(has_pg[:, None] > 0, last_in_base, jnp.full((b, 2), 10.0))
    pg_avg = jnp.where(has_audio[:, None] > 0, pg_avg_audio, pg_avg_silent)
    new_last_pg = jnp.where(
        has_audio[:, None] > 0, base_to_odom(pg_avg, pose), belief_state.last_pointgoal
    )
    new_has_pg = jnp.maximum(has_pg, has_audio)

    # ---- label belief
    lb = label_logits
    if current_pred_only:
        lb_avg_audio = lb
    else:
        lb_avg_audio = jnp.where(
            has_lb[:, None] > 0, (1 - w) * lb + w * belief_state.last_label, lb
        )
    uniform = jnp.full_like(lb, 1.0 / lb.shape[-1])
    lb_avg_silent = jnp.where(has_lb[:, None] > 0, belief_state.last_label, uniform)
    lb_avg = jnp.where(has_audio[:, None] > 0, lb_avg_audio, lb_avg_silent)
    new_last_lb = jnp.where(has_audio[:, None] > 0, lb_avg, belief_state.last_label)
    new_has_lb = jnp.maximum(has_lb, has_audio)

    new_state = BeliefState(
        last_pointgoal=new_last_pg,
        has_pointgoal=new_has_pg,
        last_label=new_last_lb,
        has_label=new_has_lb,
    )
    return new_state, lb_avg, pg_avg
