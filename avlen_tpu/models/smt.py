"""Scene Memory Transformer state encoder (Flax).

Capability match for SMTStateEncoder (ss_baselines/savi/models/
smt_state_encoder.py:23-281): fusion MLP → 1-layer transformer encoder over
the external memory plus the current step, → 1-layer decoder whose single
query is the belief/goal vector (or the current entry when no goal), with
**relative pose re-encoding**: every memory entry's (x, y, heading, t) pose
slice is re-expressed in the current agent frame and formatted as
(x, y, cosθ, sinθ, e^{-t}) → Linear(5→16) before fusion
(smt_state_encoder.py:210-276). Pretraining mode masks all memory except the
current step (smt_state_encoder.py:126-129). Transformer math follows the
post-LN torch ``nn.Transformer`` layer layout the reference instantiates.

Layout differences (TPU-native): memory is batch-first (B, M, F); masks are
(B, M) with 1 = valid; attention uses additive -inf masking of invalid keys.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

KAIMING = nn.initializers.kaiming_normal()
NEG_INF = -1e9


def compute_relative_pose(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """pose_b in pose_a's frame; poses are (..., 3) = (x, y, heading) with the
    reference's convention (heading measured from x to -y)
    (smt_state_encoder.py:238-264)."""
    heading_a = -pose_a[..., 2]
    heading_b = -pose_b[..., 2]
    r = jnp.linalg.norm(pose_a[..., :2] - pose_b[..., :2], axis=-1)
    phi = jnp.arctan2(pose_b[..., 1] - pose_a[..., 1], pose_b[..., 0] - pose_a[..., 0]) - heading_a
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    heading = heading_b - heading_a
    heading = jnp.arctan2(jnp.sin(heading), jnp.cos(heading))
    return jnp.stack([x, y, -heading], axis=-1)


def format_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """(x, y, heading, t) → (x, y, cosθ, sinθ, e^{-t}) (smt_state_encoder.py:266-274)."""
    x, y, heading, t = jnp.moveaxis(pose, -1, 0)
    return jnp.stack([x, y, jnp.cos(heading), jnp.sin(heading), jnp.exp(-t)], axis=-1)


class MultiHeadAttention(nn.Module):
    d_model: int
    nhead: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_valid: Optional[jnp.ndarray] = None):
        """q (B, Lq, D), k/v (B, Lk, D), key_valid (B, Lk) 1=attendable."""
        d_head = self.d_model // self.nhead
        dense = lambda name: nn.DenseGeneral((self.nhead, d_head), kernel_init=KAIMING, dtype=self.dtype, name=name)
        qh = dense("q")(q)
        kh = dense("k")(k)
        vh = dense("v")(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(d_head).astype(qh.dtype)
        if key_valid is not None:
            logits = logits + jnp.where(key_valid[:, None, None, :], 0.0, NEG_INF).astype(logits.dtype)
        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        return nn.DenseGeneral(self.d_model, axis=(-2, -1), kernel_init=KAIMING, dtype=self.dtype, name="out")(out)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_valid):
        a = MultiHeadAttention(self.d_model, self.nhead, self.dtype)(src, src, src, src_valid)
        src = nn.LayerNorm(dtype=self.dtype)(src + a)
        f = nn.Dense(self.dim_feedforward, kernel_init=KAIMING, dtype=self.dtype)(src)
        f = nn.Dense(self.d_model, kernel_init=KAIMING, dtype=self.dtype)(nn.relu(f))
        return nn.LayerNorm(dtype=self.dtype)(src + f)


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, mem, mem_valid):
        a = MultiHeadAttention(self.d_model, self.nhead, self.dtype, name="self_attn")(tgt, tgt, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + a)
        a = MultiHeadAttention(self.d_model, self.nhead, self.dtype, name="cross_attn")(tgt, mem, mem, mem_valid)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + a)
        f = nn.Dense(self.dim_feedforward, kernel_init=KAIMING, dtype=self.dtype)(tgt)
        f = nn.Dense(self.d_model, kernel_init=KAIMING, dtype=self.dtype)(nn.relu(f))
        return nn.LayerNorm(dtype=self.dtype)(tgt + f)


class SMTStateEncoder(nn.Module):
    input_size: int
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    pose_indices: Optional[Tuple[int, int]] = None
    pretraining: bool = False
    dtype: jnp.dtype = jnp.float32
    # run the transformer stack as ONE fused Pallas kernel (ops/pallas_smt.py)
    # — same param tree, same numbers; init and non-1-layer configs fall back
    # to the reference path below
    fused: bool = False
    fused_b_tile: int = 8

    @property
    def hidden_state_size(self) -> int:
        return self.d_model

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, F) current step features
        memory: jnp.ndarray,  # (B, M, F)
        memory_masks: jnp.ndarray,  # (B, M) 1 = valid
        goal: Optional[jnp.ndarray] = None,  # (B, d_model)
    ) -> jnp.ndarray:
        b, m, _ = memory.shape

        if self.pretraining:
            memory_masks = jnp.zeros_like(memory_masks)
        valid = jnp.concatenate([memory_masks, jnp.ones((b, 1), memory_masks.dtype)], axis=1)

        if self.pose_indices is not None:
            pi, pj = self.pose_indices
            pose_enc = nn.Dense(16, kernel_init=KAIMING, name="pose_encoder")
            x_pose = x[:, pi:pj]  # (B, 4): x, y, heading, t
            mem_pose = memory[:, :, pi:pj]
            agent_rel = compute_relative_pose(x_pose[:, :3], x_pose[:, :3])
            agent_fmt = format_pose(jnp.concatenate([agent_rel, x_pose[:, 3:4]], -1))
            mem_rel = compute_relative_pose(x_pose[:, None, :3], mem_pose[..., :3])
            mem_fmt = format_pose(jnp.concatenate([mem_rel, mem_pose[..., 3:4]], -1))
            x = jnp.concatenate([x[:, :pi], pose_enc(agent_fmt), x[:, pj:]], axis=-1)
            memory = jnp.concatenate(
                [memory[..., :pi], pose_enc(mem_fmt), memory[..., pj:]], axis=-1
            )

        entries = jnp.concatenate([memory, x[:, None, :]], axis=1)  # (B, M+1, F')

        if (
            self.fused
            and not self.is_initializing()
            and self.num_encoder_layers == 1
            and self.num_decoder_layers == 1
        ):
            import jax

            from avlen_tpu.ops.pallas_smt import smt_encode

            return smt_encode(
                self.variables["params"],
                entries.astype(jnp.float32),
                valid,
                None if goal is None else goal.astype(jnp.float32),
                self.nhead,
                self.fused_b_tile,
                jax.default_backend() != "tpu",  # interpret off-TPU (tests)
            )

        h = nn.Dense(self.d_model, kernel_init=KAIMING, dtype=self.dtype, name="fusion0")(entries)
        h = nn.Dense(self.d_model, kernel_init=KAIMING, dtype=self.dtype, name="fusion1")(nn.relu(h))

        for i in range(self.num_encoder_layers):
            h = TransformerEncoderLayer(self.d_model, self.nhead, self.d_model, self.dtype, name=f"enc{i}")(h, valid)

        tgt = goal[:, None, :] if goal is not None else h[:, -1:, :]
        for i in range(self.num_decoder_layers):
            tgt = TransformerDecoderLayer(self.d_model, self.nhead, self.d_model, self.dtype, name=f"dec{i}")(tgt, h, valid)
        return tgt[:, 0, :].astype(jnp.float32)
