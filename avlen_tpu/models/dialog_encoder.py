"""Dialog state encoder (second transformer of π_l).

Capability match for DialogStateEncoder (ss_baselines/savi/models/
dialog_state_encoder.py:43-249): attends over the short state memory of past
SMT state encodings within the dialog window plus the current one, each entry
concatenated with the CLIP dialog embedding, fused to d_model, offset by a
sinusoidal positional encoding indexed by the agent's dialog-window step
(dialog_state_encoder.py:18-40: pe[agent_step] added to every entry), then a
1-enc/1-dec transformer whose decoder query is the belief vector.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from avlen_tpu.models.smt import TransformerDecoderLayer, TransformerEncoderLayer

KAIMING = nn.initializers.kaiming_normal()


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class DialogStateEncoder(nn.Module):
    state_size: int  # size of each state-memory entry (d_model of the SMT)
    dialog_emb_size: int  # projected dialog embedding size
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    max_len: int = 100
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_att: jnp.ndarray,  # (B, state_size) current SMT state
        memory_state: jnp.ndarray,  # (B, M, state_size) past SMT states
        memory_masks: jnp.ndarray,  # (B, M)
        dialog_emb: Optional[jnp.ndarray],  # (B, dialog_emb_size)
        agent_step: jnp.ndarray,  # (B,) i32 step within the dialog window
        goal: jnp.ndarray,  # (B, d_model) belief decoder query
    ) -> jnp.ndarray:
        b, m, _ = memory_state.shape
        valid = jnp.concatenate([memory_masks, jnp.ones((b, 1), memory_masks.dtype)], axis=1)
        entries = jnp.concatenate([memory_state, x_att[:, None, :]], axis=1)  # (B, M+1, S)

        if dialog_emb is not None:
            d = jnp.broadcast_to(dialog_emb[:, None, :], (b, m + 1, dialog_emb.shape[-1]))
            entries = jnp.concatenate([entries, d], axis=-1)
            h = nn.Dense(self.d_model, kernel_init=KAIMING, dtype=self.dtype, name="fusion0")(entries)
            h = nn.Dense(self.d_model, kernel_init=KAIMING, dtype=self.dtype, name="fusion1")(nn.relu(h))
        else:
            h = entries

        pe = jnp.asarray(sinusoidal_table(self.max_len, self.d_model))
        h = h + pe[jnp.clip(agent_step, 0, self.max_len - 1)][:, None, :]

        for i in range(self.num_encoder_layers):
            h = TransformerEncoderLayer(self.d_model, self.nhead, self.d_model, self.dtype, name=f"enc{i}")(h, valid)
        tgt = goal[:, None, :]
        for i in range(self.num_decoder_layers):
            tgt = TransformerDecoderLayer(self.d_model, self.nhead, self.d_model, self.dtype, name=f"dec{i}")(tgt, h, valid)
        return tgt[:, 0, :].astype(jnp.float32)
