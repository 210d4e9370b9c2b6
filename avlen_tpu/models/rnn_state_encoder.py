"""Mask-aware recurrent state encoder (GRU/LSTM).

Capability match for RNNStateEncoder (ss_baselines/av_nav/models/
rnn_state_encoder.py:11-149): a recurrent core whose hidden state is zeroed
at episode boundaries via a per-step mask, with two entry points — a
single-step forward for acting and a sequence forward for PPO re-evaluation
that is numerically identical to stepping one-by-one (pinned by
tests/test_models.py, mirroring the reference's
test_rnn_state_encoder.py equivalence test).

TPU-native: cell weights are explicit flax params and the cell math is pure
jnp, so the sequence forward is a single fused `lax.scan` over time with the
boundary-mask multiply inside — no Python loop over mask change-points like
the reference (rnn_state_encoder.py:92-144).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ORTHO = nn.initializers.orthogonal()
ZEROS = nn.initializers.zeros


class RNNStateEncoder(nn.Module):
    input_size: int
    hidden_size: int
    rnn_type: str = "GRU"  # GRU | LSTM

    @property
    def _is_lstm(self) -> bool:
        return self.rnn_type.upper() == "LSTM"

    @property
    def num_gates(self) -> int:
        return 4 if self._is_lstm else 3

    def setup(self):
        g, h, d = self.num_gates, self.hidden_size, self.input_size
        self.w_ih = self.param("w_ih", ORTHO, (d, g * h))
        self.w_hh = self.param("w_hh", ORTHO, (h, g * h))
        self.b_ih = self.param("b_ih", ZEROS, (g * h,))
        self.b_hh = self.param("b_hh", ZEROS, (g * h,))

    def initial_state(self, batch: int) -> jnp.ndarray:
        """Packed hidden: (B, H) for GRU, (B, 2H) = [h, c] for LSTM."""
        mult = 2 if self._is_lstm else 1
        return jnp.zeros((batch, mult * self.hidden_size), jnp.float32)

    def _cell(self, x: jnp.ndarray, packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One unmasked cell step: returns (output, new_packed)."""
        hsz = self.hidden_size
        gi = x @ self.w_ih + self.b_ih
        if self._is_lstm:
            h, c = packed[:, :hsz], packed[:, hsz:]
            gh = h @ self.w_hh + self.b_hh
            i, f, g, o = jnp.split(gi + gh, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return h_new, jnp.concatenate([h_new, c_new], axis=-1)
        h = packed
        gh = h @ self.w_hh + self.b_hh
        r = jax.nn.sigmoid(gi[:, :hsz] + gh[:, :hsz])
        z = jax.nn.sigmoid(gi[:, hsz : 2 * hsz] + gh[:, hsz : 2 * hsz])
        n = jnp.tanh(gi[:, 2 * hsz :] + r * gh[:, 2 * hsz :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    def __call__(self, x: jnp.ndarray, hidden: jnp.ndarray, masks: jnp.ndarray):
        """Single step: x (B, D), packed hidden, masks (B,) — 0 at episode start."""
        return self._cell(x, hidden * masks[:, None])

    def forward_sequence(self, x: jnp.ndarray, hidden: jnp.ndarray, masks: jnp.ndarray):
        """x (T, B, D), masks (T, B) → outputs (T, B, H), final packed hidden."""

        def step(h, inp):
            xt, mt = inp
            out, h_new = self._cell(xt, h * mt[:, None])
            return h_new, out

        final, outs = jax.lax.scan(step, hidden, (x, masks))
        return outs, final
