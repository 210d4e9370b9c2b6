"""Visual question generation (VQG) — vestigial, as in the reference.

The reference ships a VQG model (ss_baselines/savi/dialog/ques_gen/:
ResNet-18 image encoder + LSTM question decoder, iq_vln.py:20-203) whose
instantiation is commented out in the simulator
(soundspaces/simulator.py:199-204); only its `Vocabulary` is loaded by the
trainer (ddppo_trainer.py:51-52, 80-81). This module preserves that surface:
a question vocabulary plus a small image→question generator usable offline.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from avlen_tpu.dialog.speaker.vocab import Vocabulary
from avlen_tpu.models.resnet import ResNet18

QUESTION_WORDS = ["what", "where", "is", "this", "that", "which", "way", "should", "i", "do", "how", "?"]


def ques_vocabulary() -> Vocabulary:
    """The Vocabulary the trainer loads (ddppo_trainer.py:80-81 equivalent)."""
    return Vocabulary(extra_words=QUESTION_WORDS)


class QuesGen(nn.Module):
    """Image → question tokens (iq_vln.py capability; vestigial at runtime)."""

    vocab_size: int
    hidden_size: int = 128
    max_len: int = 12

    @nn.compact
    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        """rgb (B, H, W, 3) uint8 → (B, max_len) token ids (argmax decode)."""
        feat = ResNet18(num_outputs=self.hidden_size)(rgb.astype(jnp.float32) / 255.0)
        embed = nn.Embed(self.vocab_size, self.hidden_size)
        w_out = nn.Dense(self.vocab_size)
        cell_in = nn.Dense(4 * self.hidden_size)
        h = feat
        c = jnp.zeros_like(feat)
        word = jnp.ones((rgb.shape[0],), jnp.int32)  # BOS
        outs = []
        for _ in range(self.max_len):
            gates = cell_in(jnp.concatenate([embed(word), h], -1))
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            word = jnp.argmax(w_out(h), -1).astype(jnp.int32)
            outs.append(word)
        return jnp.stack(outs, axis=1)


def ques_out(params, model: QuesGen, vocab: Vocabulary, rgb) -> List[str]:
    """QuesGen.ques_out equivalent (ques_gen.py:122)."""
    ids = model.apply(params, rgb)
    return [" ".join(vocab.decode(row)) for row in jnp.asarray(ids)]
