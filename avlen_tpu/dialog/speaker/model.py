"""Neural speaker: LSTM seq2seq with attention (Flax).

Capability match for Seq2SeqSpeaker = SpeakerEncoderLSTM + SpeakerDecoderLSTM
(ss_baselines/savi/dialog/speaker/tasks/R2R/model.py:412-526): a path
encoder LSTM over per-step (action embedding ⊕ world feature) inputs and an
attention decoder LSTM emitting instruction words by argmax rollout
(speaker.py:131-212). The reference's world features are precomputed
ResNet-152 panorama embeddings; in the synthetic world the per-step feature
is the path geometry itself (action one-hot ⊕ motion delta ⊕ heading).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

KAIMING = nn.initializers.kaiming_normal()


class PathEncoderLSTM(nn.Module):
    hidden_size: int = 256
    action_emb: int = 32

    @nn.compact
    def __call__(self, actions: jnp.ndarray, world_feats: jnp.ndarray, lengths: jnp.ndarray):
        """actions (B, L) i32; world_feats (B, L, D); lengths (B,).
        Returns (ctx (B, L, H), (h, c))."""
        a = nn.Embed(8, self.action_emb, name="action_embedding")(actions)
        x = jnp.concatenate([a, world_feats], axis=-1)
        x = nn.Dense(self.hidden_size, kernel_init=KAIMING)(x)
        b = actions.shape[0]
        carry = (
            jnp.zeros((b, self.hidden_size), x.dtype),
            jnp.zeros((b, self.hidden_size), x.dtype),
        )
        ScanLSTM = nn.scan(
            nn.OptimizedLSTMCell, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        carry, ctx = ScanLSTM(features=self.hidden_size, name="encoder_lstm")(carry, x)
        mask = (jnp.arange(ctx.shape[1])[None, :] < lengths[:, None]).astype(ctx.dtype)
        ctx = ctx * mask[..., None]
        return ctx, carry


class AttnDecoderLSTM(nn.Module):
    vocab_size: int
    hidden_size: int = 256
    word_emb: int = 128

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.word_emb)
        self.cell = nn.OptimizedLSTMCell(features=self.hidden_size)
        self.attn_q = nn.Dense(self.hidden_size, kernel_init=KAIMING)
        self.out = nn.Dense(self.vocab_size, kernel_init=KAIMING)

    def step(self, carry, word: jnp.ndarray, ctx: jnp.ndarray, ctx_mask: jnp.ndarray):
        """One decode step. word (B,) i32; ctx (B, L, H); ctx_mask (B, L)."""
        w = self.embedding(word)
        carry, h = self.cell(carry, w)
        q = self.attn_q(h)  # (B, H)
        scores = jnp.einsum("bh,blh->bl", q, ctx) / jnp.sqrt(self.hidden_size)
        scores = jnp.where(ctx_mask > 0, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        attended = jnp.einsum("bl,blh->bh", attn, ctx)
        logits = self.out(jnp.concatenate([h, attended], axis=-1))
        return carry, logits


class Seq2SeqSpeaker(nn.Module):
    vocab_size: int
    hidden_size: int = 256
    world_feat_dim: int = 8
    max_decode_len: int = 40

    def setup(self):
        self.encoder = PathEncoderLSTM(hidden_size=self.hidden_size)
        self.decoder = AttnDecoderLSTM(vocab_size=self.vocab_size, hidden_size=self.hidden_size)

    def encode(self, actions, world_feats, lengths):
        return self.encoder(actions, world_feats, lengths)

    def teacher_logits(self, actions, world_feats, lengths, target_words):
        """Teacher-forced logits for training: target_words (B, T) starting
        with BOS. Returns (B, T, V) logits predicting the next word."""
        ctx, carry = self.encode(actions, world_feats, lengths)
        ctx_mask = (jnp.arange(ctx.shape[1])[None, :] < lengths[:, None]).astype(jnp.float32)

        def step(c, w):
            c2, logits = self.decoder.step(c[0], w, ctx, ctx_mask)
            return (c2,), logits

        # scan over time with params shared
        t = target_words.shape[1]
        logits = []
        c = (carry,)
        for i in range(t):
            c, lg = step(c, target_words[:, i])
            logits.append(lg)
        return jnp.stack(logits, axis=1)

    def scheduled_logits(self, actions, world_feats, lengths, target_words, key, sample_prob):
        """Scheduled-sampling logits (Bengio et al. 2015): at each decode
        step the input token is the gold word with prob (1 - sample_prob) or
        the model's own argmax prediction otherwise — closing the exposure
        bias that capped the teacher-forced speaker at BLEU 0.77 despite
        ~100% token accuracy. ``sample_prob`` may be a traced scalar (the
        trainer ramps it over training)."""
        ctx, carry = self.encode(actions, world_feats, lengths)
        ctx_mask = (jnp.arange(ctx.shape[1])[None, :] < lengths[:, None]).astype(jnp.float32)
        b, t = target_words.shape
        word = target_words[:, 0]  # BOS
        c = carry
        logits_list = []
        for i in range(t):
            c, lg = self.decoder.step(c, word, ctx, ctx_mask)
            logits_list.append(lg)
            if i + 1 < t:
                key, sub = jax.random.split(key)
                use_model = jax.random.uniform(sub, (b,)) < sample_prob
                model_word = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                word = jnp.where(use_model, model_word, target_words[:, i + 1])
        return jnp.stack(logits_list, axis=1)

    def rollout(self, actions, world_feats, lengths, bos_id: int, eos_id: int):
        """Argmax decode (speaker.py:131-212 pipeline path). Returns (B, T) ids."""
        ctx, carry = self.encode(actions, world_feats, lengths)
        ctx_mask = (jnp.arange(ctx.shape[1])[None, :] < lengths[:, None]).astype(jnp.float32)
        b = actions.shape[0]
        word = jnp.full((b,), bos_id, jnp.int32)
        out = []
        c = carry
        for _ in range(self.max_decode_len):
            c, logits = self.decoder.step(c, word, ctx, ctx_mask)
            word = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out.append(word)
        return jnp.stack(out, axis=1)

    def beam_rollout(
        self,
        actions,
        world_feats,
        lengths,
        bos_id: int,
        eos_id: int,
        beam_size: int = 4,
        alpha: float = 0.6,
    ):
        """Batched beam-search decode with GNMT length normalization
        (score / ((5+len)/6)^alpha). The reference speaker decodes greedily
        (speaker.py:131-212); beam search is a quality improvement over it —
        greedy decodes are recoverable as beam_size=1. Returns (B, T) ids of
        each batch item's best-scoring finished hypothesis."""
        ctx, carry = self.encode(actions, world_feats, lengths)
        ctx_mask = (jnp.arange(ctx.shape[1])[None, :] < lengths[:, None]).astype(jnp.float32)
        b, seq_l, _ = ctx.shape
        k = beam_size
        ctx_k = jnp.repeat(ctx, k, axis=0)  # (B*K, L, H)
        mask_k = jnp.repeat(ctx_mask, k, axis=0)
        hc = tuple(jnp.repeat(x, k, axis=0) for x in carry)  # each (B*K, H)
        word = jnp.full((b * k,), bos_id, jnp.int32)
        # Only beam 0 is live at t=0 so the K initial hypotheses differ.
        scores = jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), -1e9)]).astype(jnp.float32),
            (b, 1),
        )  # (B, K)
        finished = jnp.zeros((b, k), bool)
        seqs = jnp.full((b, k, self.max_decode_len), eos_id, jnp.int32)
        batch_off = jnp.arange(b)[:, None] * k  # (B, 1)

        for t in range(self.max_decode_len):
            hc, logits = self.decoder.step(hc, word, ctx_k, mask_k)  # (B*K, V)
            v = logits.shape[-1]
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
            # A finished beam only extends with EOS at zero cost, freezing it.
            eos_only = jnp.full((v,), -1e9, jnp.float32).at[eos_id].set(0.0)
            logp = jnp.where(finished[..., None], eos_only[None, None, :], logp)
            total = (scores[..., None] + logp).reshape(b, k * v)
            scores, idx = jax.lax.top_k(total, k)  # (B, K)
            beam_idx = idx // v
            word_idx = (idx % v).astype(jnp.int32)
            flat_src = (batch_off + beam_idx).reshape(-1)  # into B*K
            hc = tuple(x[flat_src] for x in hc)
            seqs = jnp.take_along_axis(seqs, beam_idx[..., None], axis=1)
            finished = jnp.take_along_axis(finished, beam_idx, axis=1)
            seqs = seqs.at[:, :, t].set(word_idx)
            finished = finished | (word_idx == eos_id)
            word = word_idx.reshape(b * k)

        is_eos = seqs == eos_id
        has_eos = is_eos.any(-1)
        hyp_len = jnp.where(has_eos, jnp.argmax(is_eos, axis=-1) + 1, self.max_decode_len)
        norm = ((5.0 + hyp_len.astype(jnp.float32)) / 6.0) ** alpha
        best = jnp.argmax(scores / norm, axis=1)
        return jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0, :]
