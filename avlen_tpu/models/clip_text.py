"""CLIP ViT-B/32 text tower (Flax) + self-contained tokenizer.

The reference grounds oracle instructions with the frozen OpenAI CLIP
ViT-B/32 *text* encoder (`clip.load("ViT-B/32")` +
`clip.encode_text(tokens)` — ss_baselines/savi/ppo/policy.py:761-762,
847-849; `clip.tokenize(dialog)` in the trainer, savi/ppo/ppo_trainer.py:
560-561, context length 77).

This is a from-scratch implementation of that architecture (token embedding
49408×512, learned positional embedding 77×512, 12 pre-LN transformer layers,
width 512, 8 heads, causal mask, ln_final, text projection 512→512, sequence
pooled at the EOT token). `load_openai_weights` converts an OpenAI CLIP
state dict when one is provided on disk; this environment has no network
egress and ships no CLIP weights, so by default the tower runs with
deterministic random init — in the closed synthetic world the speaker and
the policy co-train against the same embedding space, which preserves the
reference's *capability* (language-conditioned policy) without its exact
embedding values.

Tokenization is CLIP's real byte-level BPE (`avlen_tpu/models/clip_bpe.py`):
with the published merges table on disk it is id-for-id identical to
`clip.tokenize`; without one it degrades to the id-exact byte-level subset
(same byte/special ids, no merges applied). `tokenize` is
signature-compatible with `clip.tokenize` (returns (B, 77) int32, truncated).
"""

from __future__ import annotations

import re
from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.models.clip_bpe import (
    CONTEXT_LENGTH,
    VOCAB_SIZE,
    default_tokenizer,
)

SOT_TOKEN = 49406
EOT_TOKEN = 49407


def tokenize(texts: Union[str, Sequence[str]], context_length: int = CONTEXT_LENGTH) -> np.ndarray:
    return default_tokenizer().tokenize(texts, context_length)


class CLIPTextEncoder(nn.Module):
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens (B, 77) int32 → (B, embed_dim) text features."""
        b, t = tokens.shape
        tok_emb = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (self.context_length, self.width)
        )
        x = (tok_emb + pos_emb[None, :t]).astype(self.dtype)

        causal = jnp.tril(jnp.ones((t, t), bool))
        for i in range(self.layers):
            # pre-LN residual block (CLIP layout)
            y = nn.LayerNorm(name=f"ln1_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype, name=f"attn_{i}"
            )(y, y, mask=causal[None, None])
            x = x + y
            y = nn.LayerNorm(name=f"ln2_{i}")(x)
            y = nn.Dense(self.width * 4, dtype=self.dtype, name=f"mlp_fc_{i}")(y)
            y = y * jax.nn.sigmoid(1.702 * y)  # QuickGELU, CLIP's activation
            y = nn.Dense(self.width, dtype=self.dtype, name=f"mlp_proj_{i}")(y)
            x = x + y

        x = nn.LayerNorm(name="ln_final")(x.astype(jnp.float32))
        # pool at EOT (highest token id position, CLIP convention)
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02), (self.width, self.embed_dim))
        return pooled @ proj


def load_openai_weights(params, state_dict) -> dict:
    """Map an OpenAI CLIP state dict (torch tensor name → array) onto this
    module's params. Provided for weight porting when CLIP weights exist on
    disk; returns an updated params pytree."""
    p = jax.tree.map(np.asarray, params)["params"]
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p["token_embedding"]["embedding"] = sd["token_embedding.weight"]
    p["positional_embedding"] = sd["positional_embedding"]
    p["text_projection"] = sd["text_projection"]
    p["ln_final"]["scale"] = sd["ln_final.weight"]
    p["ln_final"]["bias"] = sd["ln_final.bias"]
    n_layers = len([k for k in sd if re.match(r"transformer\.resblocks\.\d+\.ln_1\.weight", k)])
    w = p["token_embedding"]["embedding"].shape[1]
    for i in range(n_layers):
        pre = f"transformer.resblocks.{i}"
        p[f"ln1_{i}"]["scale"] = sd[f"{pre}.ln_1.weight"]
        p[f"ln1_{i}"]["bias"] = sd[f"{pre}.ln_1.bias"]
        p[f"ln2_{i}"]["scale"] = sd[f"{pre}.ln_2.weight"]
        p[f"ln2_{i}"]["bias"] = sd[f"{pre}.ln_2.bias"]
        wqkv = sd[f"{pre}.attn.in_proj_weight"]
        bqkv = sd[f"{pre}.attn.in_proj_bias"]
        heads = p[f"attn_{i}"]["query"]["kernel"].shape[1]
        dh = w // heads
        for j, nm in enumerate(("query", "key", "value")):
            p[f"attn_{i}"][nm]["kernel"] = wqkv[j * w : (j + 1) * w].T.reshape(w, heads, dh)
            p[f"attn_{i}"][nm]["bias"] = bqkv[j * w : (j + 1) * w].reshape(heads, dh)
        p[f"attn_{i}"]["out"]["kernel"] = sd[f"{pre}.attn.out_proj.weight"].T.reshape(heads, dh, w)
        p[f"attn_{i}"]["out"]["bias"] = sd[f"{pre}.attn.out_proj.bias"]
        p[f"mlp_fc_{i}"]["kernel"] = sd[f"{pre}.mlp.c_fc.weight"].T
        p[f"mlp_fc_{i}"]["bias"] = sd[f"{pre}.mlp.c_fc.bias"]
        p[f"mlp_proj_{i}"]["kernel"] = sd[f"{pre}.mlp.c_proj.weight"].T
        p[f"mlp_proj_{i}"]["bias"] = sd[f"{pre}.mlp.c_proj.bias"]
    return {"params": p}
