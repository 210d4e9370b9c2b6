"""CLIP exactness golden tests (VERDICT r1 item 7).

1. The BPE tokenizer is compared token-for-token against an independent
   implementation of the same published algorithm — transformers'
   ``CLIPTokenizer`` — instantiated purely from local fabricated
   vocab/merges files (no network).
2. The byte-level fallback (no merges table on disk) must be *id-exact*
   w.r.t. OpenAI's vocab layout: byte symbols at 0..255, ``</w>`` variants at
   256..511, SOT/EOT at 49406/49407.
3. ``load_openai_weights`` is validated against a tiny from-scratch torch
   model with OpenAI CLIP's exact module layout and state-dict names
   (token_embedding / positional_embedding / transformer.resblocks.N.{ln_1,
   attn,ln_2,mlp} / ln_final / text_projection), covering the qkv split,
   transpose conventions, and QuickGELU.
"""

import gzip
import json
import os

import numpy as np
import pytest

from avlen_tpu.models.clip_bpe import (
    FULL_TABLE_MERGES,
    SimpleTokenizer,
    bytes_to_unicode,
    load_merges,
)

TEXTS = [
    "hello world",
    "a cat's hat!!",
    "Turn LEFT, then go   forward.",
    "the lower hall near the stairs",
    "cafe 123 <|endoftext|>ish",
]

# a tiny merges table exercising multi-step merges and </w> merges
TINY_MERGES = [
    ("h", "e"),
    ("l", "l"),
    ("he", "ll"),
    ("o", "</w>"),
    ("hell", "o</w>"),
    ("t", "he</w>"),
    ("a", "t</w>"),
    ("e", "r</w>"),
    ("w", "o"),
    ("r", "l"),
    ("d", "</w>"),
]


def _hf_tokenizer(tmp_path, merges):
    transformers = pytest.importorskip("transformers")
    tok = SimpleTokenizer(merges, pad_to_vocab=False)
    vocab_file = os.path.join(tmp_path, "vocab.json")
    merges_file = os.path.join(tmp_path, "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump(tok.encoder, f)
    with open(merges_file, "w") as f:
        f.write("#version: fabricated\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return transformers.CLIPTokenizer(vocab_file, merges_file)


def test_bpe_matches_hf_clip_tokenizer(tmp_path):
    ours = SimpleTokenizer(TINY_MERGES, pad_to_vocab=False)
    hf = _hf_tokenizer(str(tmp_path), TINY_MERGES)
    for text in TEXTS:
        got = [ours.sot_token] + ours.encode(text) + [ours.eot_token]
        want = hf.encode(text)
        assert got == want, f"{text!r}: {got} != {want}"


def test_bpe_matches_hf_with_no_merges(tmp_path):
    ours = SimpleTokenizer([], pad_to_vocab=False)
    hf = _hf_tokenizer(str(tmp_path), [])
    for text in TEXTS:
        assert [ours.sot_token] + ours.encode(text) + [ours.eot_token] == hf.encode(text)


def test_byte_fallback_ids_are_openai_exact():
    tok = SimpleTokenizer([], pad_to_vocab=True)
    b2u = bytes_to_unicode()
    values = list(b2u.values())
    # single-letter word -> its byte symbol with </w>, at 256 + byte index
    (a_id,) = tok.encode("a")
    assert a_id == 256 + values.index(b2u[ord("a")])
    # multi-char word -> plain byte ids then a </w> id
    ids = tok.encode("go")
    assert ids == [values.index(b2u[ord("g")]), 256 + values.index(b2u[ord("o")])]
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    arr = tok.tokenize(["go left"])
    assert arr.shape == (1, 77) and arr[0, 0] == 49406
    assert tok.decode(tok.encode("turn left, go up!")) == "turn left , go up !"


def test_tokenize_truncation_keeps_eot():
    tok = SimpleTokenizer([], pad_to_vocab=True)
    arr = tok.tokenize(["word " * 200], context_length=16)
    assert arr.shape == (1, 16)
    assert arr[0, 0] == tok.sot_token and arr[0, -1] == tok.eot_token


def test_load_merges_openai_gz_format(tmp_path):
    # fabricate an over-long table; loader must skip the banner and cap at
    # FULL_TABLE_MERGES entries
    path = os.path.join(str(tmp_path), "bpe_simple_vocab_16e6.txt.gz")
    lines = ["bpe_simple_vocab_16e6.txt#version: 0.2"]
    lines += [f"x{i} y{i}" for i in range(FULL_TABLE_MERGES + 50)]
    with gzip.open(path, "wb") as f:
        f.write("\n".join(lines).encode())
    merges = load_merges(path)
    assert len(merges) == FULL_TABLE_MERGES
    assert merges[0] == ("x0", "y0")
    tok = SimpleTokenizer(merges, pad_to_vocab=True)
    assert tok.sot_token == 49406 and len(tok.encoder) == 49408


def _torch_clip_text(width, layers, heads, vocab, ctx, embed_dim):
    torch = pytest.importorskip("torch")
    import collections

    import torch.nn as tnn

    class QuickGELU(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn = tnn.MultiheadAttention(width, heads)
            self.ln_1 = tnn.LayerNorm(width)
            self.mlp = tnn.Sequential(
                collections.OrderedDict(
                    [
                        ("c_fc", tnn.Linear(width, width * 4)),
                        ("gelu", QuickGELU()),
                        ("c_proj", tnn.Linear(width * 4, width)),
                    ]
                )
            )
            self.ln_2 = tnn.LayerNorm(width)

        def forward(self, x, mask):
            x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False, attn_mask=mask)[0]
            return x + self.mlp(self.ln_2(x))

    class Transformer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.resblocks = tnn.ModuleList([Block() for _ in range(layers)])

        def forward(self, x, mask):
            for b in self.resblocks:
                x = b(x, mask)
            return x

    class TextModel(tnn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = tnn.Embedding(vocab, width)
            self.positional_embedding = tnn.Parameter(torch.randn(ctx, width) * 0.02)
            self.transformer = Transformer()
            self.ln_final = tnn.LayerNorm(width)
            self.text_projection = tnn.Parameter(torch.randn(width, embed_dim) * 0.02)

        def forward(self, tokens):
            t = tokens.shape[1]
            x = self.token_embedding(tokens) + self.positional_embedding[:t]
            mask = torch.full((t, t), float("-inf")).triu(1)
            x = self.transformer(x.permute(1, 0, 2), mask).permute(1, 0, 2)
            x = self.ln_final(x)
            pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
            return pooled @ self.text_projection

    return TextModel()


def test_load_openai_weights_golden_vs_torch():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from avlen_tpu.models.clip_text import CLIPTextEncoder

    width, layers, heads, vocab, ctx, embed_dim = 16, 2, 4, 64, 12, 16
    torch.manual_seed(0)
    ref = _torch_clip_text(width, layers, heads, vocab, ctx, embed_dim).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    tokens = np.array(
        [[1, 5, 9, 30, 2, vocab - 1, 0, 0, 0, 0, 0, 0], [1, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, vocab - 1]],
        np.int32,
    )
    model = CLIPTextEncoder(
        vocab_size=vocab, context_length=ctx, width=width, layers=layers, heads=heads, embed_dim=embed_dim
    )
    params = model.init(jax.random.key(0), jnp.asarray(tokens))
    from avlen_tpu.models.clip_text import load_openai_weights

    params = load_openai_weights(params, sd)
    got = np.asarray(model.apply(params, jnp.asarray(tokens)))
    with torch.no_grad():
        want = ref(torch.from_numpy(tokens).long()).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
