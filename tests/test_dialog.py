"""Dialog stack tests: CLIP text tower + tokenizer, dialog state encoder,
dialog/option policies, speaker templates and neural rollout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avlen_tpu.dialog.speaker.speaker import Speaker
from avlen_tpu.dialog.speaker.templates import generate_template_instruction, path_to_motions
from avlen_tpu.dialog.speaker.vocab import Vocabulary
from avlen_tpu.models.clip_text import CONTEXT_LENGTH, EOT_TOKEN, SOT_TOKEN, CLIPTextEncoder, tokenize
from avlen_tpu.models.dialog_encoder import DialogStateEncoder
from avlen_tpu.models.dialog_policy import AudioNavDialogNet, DialogPolicy
from avlen_tpu.models.option_policy import AudioNavOptionNet, OptionPolicy


def test_tokenize_shape_and_special_tokens():
    toks = tokenize(["turn left and go forward", "stop"])
    assert toks.shape == (2, CONTEXT_LENGTH)
    assert toks[0, 0] == SOT_TOKEN
    assert EOT_TOKEN in toks[0]
    # deterministic
    np.testing.assert_array_equal(toks, tokenize(["turn left and go forward", "stop"]))


def test_clip_text_encoder_small():
    enc = CLIPTextEncoder(width=64, layers=2, heads=4, embed_dim=32)
    toks = jnp.asarray(tokenize(["go forward"]))
    params = enc.init(jax.random.key(0), toks)
    out = enc.apply(params, toks)
    assert out.shape == (1, 32)
    # EOT pooling: padding after EOT must not change the embedding
    toks2 = np.asarray(toks).copy()
    out2 = enc.apply(params, jnp.asarray(toks2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_dialog_state_encoder_shapes():
    b, m, s, d = 2, 3, 32, 32
    enc = DialogStateEncoder(state_size=s, dialog_emb_size=d, d_model=d, nhead=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s).astype(np.float32))
    mem = jnp.asarray(rng.randn(b, m, s).astype(np.float32))
    masks = jnp.ones((b, m))
    demb = jnp.asarray(rng.randn(b, d).astype(np.float32))
    step = jnp.asarray([0, 2], jnp.int32)
    goal = jnp.zeros((b, d))
    params = enc.init(jax.random.key(0), x, mem, masks, demb, step, goal)
    out = enc.apply(params, x, mem, masks, demb, step, goal)
    assert out.shape == (b, d)
    # agent_step changes the PE and hence the output
    out2 = enc.apply(params, x, mem, masks, demb, jnp.asarray([1, 0], jnp.int32), goal)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def _dialog_obs(b=2):
    return {
        "spectrogram": jnp.zeros((b, 16, 4, 2)),
        "depth": jnp.zeros((b, 24, 24, 1)),
        "pose": jnp.zeros((b, 4)),
        "category_belief": jnp.zeros((b, 21)),
        "location_belief": jnp.zeros((b, 2)),
    }


def test_dialog_policy_act():
    b = 2
    net = AudioNavDialogNet(
        spectrogram_hw=(16, 4), d_model=32, nhead=4, use_rgb=False, use_depth=True,
        clip_width=32, clip_layers=1,
    )
    policy = DialogPolicy(net=net)
    obs = _dialog_obs(b)
    f = 64 + 16 + 128 + 4  # depth tower 64
    mem_f = jnp.zeros((b, 4, f))
    mem_v = jnp.zeros((b, 4))
    smem = jnp.zeros((b, 3, 32))
    smem_v = jnp.zeros((b, 3))
    toks = jnp.asarray(tokenize(["turn left then go forward two steps", "go forward"]))
    step = jnp.zeros((b,), jnp.int32)
    key = jax.random.key(0)
    params = policy.init(
        key, obs, jnp.zeros((b,), jnp.int32), mem_f, mem_v, smem, smem_v, toks, step, key,
        method=DialogPolicy.act,
    )
    a, lp, v, x, x_att, logits = policy.apply(
        params, obs, jnp.zeros((b,), jnp.int32), mem_f, mem_v, smem, smem_v, toks, step, key,
        method=DialogPolicy.act,
    )
    assert a.shape == (b,)
    assert x.shape == (b, f)
    assert x_att.shape == (b, 32)
    # different instructions produce different logits (language-conditioned)
    toks2 = jnp.asarray(tokenize(["turn right", "turn right"]))
    a2, lp2, v2, x2, xa2, logits2 = policy.apply(
        params, obs, jnp.zeros((b,), jnp.int32), mem_f, mem_v, smem, smem_v, toks2, step, key,
        method=DialogPolicy.act,
    )
    assert not np.allclose(np.asarray(logits), np.asarray(logits2), atol=1e-6)


def test_option_policy_act():
    b = 2
    net = AudioNavOptionNet(spectrogram_hw=(16, 4), d_model=32, nhead=4, use_rgb=False, use_depth=True)
    policy = OptionPolicy(net=net)
    obs = _dialog_obs(b)
    f = net.feature_size
    mem_f = jnp.zeros((b, 4, f))
    mem_v = jnp.zeros((b, 4))
    qs = jnp.zeros((b, 32))
    lqi = jnp.zeros((b, 32))
    key = jax.random.key(0)
    params = policy.init(
        key, obs, jnp.zeros((b,), jnp.int32), mem_f, mem_v, qs, lqi, key, method=OptionPolicy.act
    )
    a, lp, v, x_mem, logits, unct = policy.apply(
        params, obs, jnp.zeros((b,), jnp.int32), mem_f, mem_v, qs, lqi, key, method=OptionPolicy.act
    )
    assert logits.shape == (b, 2)
    assert unct.shape == (b, 2)
    assert x_mem.shape == (b, f)
    assert set(np.asarray(a)) <= {0, 1}


def test_template_instructions():
    # straight corridor: 3 nodes along +x (direction 0°)
    positions = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    # heading east (orientation 0): pure forward
    motions = path_to_motions(positions, [0, 1, 2], 0)
    assert motions == ["forward", "forward"]
    words = generate_template_instruction(positions, [0, 1, 2], 0, category=None)
    assert "forward" in words and "two" in words
    # facing 180: needs a turn-around first
    motions2 = path_to_motions(positions, [0, 1, 2], 180)
    assert motions2[0] == "around"


def test_speaker_template_backend():
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1]], np.float32)
    sp = Speaker([positions], backend="template")
    out = sp.generate_instr([{"heading": 0, "scene": 0, "path": [0, 1, 2], "category": 3}])
    assert isinstance(out[0]["words"], list) and len(out[0]["words"]) > 2
    text = sp.instruction_text([{"heading": 0, "scene": 0, "path": [0, 1, 2]}])[0]
    assert "forward" in text


def test_speaker_neural_backend_runs():
    positions = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    sp = Speaker([positions], backend="neural", hidden_size=32)
    out = sp.generate_instr([{"heading": 0, "scene": 0, "path": [0, 1]}])
    assert isinstance(out[0]["words"], list)


def test_vocab_roundtrip():
    v = Vocabulary()
    ids = v.encode(["turn", "left", "then", "go", "forward"])
    words = v.decode(ids)
    assert words == ["turn", "left", "then", "go", "forward"]
