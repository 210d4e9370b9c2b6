"""Model tests: encoder shapes, mask-aware RNN sequence/step equivalence
(mirrors habitat-lab-dialog/test/test_rnn_state_encoder.py), policy API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avlen_tpu.models.encoders import AudioCNN, VisualCNN
from avlen_tpu.models.policy import AudioNavBaselineNet, Policy
from avlen_tpu.models.rnn_state_encoder import RNNStateEncoder


def test_audio_cnn_shapes():
    m = AudioCNN(output_size=128, input_hw=(65, 26))
    x = jnp.zeros((3, 65, 26, 2))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (3, 128)


def test_visual_cnn_rgbd():
    m = VisualCNN(output_size=256)
    rgb = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    depth = jnp.zeros((2, 64, 64, 1))
    params = m.init(jax.random.key(0), rgb, depth)
    y = m.apply(params, rgb, depth)
    assert y.shape == (2, 256)


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_rnn_sequence_equals_stepwise(rnn_type):
    """Sequence forward must equal step-by-step with episode-boundary masks."""
    t, b, d, h = 7, 4, 16, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(t, b, d).astype(np.float32))
    masks = jnp.asarray((rng.rand(t, b) > 0.3).astype(np.float32))
    m = RNNStateEncoder(input_size=d, hidden_size=h, rnn_type=rnn_type)
    h0 = jnp.asarray(rng.randn(b, (2 if rnn_type == "LSTM" else 1) * h).astype(np.float32))
    params = m.init(jax.random.key(0), x[0], h0, masks[0])

    seq_out, seq_final = m.apply(params, x, h0, masks, method=RNNStateEncoder.forward_sequence)

    hh = h0
    outs = []
    for i in range(t):
        o, hh = m.apply(params, x[i], hh, masks[i])
        outs.append(o)
    np.testing.assert_allclose(np.asarray(seq_out), np.stack(outs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq_final), np.asarray(hh), rtol=1e-5, atol=1e-5)


def test_rnn_mask_resets_hidden():
    d, h = 8, 16
    m = RNNStateEncoder(input_size=d, hidden_size=h)
    x = jnp.ones((2, d))
    h0 = jnp.full((2, h), 5.0)
    params = m.init(jax.random.key(0), x, h0, jnp.ones((2,)))
    out_masked, _ = m.apply(params, x, h0, jnp.asarray([0.0, 1.0]))
    out_zero, _ = m.apply(params, x, jnp.zeros((2, h)), jnp.ones((2,)))
    np.testing.assert_allclose(np.asarray(out_masked[0]), np.asarray(out_zero[0]), rtol=1e-6)
    assert not np.allclose(np.asarray(out_masked[1]), np.asarray(out_zero[1]))


def _make_policy_and_obs(b=3):
    policy = Policy(
        net=AudioNavBaselineNet(hidden_size=64, spectrogram_hw=(65, 26), use_depth=True),
        num_actions=4,
    )
    obs = {
        "spectrogram": jnp.zeros((b, 65, 26, 2)),
        "depth": jnp.zeros((b, 32, 32, 1)),
    }
    hidden = jnp.zeros((b, 64))
    masks = jnp.ones((b,))
    key = jax.random.key(1)
    params = policy.init(key, obs, hidden, masks, key, method=Policy.act)
    return policy, params, obs, hidden, masks


def test_policy_act_and_evaluate_consistent():
    policy, params, obs, hidden, masks = _make_policy_and_obs()
    key = jax.random.key(2)
    action, logp, value, h2, logits = policy.apply(params, obs, hidden, masks, key, method=Policy.act)
    assert action.shape == (3,)
    assert value.shape == (3,)

    # sequence evaluation of the same single step reproduces log-probs/values
    seq_obs = jax.tree.map(lambda v: v[None], obs)
    v, lp, ent, _ = policy.apply(
        params, seq_obs, hidden, masks[None], action[None], method=Policy.evaluate_actions
    )
    np.testing.assert_allclose(np.asarray(lp[0]), np.asarray(logp), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v[0]), np.asarray(value), rtol=1e-5, atol=1e-5)
    assert float(ent.mean()) > 0


def test_policy_deterministic_argmax():
    policy, params, obs, hidden, masks = _make_policy_and_obs()
    key = jax.random.key(3)
    a1, *_ = policy.apply(params, obs, hidden, masks, key, True, method=Policy.act)
    _, _, _, _, logits = policy.apply(params, obs, hidden, masks, key, method=Policy.act)
    np.testing.assert_array_equal(np.asarray(a1), np.argmax(np.asarray(logits), -1))
