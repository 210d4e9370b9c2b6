"""Spectrogram-bank equivalence: the precomputed-bank observation path must
match the per-step convolution path up to the bank dtype."""

import numpy as np

import jax.numpy as jnp

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig, TURN_LEFT
from avlen_tpu.sim.scene import precompute_spectrogram_bank
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


def test_bank_matches_conv_path():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=4, rir_length=300,
        sampling_rate=2000, num_sounds=2, with_frames=False,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 8, min_hops=1, max_hops=4)
    packed = pack_episodes(eps, num_envs=3)
    cfg = EnvConfig(max_episode_steps=10, sensors=("spectrogram", "pose"))

    env_conv = BatchedAudioNavEnv(bank, packed, cfg)
    state, obs_conv = env_conv.reset()

    bank.spec_bank = precompute_spectrogram_bank(bank, batch=32, dtype=jnp.float32)
    assert bank.spec_bank is not None
    env_bank = BatchedAudioNavEnv(bank, packed, cfg)
    state_b, obs_bank = env_bank.reset()

    np.testing.assert_allclose(
        np.asarray(obs_bank["spectrogram"]), np.asarray(obs_conv["spectrogram"]),
        rtol=1e-4, atol=1e-4,
    )
    # after steps too (rotation changes azimuth)
    for _ in range(3):
        state, out_c = env_conv.step(state, jnp.full((3,), TURN_LEFT))
        state_b, out_b = env_bank.step(state_b, jnp.full((3,), TURN_LEFT))
    np.testing.assert_allclose(
        np.asarray(out_b.obs["spectrogram"]), np.asarray(out_c.obs["spectrogram"]),
        rtol=1e-4, atol=1e-4,
    )


def test_bank_skipped_for_multisecond_sounds():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=4, rir_length=200,
        sampling_rate=2000, num_sounds=1, sound_secs=3, with_frames=False,
    )
    assert precompute_spectrogram_bank(bank) is None


def test_bank_respects_byte_budget():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=4, rir_length=200,
        sampling_rate=2000, num_sounds=1, with_frames=False,
    )
    assert precompute_spectrogram_bank(bank, max_bytes=10) is None
