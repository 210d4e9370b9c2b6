"""Distractor-sound env path: second source mixed into the audio observation
(semantic_audionav distractor variant, simulator.py:682-697)."""

import numpy as np

import jax.numpy as jnp

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.ops.audio import render_audiogoal
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


def test_env_distractor_mixes_second_source():
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=5, rir_length=300,
        sampling_rate=2000, num_sounds=3, with_frames=False,
    )
    eps = make_episodes(
        np.random.RandomState(1), tables, 8, min_hops=2, max_hops=6,
        num_sounds=3, with_distractor=True,
    )
    assert any(e.distractor_node >= 0 for e in eps)
    packed = pack_episodes(eps, num_envs=2)

    env_plain = BatchedAudioNavEnv(
        bank, packed, EnvConfig(sensors=("spectrogram", "audiogoal", "pose"), has_distractor=False)
    )
    env_dist = BatchedAudioNavEnv(
        bank, packed, EnvConfig(sensors=("spectrogram", "audiogoal", "pose"), has_distractor=True)
    )
    s1, o1 = env_plain.reset()
    s2, o2 = env_dist.reset()

    a1 = np.asarray(o1["audiogoal"])
    a2 = np.asarray(o2["audiogoal"])
    has_d = np.asarray(s2.distractor_node) >= 0
    for i in range(2):
        if has_d[i]:
            assert not np.allclose(a1[i], a2[i])
        else:
            np.testing.assert_allclose(a1[i], a2[i], rtol=1e-5, atol=1e-6)

    # the mixture equals goal audio + distractor-only audio (superposition)
    az = (4 - s2.rot) % 4
    drir = bank.rir.gather(s2.scene, az, s2.node, jnp.maximum(s2.distractor_node, 0))
    mask = (s2.distractor_node >= 0)[:, None, None].astype(drir.dtype)
    d_audio, _ = render_audiogoal(
        bank.sounds_padded[jnp.maximum(s2.distractor_sound, 0)],
        jnp.zeros((2,), jnp.int32),
        drir * mask,
        jnp.ones((2,), bool),
        bank.sampling_rate,
    )
    np.testing.assert_allclose(a2, a1 + np.asarray(d_audio), rtol=1e-4, atol=1e-5)
