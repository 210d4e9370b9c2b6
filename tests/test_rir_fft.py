"""Analytic frequency-domain procedural RIRs (scene.ProceduralRIRBank.gather_fft).

The per-step audio path may consume RIR *spectra* directly (skipping the
length-2^n rFFT the reference's scipy fftconvolve pays per step,
soundspaces/simulator.py:644-699). These tests pin the contract: the
analytic spectrum equals rfft(time-domain gather) exactly (up to float
roundoff), and the rendered audio/spectrograms through both representations
match.
"""

import numpy as np

import jax.numpy as jnp

from avlen_tpu.ops.audio import _conv_fft_len, render_audiogoal
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig, TURN_LEFT
from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


def _bank(sr=2000, length=400, side=4, scenes=2):
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=scenes, side=side, rir_length=length,
        sampling_rate=sr, num_sounds=2, with_frames=False,
    )
    return bank, tables


def test_gather_fft_equals_rfft_of_gather():
    bank, _ = _bank()
    rir = bank.rir
    assert rir.tail_fft is not None  # built at construction
    rng = np.random.RandomState(3)
    b = 16
    n = int(np.asarray(bank.tables["num_nodes"]).min())
    scene = jnp.asarray(rng.randint(0, bank.num_scenes, b))
    az = jnp.asarray(rng.randint(0, 4, b))
    recv = jnp.asarray(rng.randint(0, n, b))
    src = jnp.asarray(rng.randint(0, n, b))

    t = np.asarray(rir.gather(scene, az, recv, src))  # (B, L, 2)
    f = np.asarray(rir.gather_fft(scene, az, recv, src))  # (B, 2, F) channel-major
    ref = np.fft.rfft(t.swapaxes(1, 2), n=rir.fft_len, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(f, ref, atol=2e-4 * scale, rtol=0)


def test_render_audiogoal_matches_between_representations():
    bank, _ = _bank()
    rir = bank.rir
    rng = np.random.RandomState(5)
    b = 8
    n = int(np.asarray(bank.tables["num_nodes"]).min())
    scene = jnp.asarray(rng.randint(0, bank.num_scenes, b))
    az = jnp.asarray(rng.randint(0, 4, b))
    recv = jnp.asarray(rng.randint(0, n, b))
    src = jnp.asarray(rng.randint(0, n, b))
    sound = jnp.zeros((b,), jnp.int32)
    sound_padded = bank.sounds_padded[sound]
    idx = jnp.zeros((b,), jnp.int32)
    active = jnp.ones((b,), bool)

    audio_t, spec_t = render_audiogoal(
        sound_padded, idx, rir.gather(scene, az, recv, src), active, bank.sampling_rate
    )
    audio_f, spec_f = render_audiogoal(
        sound_padded, idx, None, active, bank.sampling_rate,
        rir_f=rir.gather_fft(scene, az, recv, src), rir_len=rir.length,
    )
    np.testing.assert_allclose(np.asarray(audio_f), np.asarray(audio_t), atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(spec_f), np.asarray(spec_t), atol=1e-4, rtol=0)


def test_env_uses_fft_path_and_matches_time_path():
    """The live env takes the analytic path whenever the provider carries
    tables; stripping them must fall back to time-domain gathers with the
    same observations (sensors incl. audiogoal so no spec bank kicks in)."""
    bank, tables = _bank(scenes=1)
    eps = make_episodes(np.random.RandomState(1), tables, 8, min_hops=1, max_hops=4, num_sounds=2)
    packed = pack_episodes(eps, num_envs=3)
    cfg = EnvConfig(max_episode_steps=10, sensors=("spectrogram", "audiogoal", "pose"),
                    pallas_spectrogram=False)

    env_fft = BatchedAudioNavEnv(bank, packed, cfg)
    assert bank.rir.tail_fft is not None
    state_f, obs_f = env_fft.reset()

    import dataclasses as dc

    bank_t = dc.replace(bank, rir=dc.replace(bank.rir))
    env_time = BatchedAudioNavEnv(bank_t, packed, cfg)
    # strip the spectra AFTER construction (the constructor would rebuild
    # them); the provider object is shared with the binder, so the traced
    # pytree sees tail_fft=None and _observe takes the time-domain branch
    env_time.bank.rir.tail_fft = None
    env_time.bank.rir.itd_phase = None
    state_t, obs_t = env_time.reset()

    np.testing.assert_allclose(
        np.asarray(obs_f["spectrogram"]), np.asarray(obs_t["spectrogram"]),
        atol=1e-4, rtol=0,
    )
    for _ in range(2):
        state_f, out_f = env_fft.step(state_f, jnp.full((3,), TURN_LEFT))
        state_t, out_t = env_time.step(state_t, jnp.full((3,), TURN_LEFT))
    np.testing.assert_allclose(
        np.asarray(out_f.obs["audiogoal"]), np.asarray(out_t.obs["audiogoal"]),
        atol=1e-4, rtol=0,
    )


def test_fft_len_consistency():
    bank, _ = _bank(sr=2000, length=400)
    assert bank.rir.fft_len == _conv_fft_len(2000, 400)
    # (2, P, 2ch, F) float32 re/im stack, channel-major — complex64 never
    # materialized (axon host<->device transfers of complex64 UNIMPLEMENTED)
    assert bank.rir.tail_fft.dtype == jnp.float32
    f = bank.rir.tail_fft.shape[2]
    assert f == bank.rir.fft_len // 2 + 1
