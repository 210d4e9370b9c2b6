"""Golden tests: fused JAX audio ops vs numpy/scipy references.

The reference's audio pipeline ships untested (SURVEY.md §4); these tests pin
the rebuilt kernels to the exact reference semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from avlen_tpu.ops.audio import (
    SpectrogramConfig,
    binaural_convolve,
    block_reduce_mean,
    render_audiogoal,
    spectrogram_from_audiogoal,
    stft_magnitude,
)
from tests.golden_audio import (
    librosa_style_stft_mag,
    reference_audiogoal,
    reference_spectrogram,
    skimage_style_block_reduce_mean,
)

SR = 16000
RNG = np.random.RandomState(0)


def test_stft_matches_librosa_semantics():
    y = RNG.randn(SR).astype(np.float32)
    got = np.asarray(stft_magnitude(jnp.asarray(y)))
    want = librosa_style_stft_mag(y)
    assert got.shape == (257, 101)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_block_reduce_matches_skimage_semantics():
    x = RNG.randn(257, 101).astype(np.float32)
    got = np.asarray(block_reduce_mean(jnp.asarray(x)))
    want = skimage_style_block_reduce_mean(x)
    assert got.shape == (65, 26)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spectrogram_full_pipeline():
    audio = RNG.randn(2, SR).astype(np.float32)
    got = np.asarray(spectrogram_from_audiogoal(jnp.asarray(audio)))
    want = reference_spectrogram(audio)
    assert got.shape == (65, 26, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def _pad_assets(sound, rir, l_max, s_max):
    sound_padded = np.zeros(l_max - 1 + s_max, np.float32)
    sound_padded[l_max - 1 : l_max - 1 + len(sound)] = sound
    rir_padded = np.zeros((l_max, 2), np.float32)
    rir_padded[: len(rir)] = rir
    return sound_padded, rir_padded


@pytest.mark.parametrize("rir_len", [1000, 3000])
def test_convolve_one_second_sound(rir_len):
    """Branch 1: sound length == sr, full conv cropped (simulator.py:659-663)."""
    l_max = 4000
    sound = RNG.randn(SR).astype(np.float32)
    rir = (RNG.randn(rir_len, 2) * 0.1).astype(np.float32)
    want = reference_audiogoal(sound, rir, 0, SR)

    sp, rp = _pad_assets(sound, rir, l_max, SR)
    got = np.asarray(
        binaural_convolve(jnp.asarray(sp)[None], jnp.zeros((1,), jnp.int32), jnp.asarray(rp)[None], SR)
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("index", [0, 1, 2, 4])
def test_convolve_sliding_window(index):
    """Branches 2+3: multi-second sound, early-window crop vs valid-mode reverb
    carry-over (simulator.py:666-680). RIR longer than 1 s exercises the early
    branch at index 1."""
    l_max = SR + SR // 2  # allow RIRs longer than one second
    secs = 5
    sound = RNG.randn(secs * SR).astype(np.float32)
    rir = (RNG.randn(SR + 123, 2) * 0.1).astype(np.float32)
    want = reference_audiogoal(sound, rir, index, SR)

    sp, rp = _pad_assets(sound, rir, l_max, secs * SR)
    got = np.asarray(
        binaural_convolve(
            jnp.asarray(sp)[None],
            jnp.asarray([index * SR], jnp.int32),
            jnp.asarray(rp)[None],
            SR,
        )
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_render_audiogoal_batched_and_silent():
    l_max = 2000
    secs = 3
    b = 4
    sounds = RNG.randn(b, secs * SR).astype(np.float32)
    rirs = (RNG.randn(b, 1500, 2) * 0.1).astype(np.float32)
    sp = np.zeros((b, l_max - 1 + secs * SR), np.float32)
    rp = np.zeros((b, l_max, 2), np.float32)
    for i in range(b):
        s, r = _pad_assets(sounds[i], rirs[i], l_max, secs * SR)
        sp[i], rp[i] = s, r
    index = np.array([0, 1, 2, 0], np.int32)
    active = np.array([True, True, True, False])

    audio, spec = render_audiogoal(
        jnp.asarray(sp), jnp.asarray(index), jnp.asarray(rp), jnp.asarray(active), SR
    )
    audio, spec = np.asarray(audio), np.asarray(spec)
    assert audio.shape == (b, 2, SR)
    assert spec.shape == (b, 65, 26, 2)

    for i in range(3):
        want = reference_audiogoal(sounds[i], rirs[i], int(index[i]), SR)
        np.testing.assert_allclose(audio[i], want, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(spec[i], reference_spectrogram(want), rtol=1e-3, atol=2e-3)

    # inactive env renders silence → log1p(0)-ish spectrogram of zeros
    np.testing.assert_array_equal(audio[3], 0.0)
    np.testing.assert_allclose(spec[3], reference_spectrogram(np.zeros((2, SR))), atol=1e-6)


def test_distractor_added():
    l_max = 1200
    sound = RNG.randn(SR).astype(np.float32)
    dsound = RNG.randn(SR).astype(np.float32)
    rir = (RNG.randn(800, 2) * 0.1).astype(np.float32)
    drir = (RNG.randn(640, 2) * 0.1).astype(np.float32)

    want = reference_audiogoal(sound, rir, 0, SR) + reference_audiogoal(dsound, drir, 0, SR)

    sp, rp = _pad_assets(sound, rir, l_max, SR)
    dsp, drp = _pad_assets(dsound, drir, l_max, SR)
    audio, _ = render_audiogoal(
        jnp.asarray(sp)[None],
        jnp.zeros((1,), jnp.int32),
        jnp.asarray(rp)[None],
        jnp.ones((1,), bool),
        SR,
        distractor_sound_padded=jnp.asarray(dsp)[None],
        distractor_rir=jnp.asarray(drp)[None],
        has_distractor=True,
    )
    np.testing.assert_allclose(np.asarray(audio)[0], want, rtol=1e-3, atol=1e-3)


def test_spectrogram_config_shapes():
    cfg = SpectrogramConfig(sampling_rate=44100)
    assert cfg.num_frames == 1 + 44100 // 160
    assert cfg.out_shape[2] == 2
