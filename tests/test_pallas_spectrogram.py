"""Pallas spectrogram kernel vs the XLA reference path (interpreter mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np

import jax.numpy as jnp

from avlen_tpu.ops.audio import SpectrogramConfig, spectrogram_from_audiogoal
from avlen_tpu.ops.pallas_spectrogram import spectrogram_pallas


def test_pallas_matches_reference_path():
    rng = np.random.RandomState(0)
    cfg = SpectrogramConfig(sampling_rate=4000)
    audio = rng.randn(3, 2, 4000).astype(np.float32)
    want = np.asarray(spectrogram_from_audiogoal(jnp.asarray(audio), cfg))
    got = np.asarray(spectrogram_pallas(jnp.asarray(audio), cfg, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
