"""MXU partial inverse rFFT (ops.audio.partial_irfft_matmul).

The TPU audio hot path replaces the length-2^16 irfft custom-call with a
complex-packing + radix-sqrt(H) Cooley-Tukey DFT cast as two dense matmuls,
computing only the valid-conv output window (ops/audio.py). These tests pin
bit-level agreement (to f32 roundoff) with jnp.fft.irfft on every size the
framework uses, and that the full convolution path is unchanged when the
matmul route is forced on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from avlen_tpu.ops import audio
from avlen_tpu.ops.audio import (
    _conv_fft_len,
    _ct_factors,
    binaural_convolve,
    partial_irfft_matmul,
)

pytestmark = pytest.mark.smoke


@pytest.mark.parametrize(
    "sr,rir_len",
    [(16000, 24000), (2000, 400), (8000, 2000), (1000, 257)],
)
def test_partial_irfft_matches_fft(sr, rir_len):
    fft_len = _conv_fft_len(sr, rir_len)
    rng = np.random.RandomState(rir_len)
    x = rng.randn(3, 2, fft_len).astype(np.float32)
    spec = jnp.asarray(np.fft.rfft(x, axis=-1).astype(np.complex64))

    ref = np.fft.irfft(np.asarray(spec), n=fft_len, axis=-1)[
        ..., rir_len - 1 : rir_len - 1 + sr
    ]
    got = np.asarray(partial_irfft_matmul(spec, fft_len, rir_len - 1, sr))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-6 * max(scale, 1.0), rtol=0)


def test_ct_factors_power_of_two_invariant():
    for h in (2048, 8192, 16384, 32768, 65536):
        n1, n2 = _ct_factors(h)
        assert n1 * n2 == h
        assert n1 * n1 % h == 0  # cross-twiddle unity (see _partial_irfft_consts)


def test_binaural_convolve_same_through_both_routes(monkeypatch):
    """Forcing the matmul route must reproduce the FFT route's audio."""
    sr, rir_len = 2000, 400
    rng = np.random.RandomState(7)
    b = 4
    sound = rng.randn(b, rir_len - 1 + 3 * sr).astype(np.float32)
    rir = (rng.randn(b, rir_len, 2) * np.exp(-np.arange(rir_len) / 200.0)[None, :, None]).astype(np.float32)
    start = jnp.asarray(rng.randint(0, 2 * sr, b))

    monkeypatch.setenv("AVLEN_MATMUL_IRFFT", "0")
    ref = np.asarray(binaural_convolve(jnp.asarray(sound), start, jnp.asarray(rir), sr))
    monkeypatch.setenv("AVLEN_MATMUL_IRFFT", "1")
    got = np.asarray(binaural_convolve(jnp.asarray(sound), start, jnp.asarray(rir), sr))
    np.testing.assert_allclose(got, ref, atol=1e-4 * max(np.abs(ref).max(), 1.0), rtol=0)


def test_window_not_aligned_to_block():
    """out_start that is odd and not a multiple of the CT row size."""
    fft_len = 4096
    rng = np.random.RandomState(0)
    x = rng.randn(5, fft_len).astype(np.float32)
    spec = jnp.asarray(np.fft.rfft(x, axis=-1).astype(np.complex64))
    for out_start, out_len in [(1, 100), (333, 777), (4095 - 50, 50)]:
        ref = np.fft.irfft(np.asarray(spec), n=fft_len, axis=-1)[
            ..., out_start : out_start + out_len
        ]
        got = np.asarray(partial_irfft_matmul(spec, fft_len, out_start, out_len))
        np.testing.assert_allclose(got, ref, atol=5e-6, rtol=0)
