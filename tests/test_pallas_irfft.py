"""Golden tests for the fused Pallas partial inverse rFFT
(ops/pallas_irfft.py) — the TPU audio hot-path kernel that replaces the
XLA einsum formulation (whose stage-1 layout demand materialized as a
degenerate 3 ms/step relayout copy at the RIR-spectra gather, r4 profile).

Runs in Pallas interpret mode on the CPU test backend; bit-level agreement
(to f32 roundoff) with jnp.fft.irfft on the sizes the framework uses, plus
window-alignment and odd-batch cases.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from avlen_tpu.ops.audio import _conv_fft_len
from avlen_tpu.ops.pallas_irfft import partial_irfft_pallas, supported

pytestmark = pytest.mark.smoke


@pytest.mark.parametrize(
    "sr,rir_len,b",
    [
        (16000, 16384, 4),  # the real-Matterport shape (fft_len 65536)
        (16000, 24000, 3),  # reference 1.5 s RIRs (fft_len 65536)
        (8000, 2000, 2),  # synthetic-recipe shape (fft_len 16384)
    ],
)
def test_pallas_irfft_matches_fft(sr, rir_len, b):
    fft_len = _conv_fft_len(sr, rir_len)
    assert supported(fft_len), fft_len
    rng = np.random.RandomState(rir_len)
    x = rng.randn(b, 2, fft_len).astype(np.float32)
    spec = jnp.asarray(np.fft.rfft(x, axis=-1).astype(np.complex64))
    ref = np.fft.irfft(np.asarray(spec), n=fft_len, axis=-1)[
        ..., rir_len - 1 : rir_len - 1 + sr
    ]
    got = np.asarray(
        partial_irfft_pallas(spec, fft_len, rir_len - 1, sr, interpret=True)
    )
    assert got.shape == ref.shape
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, atol=5e-6 * scale, rtol=0)


def test_pallas_irfft_window_alignment():
    """Odd out_start, window not aligned to the CT row size."""
    fft_len = 16384
    rng = np.random.RandomState(1)
    x = rng.randn(4, fft_len).astype(np.float32)
    spec = jnp.asarray(np.fft.rfft(x, axis=-1).astype(np.complex64))
    full = np.fft.irfft(np.asarray(spec), n=fft_len, axis=-1)
    for out_start, out_len in [(1, 100), (333, 777), (1999, 8000)]:
        ref = full[..., out_start : out_start + out_len]
        got = np.asarray(
            partial_irfft_pallas(spec, fft_len, out_start, out_len, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=5e-6, rtol=0)


def test_pallas_irfft_odd_batch():
    """Row counts not divisible by 8 fall back to smaller row blocks."""
    fft_len = 16384
    rng = np.random.RandomState(2)
    for b in (1, 2, 5):
        x = rng.randn(b, fft_len).astype(np.float32)
        spec = jnp.asarray(np.fft.rfft(x, axis=-1).astype(np.complex64))
        ref = np.fft.irfft(np.asarray(spec), n=fft_len, axis=-1)[..., 100:1100]
        got = np.asarray(
            partial_irfft_pallas(spec, fft_len, 100, 1000, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=5e-6, rtol=0)


def test_supported_gate():
    assert not supported(4096)  # n1=64 < 128 lanes
    assert not supported(12000)  # not a power of two
    assert supported(16384) and supported(65536)
