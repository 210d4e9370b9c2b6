"""Fused spectrogram Pallas kernel (TPU).

The non-cached audio path (distractor mixes, multi-second sounds) computes
|STFT| → 4×4 mean-pool → log1p per env per step. The XLA lowering runs the
rFFT on the VPU with HBM round-trips between stages; on TPU the 512-point
STFT is better expressed as a *matmul against the DFT basis* — it rides the
MXU — and windowing, magnitude, pooling and log1p fuse into the same
VMEM-resident kernel. Framing stays an XLA gather (Mosaic requires
128-aligned dynamic slices; hop=160 is not), so the kernel input is the
framed signal.

Numerics match ops/audio.spectrogram_from_audiogoal (same centered padding,
periodic Hann, skimage-style zero-pad pooling); pinned by
tests/test_pallas_spectrogram.py (interpreter on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avlen_tpu.ops.audio import SpectrogramConfig, _centered_window

ROWS = 8  # (env × channel) rows per program — satisfies sublane tiling


def _dft_matrices(n_fft: int, freq_pad: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases (n_fft, freq_pad); columns ≥ n_fft//2+1 are zero so
    padded frequency rows pool as zeros (skimage cval=0 semantics)."""
    freqs = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None]
    f = np.arange(freq_pad)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    cos = np.cos(ang).astype(np.float32)
    sin = np.sin(ang).astype(np.float32)
    cos[:, freqs:] = 0.0
    sin[:, freqs:] = 0.0
    return cos, sin


def _kernel(frames_ref, window_ref, cos_ref, sin_ref, pt_ref, pf_ref, out_ref):
    # frames_ref: (ROWS*time_pad, n_fft), zero rows beyond n_frames
    x = frames_ref[...] * window_ref[0, :][None, :]
    re = jnp.dot(x, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(x, sin_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)  # (ROWS*time_pad, freq_pad)
    # 4×4 mean pooling as two matmuls (Mosaic has no 5-D reshape): block-diag
    # time-averaging then frequency-averaging
    pooled = jnp.dot(pt_ref[...], mag, preferred_element_type=jnp.float32)
    pooled = jnp.dot(pooled, pf_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = jnp.log1p(pooled)  # (ROWS*t', f')


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def spectrogram_pallas(audio: jax.Array, config: SpectrogramConfig = SpectrogramConfig(), interpret: bool = False) -> jax.Array:
    """(B, 2, T) audio → (B, F', T', 2) log-mean-pooled spectrogram.

    Equivalent to ops.audio.spectrogram_from_audiogoal with the post-framing
    pipeline fused into one Pallas kernel.
    """
    b, ch, t = audio.shape
    n_fft, hop, bf, bt = config.n_fft, config.hop_length, config.block[0], config.block[1]
    n_frames = config.num_frames
    freqs = config.num_freqs
    fp = -(-freqs // bf) * bf  # 260
    tp = -(-n_frames // bt) * bt  # e.g. 104
    fprime, tprime = fp // bf, tp // bt

    pad = n_fft // 2
    rows = b * ch
    rows_pad = -(-rows // ROWS) * ROWS
    xp = jnp.pad(audio.reshape(rows, t), ((0, 0), (pad, pad)), mode=config.pad_mode)
    if rows_pad != rows:
        xp = jnp.pad(xp, ((0, rows_pad - rows), (0, 0)))
    # framing gather (XLA): (rows_pad, tp, n_fft), zero rows beyond n_frames
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = xp[:, idx]  # (rows_pad, n_frames, n_fft)
    frames = jnp.pad(frames, ((0, 0), (0, tp - n_frames), (0, 0)))
    frames = frames.reshape(rows_pad * tp, n_fft)

    window = jnp.asarray(_centered_window(n_fft, config.win_length))[None, :]
    cos, sin = _dft_matrices(n_fft, fp)
    # pooling operators: P_t (ROWS*t', ROWS*tp) block-diag time averaging,
    # P_f (fp, f') frequency averaging
    pt = np.zeros((ROWS * tprime, ROWS * tp), np.float32)
    for r in range(ROWS):
        for i in range(tprime):
            pt[r * tprime + i, r * tp + i * bt : r * tp + (i + 1) * bt] = 1.0 / bt
    pf = np.zeros((fp, fprime), np.float32)
    for j in range(fprime):
        pf[j * bf : (j + 1) * bf, j] = 1.0 / bf

    out = pl.pallas_call(
        _kernel,
        grid=(rows_pad // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS * tp, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS * tprime, ROWS * tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, fprime), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS * tprime, fprime), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad * tprime, fprime), jnp.float32),
        interpret=interpret,
    )(frames, window, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(pt), jnp.asarray(pf))
    out = out.reshape(rows_pad, tprime, fprime)[:rows].swapaxes(1, 2)  # (rows, f', t')
    return jnp.moveaxis(out.reshape(b, ch, fprime, tprime), 1, -1)
