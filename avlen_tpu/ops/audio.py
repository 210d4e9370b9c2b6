"""Fused on-device audio rendering: binaural RIR convolution + spectrogram.

This is the TPU replacement for the reference's per-step CPU audio path
(`SoundSpacesSim._compute_audiogoal`, soundspaces/simulator.py:644-699:
scipy.signal.fftconvolve per channel per env per step, plus
`SpectrogramSensor.compute_spectrogram`, soundspaces/tasks/nav.py:87-101:
librosa STFT → skimage block_reduce → log1p). Here the whole batch of envs is
rendered in one jit program: a batched FFT convolution against a gathered RIR
bank followed by a batched framed STFT, so the audio pipeline rides the TPU's
FFT/VPU units instead of per-process CPython.

Semantics preserved exactly (golden-tested against numpy references):

* Unified convolution formula. For env step index ``i`` (seconds into the
  sound, wrapping at the sound's length) the reference computes, in all three
  of its branches (1-s sound full-conv crop; early-window full-conv crop;
  steady-state valid-conv with reverb carry-over):

      out[t] = sum_k rir[k] * sound[i*sr + t - k],   sound[j<0] = 0

  which we evaluate as one valid-mode FFT convolution of a fixed-length
  segment ``sound_padded[i*sr : i*sr + sr + L-1]`` (``L-1`` leading zeros)
  with the trailing-zero-padded RIR.

* STFT: n_fft=512, hop=160, win=400 periodic Hann centered in the 512 frame,
  centered signal padding in reflect mode (librosa<=0.9 default), magnitude.

* block_reduce: 4x4 mean pooling with zero padding counted in the mean
  (skimage semantics), then log1p, channels stacked last: (65, 26, 2) at
  16 kHz / 1 s.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SpectrogramConfig:
    sampling_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    win_length: int = 400
    block: Tuple[int, int] = (4, 4)
    pad_mode: str = "reflect"
    # fuse the post-framing pipeline (window → DFT matmul → |·| → pool →
    # log1p) into one Pallas kernel (TPU only; ~1.7× the XLA rfft path)
    use_pallas: bool = False

    @property
    def num_frames(self) -> int:
        # center=True pads n_fft//2 both sides: 1 + T // hop frames
        return 1 + self.sampling_rate // self.hop_length

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def out_shape(self) -> Tuple[int, int, int]:
        f = -(-self.num_freqs // self.block[0])
        t = -(-self.num_frames // self.block[1])
        return (f, t, 2)


def _periodic_hann(win_length: int) -> np.ndarray:
    # scipy.signal.get_window('hann', N, fftbins=True)
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _centered_window(n_fft: int, win_length: int) -> np.ndarray:
    win = _periodic_hann(win_length)
    pad = n_fft - win_length
    lpad = pad // 2
    return np.pad(win, (lpad, pad - lpad)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "pad_mode"))
def stft_magnitude(
    x: jax.Array,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    pad_mode: str = "reflect",
) -> jax.Array:
    """|STFT| of ``x`` (..., T) → (..., n_fft//2+1, n_frames), librosa-compatible."""
    window = jnp.asarray(_centered_window(n_fft, win_length))
    t = x.shape[-1]
    pad = n_fft // 2
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, pad_widths, mode=pad_mode)
    n_frames = 1 + t // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = xp[..., idx] * window  # (..., n_frames, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return jnp.abs(spec).swapaxes(-1, -2)  # (..., freq, time)


@functools.partial(jax.jit, static_argnames=("block",))
def block_reduce_mean(x: jax.Array, block: Tuple[int, int] = (4, 4)) -> jax.Array:
    """Mean-pool the last two dims in ``block``-sized tiles, zero padding at the
    edges counted in the mean (skimage.measure.block_reduce semantics)."""
    bf, bt = block
    f, t = x.shape[-2], x.shape[-1]
    fp, tp = -(-f // bf) * bf, -(-t // bt) * bt
    pad_widths = [(0, 0)] * (x.ndim - 2) + [(0, fp - f), (0, tp - t)]
    xp = jnp.pad(x, pad_widths)
    shape = x.shape[:-2] + (fp // bf, bf, tp // bt, bt)
    return xp.reshape(shape).mean(axis=(-3, -1))


@functools.partial(jax.jit, static_argnames=("config",))
def spectrogram_from_audiogoal(audio: jax.Array, config: SpectrogramConfig = SpectrogramConfig()) -> jax.Array:
    """(..., 2, T) binaural audio → (..., F', T', 2) log-mean-pooled spectrogram.

    Matches SpectrogramSensor.compute_spectrogram (soundspaces/tasks/nav.py:87-101).
    """
    if config.use_pallas and audio.ndim == 3:
        from avlen_tpu.ops.pallas_spectrogram import spectrogram_pallas

        return spectrogram_pallas(audio, config)
    mag = stft_magnitude(
        audio,
        n_fft=config.n_fft,
        hop_length=config.hop_length,
        win_length=config.win_length,
        pad_mode=config.pad_mode,
    )  # (..., 2, F, T)
    pooled = block_reduce_mean(mag, config.block)
    return jnp.moveaxis(jnp.log1p(pooled), -3, -1)


def _conv_fft_len(out_len: int, max_rir_len: int) -> int:
    need = out_len + 2 * max_rir_len - 2
    n = 1
    while n < need:
        n *= 2
    return n


def _convolve_from_fft(
    seg_f: jax.Array,
    rir_f: jax.Array,
    rir_len: int,
    sampling_rate: int,
    fft_len: int,
) -> jax.Array:
    """(B, F) segment rFFTs × (B, F, 2) RIR rFFTs → (B, 2, sr) valid windows."""
    conv = jnp.fft.irfft(seg_f[:, :, None] * rir_f, n=fft_len, axis=1)  # (B, fft_len, 2)
    valid = jax.lax.dynamic_slice_in_dim(conv, rir_len - 1, sampling_rate, axis=1)
    return valid.swapaxes(1, 2)  # (B, 2, sr)


@functools.partial(jax.jit, static_argnames=("sampling_rate", "rir_len"))
def binaural_convolve(
    sound_padded: jax.Array,
    window_start: jax.Array,
    rir: jax.Array | None,
    sampling_rate: int,
    seg_f: jax.Array | None = None,
    rir_f: jax.Array | None = None,
    rir_len: int | None = None,
) -> jax.Array:
    """One 1-second binaural window of RIR-convolved source audio, batched.

    Args:
      sound_padded: (B, L-1 + S) source sounds, each with ``L-1`` leading zeros
        (L = padded RIR length); S is the padded sound length in samples.
      window_start: (B,) int32 second-index × sampling_rate into the *unpadded*
        sound (the reference's ``self._audio_index * sampling_rate``).
      rir: (B, L, 2) trailing-zero-padded binaural RIRs (None when ``rir_f``
        is supplied instead).
      sampling_rate: output samples per window.
      seg_f: optional precomputed (B, F) segment rFFTs (SceneBank
        sound_fft_bank gathers) — skips the per-step segment gather + rFFT.
      rir_f: optional (B, F) × 2-channel complex RIR spectra at the
        convolution FFT length (ProceduralRIRBank.gather_fft) — skips the
        per-step RIR rFFT entirely; requires static ``rir_len`` (= L).

    Returns: (B, 2, sampling_rate) audio, equal to the reference's
    ``_compute_audiogoal`` branches (simulator.py:659-680) for every window.
    """
    l = int(rir.shape[1]) if rir is not None else int(rir_len)
    seg_len = sampling_rate + l - 1
    fft_len = _conv_fft_len(sampling_rate, l)

    if seg_f is None:
        # segment starting at window_start in unpadded coords == same offset
        # in padded coords because of the L-1 leading zeros.
        idx = window_start[:, None] + jnp.arange(seg_len)[None, :]
        idx = jnp.clip(idx, 0, sound_padded.shape[-1] - 1)
        seg = jnp.take_along_axis(sound_padded, idx, axis=-1)  # (B, seg_len)
        seg_f = jnp.fft.rfft(seg.astype(jnp.float32), n=fft_len, axis=-1)  # (B, F)
    if rir_f is None:
        rir_f = jnp.fft.rfft(rir.astype(jnp.float32), n=fft_len, axis=1)  # (B, F, 2)
    return _convolve_from_fft(seg_f, rir_f, l, sampling_rate, fft_len)


@functools.partial(
    jax.jit, static_argnames=("sampling_rate", "config", "has_distractor", "rir_len")
)
def render_audiogoal(
    sound_padded: jax.Array,
    audio_index: jax.Array,
    rir: jax.Array | None,
    active: jax.Array,
    sampling_rate: int,
    distractor_sound_padded: jax.Array | None = None,
    distractor_rir: jax.Array | None = None,
    has_distractor: bool = False,
    config: SpectrogramConfig | None = None,
    seg_f: jax.Array | None = None,
    distractor_seg_f: jax.Array | None = None,
    rir_f: jax.Array | None = None,
    distractor_rir_f: jax.Array | None = None,
    rir_len: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full audio observation for a batch of envs: audio waveform + spectrogram.

    ``active`` (B,) bool masks envs whose step count exceeds the sound duration
    (reference emits silence then, simulator.py:646-649). The distractor, when
    present, always renders its first second (simulator.py:682-697) and is
    added to the goal audio. ``seg_f``/``distractor_seg_f``: optional
    precomputed segment rFFTs (SceneBank.sound_fft_bank);
    ``rir_f``/``distractor_rir_f`` (+ static ``rir_len``): optional analytic
    RIR spectra (ProceduralRIRBank.gather_fft) replacing the time-domain RIRs.
    """
    cfg = config or SpectrogramConfig(sampling_rate=sampling_rate)
    start = audio_index * sampling_rate
    audio = binaural_convolve(
        sound_padded, start, rir, sampling_rate, seg_f=seg_f, rir_f=rir_f, rir_len=rir_len
    )
    if has_distractor:
        dstart = jnp.zeros_like(start)
        audio = audio + binaural_convolve(
            distractor_sound_padded, dstart, distractor_rir, sampling_rate,
            seg_f=distractor_seg_f, rir_f=distractor_rir_f, rir_len=rir_len,
        )
    audio = jnp.where(active[:, None, None], audio, 0.0)
    spec = spectrogram_from_audiogoal(audio, cfg)
    return audio, spec
