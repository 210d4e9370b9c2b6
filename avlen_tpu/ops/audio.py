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


def _ct_factors(h: int) -> Tuple[int, int]:
    """h (a power of two) = n1 * n2 with n1 = 2^ceil(log2(sqrt(h))) — the
    2-stage Cooley-Tukey split whose cross-twiddle e^{2πi·n1²k2j/h} is unity
    (n1² is a multiple of h for powers of two)."""
    n1 = 1
    while n1 * n1 < h:
        n1 *= 2
    return n1, h // n1


@functools.lru_cache(maxsize=8)
def _partial_irfft_consts(fft_len: int, out_start: int, out_len: int):
    """f32 re/im constant tables for partial_irfft_matmul (numpy, cached).

    Stored as separate re/im f32 planes — complex64 constants would have to
    be transferred host→device, which this TPU's PJRT (axon) does not
    implement; lax.complex assembles them inside the traced program."""
    n = fft_len
    h = n // 2
    n1, n2 = _ct_factors(h)
    # output sample range n ∈ [out_start, out_start+out_len) → packed index
    # t ∈ [t0, t1) (y[2t], y[2t+1] = Re/Im z[t]) → row block j ∈ [j0, j1)
    t0 = out_start // 2
    t1 = (out_start + out_len + 1) // 2
    j0, j1 = t0 // n1, (t1 - 1) // n1 + 1
    k = np.arange(h)
    pack = np.exp(2j * np.pi * k / n)  # e^{2πik/N}
    m_mat = np.exp(2j * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n2)
    tw = np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / h)
    e2 = np.exp(2j * np.pi * np.outer(np.arange(j0, j1), np.arange(n1)) / n2)

    def ri(z):
        return (np.ascontiguousarray(z.real, np.float32),
                np.ascontiguousarray(z.imag, np.float32))

    return dict(n1=n1, n2=n2, j0=j0, j1=j1, pack=ri(pack), m=ri(m_mat),
                tw=ri(tw), e2=ri(e2))


def partial_irfft_matmul(
    spec: jax.Array, fft_len: int, out_start: int, out_len: int
) -> jax.Array:
    """``jnp.fft.irfft(spec, n=fft_len)[..., out_start:out_start+out_len]``
    computed on the MXU instead of the FFT custom-call.

    XLA:TPU's length-2^16 FFT lowers to a chain of layout-copy + transpose
    fusions that dominated the non-banked audio superstep (r4 profile:
    ~65% of rollout device time). This path (a) packs the real inverse FFT
    into a half-length complex inverse DFT (y[2t], y[2t+1] = Re/Im z[t]),
    (b) splits that DFT into two dense matmuls + a twiddle via radix-√H
    Cooley-Tukey, and (c) computes ONLY the output rows covering the
    requested window — for the valid-conv audio window that is ~25% of the
    spectrum, a saving a general FFT cannot express. Matmuls run at
    Precision.HIGHEST (f32-accurate on the MXU); exactness vs jnp.fft.irfft
    is pinned by tests/test_partial_irfft.py.
    """
    c = _partial_irfft_consts(fft_len, out_start, out_len)
    n1, n2, j0, j1 = c["n1"], c["n2"], c["j0"], c["j1"]
    h = fft_len // 2
    hi = jax.lax.Precision.HIGHEST

    def cplx(pair):
        return jax.lax.complex(jnp.asarray(pair[0]), jnp.asarray(pair[1]))

    # Reshape to (n2, n1) blocks BEFORE the hermitian pack. The reshape is a
    # bitcast (n1 stays minor), so XLA's layout assignment cannot propagate
    # the stage-1 dot's transposed operand layout past it into the
    # elementwise pack chain and up to the RIR-table gather — doing the pack
    # first left a (2, B, 2, F) relayout copy at the gather, tiled T(8,128)
    # over the (B, ch=2) minor dims, i.e. 64× tile padding: ~3 ms/env-step,
    # the single largest op in the r4 superstep trace. Reversing the
    # contiguous h-long slice X[1:h+1] is a double flip in (n2, n1) space:
    # h-1-k = (n2-1-k2)·n1 + (n1-1-k1) for k = k2·n1 + k1.
    xk = spec[..., :h].reshape(*spec.shape[:-1], n2, n1)
    xr = jnp.conj(
        jnp.flip(
            spec[..., 1 : h + 1].reshape(*spec.shape[:-1], n2, n1),
            axis=(-2, -1),
        )
    )  # X[H-k] at block (k2, k1)
    pack2 = cplx(c["pack"]).reshape(n2, n1)
    packed = 0.5 * (xk + xr) + 0.5j * ((xk - xr) * pack2)  # (..., n2, n1)
    # stage 1: n2-point DFTs per k1 column → (..., k1, m)
    c1 = jnp.einsum("...ka,km->...am", packed, cplx(c["m"]), precision=hi)
    d = cplx(c["tw"]) * c1
    # stage 2: only the j rows covering the window → (..., j, m)
    z = jnp.einsum("jk,...km->...jm", cplx(c["e2"]), d, precision=hi) / h
    y = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)  # y[2t], y[2t+1]
    y = y.reshape(*y.shape[:-3], (j1 - j0) * n1 * 2)
    off = out_start - 2 * j0 * n1
    return jax.lax.slice_in_dim(y, off, off + out_len, axis=-1)


# "auto": MXU matmul path on TPU backends, FFT custom-call elsewhere (CPU
# FFTs are fast and CPU dense DFT matmuls are not). Overridable for tests
# and A/B timing via AVLEN_MATMUL_IRFFT=0/1.
def _use_matmul_irfft(fft_len: int) -> bool:
    import os

    flag = os.environ.get("AVLEN_MATMUL_IRFFT", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() not in ("cpu",) and fft_len >= 4096


def _use_pallas_irfft(fft_len: int) -> bool:
    """Fused Pallas partial-irfft kernel (ops/pallas_irfft.py) on real TPU
    for tile-clean sizes; "auto" excludes CPU (no Mosaic) and the virtual
    mesh. AVLEN_PALLAS_IRFFT=0/1 overrides for tests and A/B timing."""
    import os

    from avlen_tpu.ops import pallas_irfft

    flag = os.environ.get("AVLEN_PALLAS_IRFFT", "auto")
    if flag == "0":
        return False
    if not pallas_irfft.supported(fft_len):
        return False
    if flag == "1":
        return True
    return jax.default_backend() not in ("cpu",)


def _convolve_from_fft(
    prod: jax.Array,
    rir_len: int,
    sampling_rate: int,
    fft_len: int,
) -> jax.Array:
    """(B, 2, F) product spectra (seg_f × rir_f) → (B, 2, sr) valid windows.

    Channel-major so the irfft runs along the MINOR axis: XLA:TPU lowers a
    non-minor-axis FFT to a custom-call with a transposed layout constraint
    and inserts a full copy of the (B, fft_len, 2) time-domain output (~13%
    of the non-banked superstep's device time in the r4 profile). On TPU the
    inverse transform itself runs as MXU matmuls over only the valid window
    (partial_irfft_matmul); elsewhere as the FFT custom-call + slice."""
    if _use_pallas_irfft(fft_len):
        from avlen_tpu.ops.pallas_irfft import partial_irfft_pallas

        return partial_irfft_pallas(prod, fft_len, rir_len - 1, sampling_rate)
    if _use_matmul_irfft(fft_len):
        return partial_irfft_matmul(prod, fft_len, rir_len - 1, sampling_rate)
    conv = jnp.fft.irfft(prod, n=fft_len, axis=-1)  # (B, 2, fft_len)
    return jax.lax.dynamic_slice_in_dim(conv, rir_len - 1, sampling_rate, axis=2)


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
      rir_f: optional (B, 2, F) channel-major complex RIR spectra at the
        convolution FFT length (ProceduralRIRBank.gather_fft) — skips the
        per-step RIR rFFT entirely; requires static ``rir_len`` (= L).

    Returns: (B, 2, sampling_rate) audio, equal to the reference's
    ``_compute_audiogoal`` branches (simulator.py:659-680) for every window.
    """
    prod, l, fft_len = _product_spectrum(
        sound_padded, window_start, rir, sampling_rate, seg_f, rir_f, rir_len
    )
    return _convolve_from_fft(prod, l, sampling_rate, fft_len)


def _product_spectrum(
    sound_padded, window_start, rir, sampling_rate, seg_f, rir_f, rir_len
):
    """(B, 2, F) product spectrum seg_f × rir_f (+ the L, fft_len statics) —
    split out so render_audiogoal can SUM goal+distractor spectra and pay
    ONE inverse transform (convolution is linear)."""
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
        # channel-major (B, 2, F): FFT along the minor axis (see
        # _convolve_from_fft's layout note)
        rir_f = jnp.fft.rfft(
            rir.swapaxes(1, 2).astype(jnp.float32), n=fft_len, axis=-1
        )
    return seg_f[:, None, :] * rir_f, l, fft_len


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
    prod, l, fft_len = _product_spectrum(
        sound_padded, start, rir, sampling_rate, seg_f, rir_f, rir_len
    )
    if has_distractor:
        # convolution is linear: sum the goal+distractor product spectra and
        # pay ONE inverse transform (both share fft_len/rir_len — same bank)
        dstart = jnp.zeros_like(start)
        dprod, dl, dfft = _product_spectrum(
            distractor_sound_padded, dstart, distractor_rir, sampling_rate,
            distractor_seg_f, distractor_rir_f, rir_len,
        )
        assert (dl, dfft) == (l, fft_len)
        prod = prod + dprod
    audio = _convolve_from_fft(prod, l, sampling_rate, fft_len)
    audio = jnp.where(active[:, None, None], audio, 0.0)
    spec = spectrogram_from_audiogoal(audio, cfg)
    return audio, spec
