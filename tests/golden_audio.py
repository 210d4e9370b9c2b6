"""Pure-numpy golden references for the audio pipeline.

These re-implement, from their public definitions, the exact functions the
reference calls from third-party libraries (librosa.stft with 2022-era
defaults, skimage.measure.block_reduce, scipy.signal.fftconvolve windows as
used by soundspaces/simulator.py:644-699). The JAX ops in avlen_tpu.ops.audio
are required to match these bit-for-bit up to float tolerance.
"""

import numpy as np
from scipy.signal import fftconvolve


def periodic_hann(n):
    k = np.arange(n)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)


def librosa_style_stft_mag(y, n_fft=512, hop_length=160, win_length=400, pad_mode="reflect"):
    win = periodic_hann(win_length)
    lpad = (n_fft - win_length) // 2
    window = np.pad(win, (lpad, n_fft - win_length - lpad))
    yp = np.pad(y, n_fft // 2, mode=pad_mode)
    n_frames = 1 + len(y) // hop_length
    frames = np.stack([yp[i * hop_length : i * hop_length + n_fft] * window for i in range(n_frames)])
    return np.abs(np.fft.rfft(frames, axis=-1)).T  # (freq, time)


def skimage_style_block_reduce_mean(x, block=(4, 4)):
    bf, bt = block
    f, t = x.shape
    fp, tp = -(-f // bf) * bf, -(-t // bt) * bt
    xp = np.pad(x, ((0, fp - f), (0, tp - t)))
    return xp.reshape(fp // bf, bf, tp // bt, bt).mean(axis=(1, 3))


def reference_spectrogram(audio_2xT, n_fft=512, hop_length=160, win_length=400):
    """SpectrogramSensor.compute_spectrogram semantics (soundspaces/tasks/nav.py:87-101)."""
    chans = []
    for c in range(2):
        stft = librosa_style_stft_mag(audio_2xT[c], n_fft, hop_length, win_length)
        chans.append(np.log1p(skimage_style_block_reduce_mean(stft)))
    return np.stack(chans, axis=-1)


def reference_audiogoal(sound, rir_2ch, index, sampling_rate):
    """_compute_audiogoal branch logic (soundspaces/simulator.py:659-680).

    sound: (S,) mono source; rir_2ch: (L, 2); index: audio second index.
    """
    if sound.shape[0] == sampling_rate:
        out = np.array([fftconvolve(sound, rir_2ch[:, c]) for c in range(2)])
        return out[:, :sampling_rate]
    if index * sampling_rate - rir_2ch.shape[0] < 0:
        seg = sound[: (index + 1) * sampling_rate]
        out = np.array([fftconvolve(seg, rir_2ch[:, c]) for c in range(2)])
        return out[:, index * sampling_rate : (index + 1) * sampling_rate]
    seg = sound[index * sampling_rate - rir_2ch.shape[0] + 1 : (index + 1) * sampling_rate]
    return np.array([fftconvolve(seg, rir_2ch[:, c], mode="valid") for c in range(2)])
