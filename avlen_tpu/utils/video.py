"""Video generation with muxed binaural audio.

Capability match for generate_video / images_to_video_with_audio
(ss_baselines/common/utils.py:187-238, 289-340): writes episode frame stacks
to disk and/or tensorboard, muxing the episode's binaural audio track when
ffmpeg is available (falling back to silent video + a .wav sidecar).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import wave
from typing import List, Optional

import numpy as np

from avlen_tpu.utils.logging import logger


def write_wav(path: str, audio: np.ndarray, sampling_rate: int) -> None:
    """audio (T, 2) float in [-1, 1] → 16-bit stereo wav."""
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(pcm.shape[1] if pcm.ndim == 2 else 1)
        f.setsampwidth(2)
        f.setframerate(sampling_rate)
        f.writeframes(pcm.tobytes())


def images_to_video(path: str, images: List[np.ndarray], fps: int = 10) -> str:
    """Write frames; falls back to .gif when no mp4 backend (ffmpeg) exists.
    Returns the path actually written."""
    import imageio

    try:
        with imageio.get_writer(path, fps=fps) as w:
            for img in images:
                w.append_data(img.astype(np.uint8))
        return path
    except (ValueError, ImportError):
        alt = os.path.splitext(path)[0] + ".gif"
        with imageio.get_writer(alt, duration=1000.0 / fps) as w:
            for img in images:
                w.append_data(img.astype(np.uint8))
        logger.info(f"no mp4 backend; wrote {alt}")
        return alt


def images_to_video_with_audio(
    path: str,
    images: List[np.ndarray],
    audio: Optional[np.ndarray],
    sampling_rate: int = 16000,
    fps: int = 10,
) -> None:
    """Mux frames + audio when ffmpeg exists; otherwise silent video + wav."""
    path = images_to_video(path, images, fps)
    if audio is None:
        return
    wav_path = os.path.splitext(path)[0] + ".wav"
    write_wav(wav_path, audio, sampling_rate)
    ffmpeg = shutil.which("ffmpeg")
    if not ffmpeg or not path.endswith(".mp4"):
        logger.info(f"ffmpeg not available; wrote {path} + {wav_path} separately")
        return
    muxed = os.path.splitext(path)[0] + "_av.mp4"
    try:
        subprocess.run(
            [ffmpeg, "-y", "-loglevel", "error", "-i", path, "-i", wav_path,
             "-c:v", "copy", "-c:a", "aac", "-shortest", muxed],
            check=True,
        )
        os.replace(muxed, path)
        os.remove(wav_path)
    except subprocess.CalledProcessError as e:
        logger.warning(f"audio mux failed: {e}")


def generate_video(
    video_option: List[str],
    video_dir: Optional[str],
    images: List[np.ndarray],
    episode_id: str,
    checkpoint_idx: int,
    metrics: dict,
    tb_writer=None,
    audios: Optional[np.ndarray] = None,
    sampling_rate: int = 16000,
    fps: int = 10,
) -> None:
    """generate_video semantics (common/utils.py:187-238): name encodes
    episode + metrics; writes to disk and/or tensorboard per video_option."""
    if not images:
        return
    metric_str = "-".join(f"{k}={v:.2f}" for k, v in metrics.items())
    name = f"episode={episode_id}-ckpt={checkpoint_idx}-{metric_str}"
    if "disk" in video_option and video_dir:
        os.makedirs(video_dir, exist_ok=True)
        images_to_video_with_audio(
            os.path.join(video_dir, name + ".mp4"), images, audios, sampling_rate, fps
        )
    if "tensorboard" in video_option and tb_writer is not None:
        tb_writer.add_video_from_np_images(f"episode{episode_id}", checkpoint_idx, images, fps=fps)
