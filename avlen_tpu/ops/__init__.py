from avlen_tpu.ops.audio import (
    SpectrogramConfig,
    binaural_convolve,
    block_reduce_mean,
    render_audiogoal,
    spectrogram_from_audiogoal,
    stft_magnitude,
)

__all__ = [
    "SpectrogramConfig",
    "binaural_convolve",
    "block_reduce_mean",
    "render_audiogoal",
    "spectrogram_from_audiogoal",
    "stft_magnitude",
]
