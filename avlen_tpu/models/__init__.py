from avlen_tpu.models.encoders import AudioCNN, VisualCNN
from avlen_tpu.models.rnn_state_encoder import RNNStateEncoder
from avlen_tpu.models.policy import (
    AudioNavBaselineNet,
    CategoricalHead,
    CriticHead,
    Policy,
)

__all__ = [
    "AudioCNN",
    "VisualCNN",
    "RNNStateEncoder",
    "AudioNavBaselineNet",
    "CategoricalHead",
    "CriticHead",
    "Policy",
]
