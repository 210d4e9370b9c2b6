"""avlen_tpu: a TPU-native audio-visual-language embodied navigation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
merlresearch/avlen (audio-visual-language embodied navigation): a
SoundSpaces-style acoustic simulator whose hot path (binaural RIR
convolution + STFT spectrograms) runs as fused XLA programs on device, a
batched device-resident graph navigation environment, the AV-Nav / AV-WAN /
SAVi / AVLEN agent stacks, and PPO/DD-PPO training with on-device rollout
storage and ICI all-reduce gradient sync.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  ops/      fused audio kernels (RIR conv, STFT, spectrogram), map projection
  sim/      graph scenes, batched device env, sensors, measures, episodes
  core/     registry, config, episode datasets
  models/   Flax modules: CNN/ResNet encoders, SMT, CLIP text, policies
  rl/       rollout storage, GAE, PPO/DDPPO, trainers
  parallel/ mesh construction, collectives, distributed init
  dialog/   speaker model (R2R-style), pose-graph engine, question gen
  utils/    checkpointing, tensorboard, video, logging
"""

__version__ = "0.1.0"

from avlen_tpu.core.registry import registry  # noqa: F401
