"""Panorama visual features for the speaker.

The reference speaker consumes precomputed ResNet-152 ImageNet panorama
features per viewpoint (36 views × 2048, loaded from ResNet-152-imagenet.tsv
— speaker/tasks/R2R/env.py:40-74; heading-aligned view selection in
_build_action_embedding/_get_obs, env.py:155-235). TPU-native counterpart:
encode the scene frame bank ONCE on device with a GN-ResNet18 tower into a
(S, N, R, D) feature bank (R=4 headings here instead of 36 sub-views), then
world features are pure gathers — no per-query CNN, no host feature files.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.models.resnet import ResNet18

PANO_FEAT_DIM = 128


class PanoramaEncoder(ResNet18):
    """GN-ResNet18 → PANO_FEAT_DIM projection (the from-scratch stand-in for
    frozen ResNet-152 ImageNet features; same role, TPU-friendly size)."""

    num_outputs: int = PANO_FEAT_DIM


def init_panorama_encoder(key, frame_hw: int = 64):
    enc = PanoramaEncoder()
    params = enc.init(key, jnp.zeros((1, frame_hw, frame_hw, 3), jnp.float32))
    return enc, params


def precompute_panorama_features(
    rgb, params, encoder: Optional[PanoramaEncoder] = None, batch: int = 256
) -> np.ndarray:
    """(S, N, R, H, W, 3) uint8 frame bank → (S, N, R, D) float32 features,
    encoded on device in fixed-size batches (one jit)."""
    encoder = encoder or PanoramaEncoder()
    rgb = np.asarray(rgb)
    s, n, r, h, w, c = rgb.shape
    flat = rgb.reshape(-1, h, w, c).astype(np.float32) / 255.0
    apply = jax.jit(lambda p, x: encoder.apply(p, x))
    outs = []
    pad = (-len(flat)) % batch
    if pad:
        flat = np.concatenate([flat, np.zeros((pad, h, w, c), np.float32)])
    for i in range(0, len(flat), batch):
        outs.append(np.asarray(apply(params, jnp.asarray(flat[i : i + batch]))))
    feats = np.concatenate(outs)[: s * n * r]
    return feats.reshape(s, n, r, -1)


def heading_to_rot_index(heading_deg) -> np.ndarray:
    """Nearest frame-bank rotation index for a heading in degrees
    (atan2(dz, dx) convention; rot r faces (270 - 90 r) % 360, the graph
    engine / env orientation layout)."""
    h = np.asarray(heading_deg, np.float64)
    return (np.rint((270.0 - h) / 90.0).astype(np.int64) % 4).astype(np.int32)
