"""Obs transformer tests (resize / center-crop semantics)."""

import numpy as np

import jax.numpy as jnp

from avlen_tpu.utils.obs_transformers import (
    CenterCropper,
    ResizeCenterCropper,
    ResizeShortestEdge,
    apply_obs_transforms,
)


def test_resize_shortest_edge():
    obs = {"rgb": jnp.zeros((2, 64, 128, 3), jnp.uint8), "pose": jnp.zeros((2, 4))}
    out = ResizeShortestEdge(32)(obs)
    assert out["rgb"].shape == (2, 32, 64, 3)
    assert out["pose"].shape == (2, 4)  # non-image keys untouched


def test_center_crop():
    img = np.zeros((1, 10, 10, 1), np.float32)
    img[0, 4:6, 4:6, 0] = 1.0
    out = CenterCropper((4, 4))({"depth": jnp.asarray(img)})
    assert out["depth"].shape == (1, 4, 4, 1)
    assert float(out["depth"].sum()) == 4.0  # center content preserved


def test_resize_center_cropper_pipeline():
    obs = {"rgb": jnp.zeros((1, 100, 80, 3), jnp.uint8)}
    out = apply_obs_transforms(obs, [ResizeCenterCropper((64, 64))])
    assert out["rgb"].shape == (1, 64, 64, 3)
