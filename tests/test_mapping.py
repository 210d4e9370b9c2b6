"""Mapping op tests: egomap projection, registration, crops, BFS planning."""

import numpy as np

import jax.numpy as jnp

from avlen_tpu.ops.mapping import (
    depth_to_egomap,
    distance_field,
    egocentric_crop,
    next_action_from_field,
    register_egomap,
)


def test_depth_to_egomap_wall_ahead():
    """A wall 2m ahead occupying image center produces obstacle cells ~2m up
    the map."""
    b, h, w = 1, 16, 16
    depth = np.full((b, h, w, 1), 0.2, np.float32)  # 2m at max_depth 10
    m = np.asarray(depth_to_egomap(jnp.asarray(depth), map_size=15, resolution=0.5))
    assert m.shape == (1, 15, 15, 2)
    obstacle = m[0, :, :, 0]
    rows = np.nonzero(obstacle)[0]
    assert len(rows) > 0
    # 2m forward at 0.5m res → 4 cells up from the bottom row (row 14-4=10)
    assert abs(rows.min() - 10) <= 1


def test_register_and_crop_roundtrip():
    b, g, e = 4, 21, 5
    allo = jnp.zeros((b, g, g, 2))
    ego = np.zeros((b, e, e, 2), np.float32)
    ego[:, 0, e // 2, 0] = 1.0  # obstacle straight ahead at max range (4 cells)
    row = jnp.full((b,), g // 2, jnp.int32)
    col = jnp.full((b,), g // 2, jnp.int32)
    rot = jnp.asarray([0, 1, 2, 3], jnp.int32)
    out = np.asarray(register_egomap(allo, jnp.asarray(ego), row, col, rot))
    h = g // 2
    # obstacle lands 4 cells along each heading: up, left, down, right
    expect = {0: (h - 4, h), 1: (h, h - 4), 2: (h + 4, h), 3: (h, h + 4)}
    for i in range(b):
        pts = [tuple(map(int, p)) for p in np.argwhere(out[i, :, :, 0])]
        assert pts == [expect[i]], (i, pts)
    # egocentric crop (size 9 → ±4 cells) puts it back straight ahead
    size = 9
    crop = np.asarray(egocentric_crop(jnp.asarray(out), row, col, rot, size))
    for i in range(b):
        r, c = np.nonzero(crop[i, :, :, 0])
        assert len(r) == 1
        assert (r[0], c[0]) == (0, size // 2), (i, r, c)


def test_distance_field_and_actions():
    b, g = 1, 9
    occ = np.zeros((b, g, g), np.float32)
    occ[0, 4, 1:8] = 1.0  # wall with a gap at col 0
    d = np.asarray(distance_field(jnp.asarray(occ), jnp.asarray([8]), jnp.asarray([4]), num_iters=40))
    assert d[0, 8, 4] == 0
    assert d[0, 0, 4] > 8  # must detour around the wall
    assert d[0, 4, 4] > 1e5  # blocked cell

    # greedy action from above the wall, facing up (away): should turn
    act = np.asarray(
        next_action_from_field(jnp.asarray(d), jnp.asarray([3]), jnp.asarray([4]), jnp.asarray([0]))
    )
    assert act[0] in (2, 3)  # turn toward the detour

    # at goal: stop
    act2 = np.asarray(
        next_action_from_field(jnp.asarray(d), jnp.asarray([8]), jnp.asarray([4]), jnp.asarray([0]))
    )
    assert act2[0] == 0
