"""Batched mapping ops for AV-WAN: egomap projection, map registration,
egocentric crops, and device BFS planning.

Replaces the reference's per-env numpy mapping stack:
* EgoMap sensor (soundspaces/tasks/nav.py:236-406): depth → top-down
  occupancy with camera intrinsics and height thresholds — here one jitted
  scatter over the point cloud for the whole env batch.
* Mapper (ss_baselines/av_wan/models/mapper.py:27-345): allocentric
  geometric/acoustic maps registered from egomaps with 90°-rotation
  ego↔allo transforms — here pure (B, G, G, C) array updates (rot90 +
  dynamic-slice scatter), resident in HBM.
* Planner graph search (av_wan/models/planner.py:19-209): networkx Dijkstra
  over the map lattice — here a min-plus BFS relaxation (`distance_field`)
  over the occupancy grid, batched across envs, bounded by the map diameter.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("map_size", "resolution", "hfov_deg", "max_depth"))
def depth_to_egomap(
    depth: jnp.ndarray,  # (B, H, W, 1) normalized [0,1] or meters
    map_size: int = 31,
    resolution: float = 0.5,
    hfov_deg: float = 90.0,
    max_depth: float = 10.0,
    height_low: float = 0.2,
    height_high: float = 1.5,
    camera_height: float = 1.25,
) -> jnp.ndarray:
    """(B, map_size, map_size, 2): [obstacle, explored] egocentric top-down map.

    The agent sits at the bottom-center row facing up the map (+rows forward).
    """
    b, h, w, _ = depth.shape
    d = depth[..., 0] * max_depth  # meters
    f = (w / 2.0) / np.tan(np.deg2rad(hfov_deg / 2.0))
    us = (jnp.arange(w) - w / 2.0 + 0.5) / f
    vs = (jnp.arange(h) - h / 2.0 + 0.5) / f
    x = d * us[None, None, :]  # rightward
    y = -d * vs[None, :, None] + camera_height  # height above floor
    z = d  # forward

    valid = (d > 0.1) & (d < max_depth * 0.99)
    obstacle = valid & (y > height_low) & (y < height_high)
    explored = valid & (y <= height_high)

    half = map_size // 2
    col = jnp.clip((x / resolution).astype(jnp.int32) + half, 0, map_size - 1)
    row = jnp.clip(map_size - 1 - (z / resolution).astype(jnp.int32), 0, map_size - 1)
    flat = row * map_size + col

    def scatter(mask):
        m = jnp.zeros((b, map_size * map_size), jnp.float32)
        m = jax.vmap(lambda mm, ff, vv: mm.at[ff.reshape(-1)].max(vv.reshape(-1)))(
            m, flat, mask.astype(jnp.float32)
        )
        return m.reshape(b, map_size, map_size)

    return jnp.stack([scatter(obstacle), scatter(explored)], axis=-1)


def _rot90_batch(m: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-env rot90 by k[i] quarter turns; m (B, G, G, C), k (B,) i32."""
    ms = [m, jnp.rot90(m, 1, (1, 2)), jnp.rot90(m, 2, (1, 2)), jnp.rot90(m, 3, (1, 2))]
    stacked = jnp.stack(ms, 0)  # (4, B, G, G, C)
    return jnp.take_along_axis(stacked, (k % 4)[None, :, None, None, None], axis=0)[0]


@jax.jit
def register_egomap(
    allo_map: jnp.ndarray,  # (B, G, G, 2)
    ego_map: jnp.ndarray,  # (B, E, E, 2)
    row: jnp.ndarray,  # (B,) agent row in allo map
    col: jnp.ndarray,  # (B,) agent col
    rot: jnp.ndarray,  # (B,) quarter-turns CCW of agent heading vs map-up
) -> jnp.ndarray:
    """Paste the egomap (agent at bottom-center facing up) into the allocentric
    map at the agent pose (max-combine, mapper.py:116-160 semantics)."""
    b, g, _, c = allo_map.shape
    e = ego_map.shape[1]
    half = e // 2
    rotated = _rot90_batch(ego_map, rot)  # CCW so ego 'up' aligns with heading

    # agent cell inside the CCW-by-rot rotated ego map (starts at
    # bottom-center (e-1, half) facing up)
    ar = jnp.asarray([e - 1, half, 0, half], jnp.int32)[rot % 4]
    ac = jnp.asarray([half, e - 1, half, 0], jnp.int32)[rot % 4]
    top = row - ar  # (B,)
    left = col - ac

    # one vectorized gather: for every allo cell, read the rotated ego cell it
    # maps to (out-of-window cells contribute 0); max-combine into the map
    gi = jnp.arange(g)
    ei = gi[None, :, None] - top[:, None, None]  # (B, G, 1)
    ej = gi[None, None, :] - left[:, None, None]  # (B, 1, G)
    inb = (ei >= 0) & (ei < e) & (ej >= 0) & (ej < e)  # (B, G, G)
    eis = jnp.clip(ei, 0, e - 1)
    ejs = jnp.clip(ej, 0, e - 1)
    bidx = jnp.arange(b)[:, None, None]
    vals = rotated[bidx, jnp.broadcast_to(eis, (b, g, g)), jnp.broadcast_to(ejs, (b, g, g))]
    vals = jnp.where(inb[..., None], vals, 0.0)
    return jnp.maximum(allo_map, vals)


@functools.partial(jax.jit, static_argnames=("size",))
def egocentric_crop(
    allo_map: jnp.ndarray,  # (B, G, G, C)
    row: jnp.ndarray,
    col: jnp.ndarray,
    rot: jnp.ndarray,
    size: int,
) -> jnp.ndarray:
    """Crop a (size, size) window centered at the agent, rotated so the agent
    faces up (mapper.get_egocentric_* semantics)."""
    b, g, _, c = allo_map.shape
    half = size // 2
    si = jnp.arange(size)
    gi = jnp.clip(row[:, None, None] - half + si[None, :, None], 0, g - 1)
    gj = jnp.clip(col[:, None, None] - half + si[None, None, :], 0, g - 1)
    bidx = jnp.arange(b)[:, None, None]
    patches = allo_map[bidx, jnp.broadcast_to(gi, (b, size, size)), jnp.broadcast_to(gj, (b, size, size))]
    return _rot90_batch(patches, -rot)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def distance_field(
    occupancy: jnp.ndarray,  # (B, G, G) 1 = blocked
    goal_row: jnp.ndarray,  # (B,)
    goal_col: jnp.ndarray,  # (B,)
    num_iters: int = 64,
) -> jnp.ndarray:
    """Min-plus BFS distances from the goal over free cells (planner Dijkstra
    equivalent; unit edge weights on the 4-neighborhood)."""
    b, g, _ = occupancy.shape
    big = jnp.float32(1e6)
    dist = jnp.full((b, g, g), big)
    dist = jax.vmap(lambda d, r, c: d.at[r, c].set(0.0))(dist, goal_row, goal_col)
    blocked = occupancy > 0.5

    def body(_, d):
        up = jnp.pad(d[:, 1:, :], ((0, 0), (0, 1), (0, 0)), constant_values=big)
        down = jnp.pad(d[:, :-1, :], ((0, 0), (1, 0), (0, 0)), constant_values=big)
        left = jnp.pad(d[:, :, 1:], ((0, 0), (0, 0), (0, 1)), constant_values=big)
        right = jnp.pad(d[:, :, :-1], ((0, 0), (0, 0), (1, 0)), constant_values=big)
        best = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right)) + 1.0
        d2 = jnp.minimum(d, best)
        return jnp.where(blocked, big, d2)

    return jax.lax.fori_loop(0, num_iters, body, jnp.where(blocked, big, dist))


@jax.jit
def next_action_from_field(
    dist: jnp.ndarray,  # (B, G, G)
    row: jnp.ndarray,
    col: jnp.ndarray,
    orientation: jnp.ndarray,  # (B,) quarter turns: 0=up(-row),1=left,2=down,3=right
) -> jnp.ndarray:
    """Greedy next low-level action toward decreasing distance (planner.plan
    semantics, planner.py:89-118: rotate to face the best neighbor then
    forward; STOP when at minimum)."""
    b, g, _ = dist.shape

    def one(d, r0, c0, o):
        here = d[r0, c0]
        up = d[jnp.maximum(r0 - 1, 0), c0]
        down = d[jnp.minimum(r0 + 1, g - 1), c0]
        lef = d[r0, jnp.maximum(c0 - 1, 0)]
        rig = d[r0, jnp.minimum(c0 + 1, g - 1)]
        nbrs = jnp.stack([up, lef, down, rig])  # indexed by direction 0..3
        best_dir = jnp.argmin(nbrs)
        improves = nbrs[best_dir] < here
        delta = (best_dir - o) % 4
        action = jnp.where(
            delta == 0, 1, jnp.where(delta == 1, 2, jnp.where(delta == 3, 3, 3))
        )  # fwd / left / right / (180°→right)
        return jnp.where(improves, action, 0)

    return jax.vmap(one)(dist, row, col, orientation).astype(jnp.int32)
