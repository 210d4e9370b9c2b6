"""Synthetic scene/episode generation for tests and benchmarks.

No Matterport3D/Replica assets ship with this environment, so the framework
generates complete synthetic worlds: grid navigation graphs with random holes
(the shape of SoundSpaces metadata graphs), procedural binaural RIRs, random
source sounds, smooth random RGB-D frame caches, and episode datasets with
reference-compatible info fields (geodesic_distance, num_action — consumed by
NormalizedDTG and SNA as in soundspaces/tasks/nav.py:109-233).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from avlen_tpu.core.episodes import Episode
from avlen_tpu.sim.graph import NavGraph, SceneTables, build_scene_tables, pad_and_stack_tables
from avlen_tpu.sim.scene import ProceduralRIRBank, SceneBank, pad_sounds


def make_grid_scene(rng: np.random.RandomState, side: int = 8, hole_frac: float = 0.15, grid_size: float = 1.0) -> NavGraph:
    """Random grid world: side×side nodes minus random holes, kept connected."""
    keep = rng.rand(side, side) >= hole_frac
    keep[side // 2, side // 2] = True
    # keep the largest connected component
    from scipy.ndimage import label

    lab, n = label(keep)
    if n > 1:
        sizes = [(lab == i).sum() for i in range(1, n + 1)]
        keep = lab == (1 + int(np.argmax(sizes)))

    idx = -np.ones((side, side), np.int32)
    positions = []
    for i in range(side):
        for j in range(side):
            if keep[i, j]:
                idx[i, j] = len(positions)
                # habitat frame: x right, y up, z; grid on x-z plane
                positions.append((j * grid_size, 0.0, i * grid_size))
    edges = []
    for i in range(side):
        for j in range(side):
            if idx[i, j] < 0:
                continue
            if i + 1 < side and idx[i + 1, j] >= 0:
                edges.append((idx[i, j], idx[i + 1, j]))
            if j + 1 < side and idx[i, j + 1] >= 0:
                edges.append((idx[i, j], idx[i, j + 1]))
    return NavGraph(np.array(positions, np.float32), np.array(edges, np.int32))


def make_frames(rng: np.random.RandomState, n_nodes: int, res: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Smooth random RGB-D frames per (node, rotation)."""
    low = rng.randint(0, 255, (n_nodes, 4, res // 8, res // 8, 3), dtype=np.uint8)
    rgb = np.repeat(np.repeat(low, 8, axis=2), 8, axis=3)
    depth = rng.rand(n_nodes, 4, res // 8, res // 8, 1).astype(np.float32)
    depth = np.repeat(np.repeat(depth, 8, axis=2), 8, axis=3)
    return rgb, depth


def make_semantic_frames(
    rng: np.random.RandomState, n_nodes: int, res: int = 64, num_instances: int = 24
) -> Tuple[np.ndarray, np.ndarray]:
    """Pixelwise instance-id frames + instance→mpcat40 map for the synthetic
    SemanticObjectSensor channel: each (node, rot) view shows a few object
    rectangles over background instance 0; instance ids map to a random mix
    of the 21 mapped mpcat40 classes and unmapped ('unknown') ones."""
    from avlen_tpu.sim.mp3d_utils import CATEGORY_TO_MP3D_CATEGORY_ID

    frames = np.zeros((n_nodes, 4, res, res), np.int32)
    for node in range(n_nodes):
        for rot in range(4):
            for _ in range(rng.randint(1, 4)):
                inst = rng.randint(1, num_instances)
                r0, c0 = rng.randint(0, res, 2)
                h, w = rng.randint(res // 8, res // 2, 2)
                frames[node, rot, r0 : r0 + h, c0 : c0 + w] = inst
    mapped = np.asarray(sorted(CATEGORY_TO_MP3D_CATEGORY_ID.values()), np.int32)
    inst_to_mp3d = np.where(
        rng.rand(num_instances) < 0.75,
        mapped[rng.randint(0, len(mapped), num_instances)],
        rng.randint(0, 200, num_instances),  # mostly-unmapped ids
    ).astype(np.int32)
    inst_to_mp3d[0] = 0  # background → void (unmapped)
    return frames, inst_to_mp3d


def make_sounds(rng: np.random.RandomState, num_sounds: int, sampling_rate: int, secs: int = 1) -> List[np.ndarray]:
    """Band-limited noise bursts with per-sound spectral envelopes."""
    sounds = []
    t = np.arange(secs * sampling_rate) / sampling_rate
    for k in range(num_sounds):
        f = 100.0 * (k + 1)
        tone = np.sin(2 * np.pi * f * t) * 0.3
        noise = rng.randn(secs * sampling_rate) * 0.2
        env = 0.5 + 0.5 * np.sin(2 * np.pi * (1.0 + 0.25 * k) * t)
        sounds.append(((tone + noise) * env).astype(np.float32))
    return sounds


def oracle_num_actions(tables: SceneTables, start: int, start_rot_idx: int, goal: int) -> int:
    """Length of the reference's oracle action sequence incl. turns + STOP
    (simulator.py:758-787)."""
    node, count = start, 0
    orient = (270 - start_rot_idx * 90) % 360
    guard = 4 * tables.num_nodes
    while node != goal and count < guard:
        nxt = int(tables.oracle_next[node, goal])
        if nxt < 0:
            break
        p1, p2 = tables.positions[node], tables.positions[nxt]
        d = int(np.around(np.rad2deg(np.arctan2(p2[2] - p1[2], p2[0] - p1[0])))) % 360
        delta = (d - orient) % 360
        if delta == 270:
            count += 1
        elif delta == 90:
            count += 1
        elif delta == 180:
            count += 2
        orient = d
        count += 1  # MOVE_FORWARD
        node = nxt
    return count + 1  # STOP


def make_episodes(
    rng: np.random.RandomState,
    tables_list: List[SceneTables],
    count: int,
    grid_size: float = 1.0,
    num_sounds: int = 4,
    num_categories: int = 21,
    min_hops: int = 2,
    max_hops: int = 50,
    duration: int = 500,
    with_distractor: bool = False,
) -> List[Episode]:
    episodes = []
    tries = 0
    while len(episodes) < count and tries < count * 50:
        tries += 1
        s = rng.randint(len(tables_list))
        t = tables_list[s]
        n = t.num_nodes
        a, b = rng.randint(n), rng.randint(n)
        hops = int(t.hops[a, b])
        if not (min_hops <= hops <= max_hops):
            continue
        rot = rng.randint(4)
        distractor = -1
        dsound = -1
        if with_distractor:
            for _ in range(10):
                c = rng.randint(n)
                if c != b and t.hops[a, c] < 10_000:
                    distractor = c
                    dsound = rng.randint(num_sounds)
                    break
        episodes.append(
            Episode(
                episode_id=str(len(episodes)),
                scene_id=s,
                start_node=a,
                start_rot_idx=rot,
                goal_node=b,
                sound_id=rng.randint(num_sounds),
                duration=duration,
                category=rng.randint(num_categories),
                view_point_nodes=[b],
                distractor_node=distractor,
                distractor_sound_id=dsound,
                geodesic_distance=hops * grid_size,
                num_action=oracle_num_actions(t, a, rot, b),
            )
        )
    if len(episodes) < count:
        raise RuntimeError("Could not sample enough episodes; relax hop bounds")
    return episodes


def make_scene_bank(
    rng: Optional[np.random.RandomState] = None,
    num_scenes: int = 1,
    side: int = 8,
    grid_size: float = 1.0,
    sampling_rate: int = 16000,
    rir_length: int = 2000,
    num_sounds: int = 4,
    sound_secs: int = 1,
    frame_res: int = 64,
    with_frames: bool = True,
) -> Tuple[SceneBank, List[SceneTables]]:
    rng = rng or np.random.RandomState(0)
    tables_list = [build_scene_tables(make_grid_scene(rng, side, grid_size=grid_size)) for _ in range(num_scenes)]
    stacked = pad_and_stack_tables(tables_list)
    n_max = stacked["positions"].shape[1]

    rgb = depth = semantic = inst_maps = None
    if with_frames:
        rgbs, depths, sems, maps = [], [], [], []
        for t in tables_list:
            r, d = make_frames(rng, t.num_nodes, frame_res)
            s, m = make_semantic_frames(rng, t.num_nodes, frame_res)
            rp = np.zeros((n_max,) + r.shape[1:], np.uint8)
            dp = np.zeros((n_max,) + d.shape[1:], np.float32)
            sp = np.zeros((n_max,) + s.shape[1:], np.int32)
            rp[: t.num_nodes], dp[: t.num_nodes], sp[: t.num_nodes] = r, d, s
            rgbs.append(rp)
            depths.append(dp)
            sems.append(sp)
            maps.append(m)
        rgb = jnp.asarray(np.stack(rgbs))
        depth = jnp.asarray(np.stack(depths))
        semantic = jnp.asarray(np.stack(sems))
        inst_maps = jnp.asarray(np.stack(maps))

    sounds = make_sounds(rng, num_sounds, sampling_rate, sound_secs)
    sounds_padded, secs = pad_sounds(sounds, rir_length, sampling_rate)

    tables = {k: jnp.asarray(v) for k, v in stacked.items()}
    bank = SceneBank(
        tables=tables,
        sounds_padded=jnp.asarray(sounds_padded),
        sound_secs=jnp.asarray(secs),
        rir=ProceduralRIRBank(
            positions=tables["positions"], length=rir_length, sampling_rate=sampling_rate
        ).ensure_tables(),
        rgb=rgb,
        depth=depth,
        semantic=semantic,
        semantic_instance_to_mp3d=inst_maps,
        grid_size=grid_size,
        sampling_rate=sampling_rate,
    )
    return bank, tables_list
