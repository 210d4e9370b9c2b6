"""Generate a tiny reference-format data tree for ingestion tests.

Produces (under ``tests/data/reference_tree/``) every on-disk format the
reference trains from, at miniature scale:

* ``metadata/mp3d/sceneA/{points.txt,graph.pkl}`` — a 2×2 grid graph with
  networkx node ``point`` attributes (soundspaces/utils.py:16-42)
* ``binaural_rirs/mp3d/sceneA/{0,90,180,270}/{r}_{s}.wav`` — float32 stereo
  RIRs per (azimuth, receiver, source) (soundspaces/simulator.py:644-662)
* ``sounds/1s_all/*.wav`` — 1-second mono source sounds
* ``scene_observations/mp3d/sceneA.pkl`` — ``(node, angle) -> {rgb, depth}``
  (scripts/cache_observations.py:103-108)
* ``datasets/semantic_audionav/v1/train/train.json.gz`` +
  ``content/sceneA.json.gz`` — SemanticAudioNav episode shards
  (semantic_audionav_dataset.py:32-256)

Deterministic: re-running reproduces byte-identical content (fixed RNG).
"""

from __future__ import annotations

import gzip
import json
import os
import pickle

import numpy as np

SR = 4000
RIR_LEN = 200
GRID = 1.0


def positions_2x2():
    # habitat frame (x, y, z); nodes 0..3 on the x-z plane
    return np.array(
        [[0.0, 0.1, 0.0], [1.0, 0.1, 0.0], [0.0, 0.1, 1.0], [1.0, 0.1, 1.0]],
        np.float32,
    )


def quat_about_y(angle_deg: float):
    h = np.deg2rad(angle_deg) / 2.0
    return [0.0, float(np.sin(h)), 0.0, float(np.cos(h))]


def main(root: str) -> None:
    import networkx as nx
    from scipy.io import wavfile

    rng = np.random.RandomState(0)
    pos = positions_2x2()
    scene = "sceneA"

    # --- metadata ---------------------------------------------------------
    meta_dir = os.path.join(root, "metadata", "mp3d", scene)
    os.makedirs(meta_dir, exist_ok=True)
    # points.txt rows [i, x, -z, y + 1.5]: load_metadata maps them back via
    # (c1, c3 - 1.5, -c2) (soundspaces/utils.py:27-35)
    rows = [
        [i, p[0], -p[2], p[1] + 1.5] for i, p in enumerate(pos)
    ]
    np.savetxt(os.path.join(meta_dir, "points.txt"), np.array(rows), delimiter="\t")
    g = nx.Graph()
    for i, p in enumerate(pos):
        g.add_node(i, point=tuple(float(v) for v in p))
    for a, b in [(0, 1), (2, 3), (0, 2), (1, 3)]:
        g.add_edge(a, b)
    with open(os.path.join(meta_dir, "graph.pkl"), "wb") as f:
        pickle.dump(g, f)

    # --- binaural RIRs ----------------------------------------------------
    n = len(pos)
    for az in (0, 90, 180, 270):
        az_dir = os.path.join(root, "binaural_rirs", "mp3d", scene, str(az))
        os.makedirs(az_dir, exist_ok=True)
        for r in range(n):
            for s in range(n):
                rir = np.zeros((RIR_LEN, 2), np.float32)
                d = max(int(np.linalg.norm(pos[r] - pos[s]) * 20), 1)
                rir[d, 0] = 1.0 / d
                rir[d + 2, 1] = 0.8 / d
                rir[d:] += (
                    rng.randn(RIR_LEN - d, 2).astype(np.float32)
                    * 0.01
                    * np.exp(-np.arange(RIR_LEN - d) / 40.0)[:, None]
                )
                wavfile.write(os.path.join(az_dir, f"{r}_{s}.wav"), SR, rir)

    # --- source sounds ----------------------------------------------------
    snd_dir = os.path.join(root, "sounds", "1s_all")
    os.makedirs(snd_dir, exist_ok=True)
    t = np.arange(SR) / SR
    for name, freq in [("telephone.wav", 440.0), ("water.wav", 150.0)]:
        wave = (np.sin(2 * np.pi * freq * t) * 0.5).astype(np.float32)
        wavfile.write(os.path.join(snd_dir, name), SR, wave)

    # --- frame cache ------------------------------------------------------
    obs_dir = os.path.join(root, "scene_observations", "mp3d")
    os.makedirs(obs_dir, exist_ok=True)
    cache = {}
    for node in range(n):
        for angle in (0, 90, 180, 270):
            cache[(node, angle)] = {
                "rgb": rng.randint(0, 255, (16, 16, 3), dtype=np.uint8),
                "depth": rng.rand(16, 16, 1).astype(np.float32),
                # pixelwise instance ids (SemanticObjectSensor input,
                # soundspaces/tasks/nav.py:676-698): instances 0..2
                "semantic": rng.randint(0, 3, (16, 16), dtype=np.int32),
            }
    with open(os.path.join(obs_dir, scene + ".pkl"), "wb") as f:
        pickle.dump(cache, f)

    # --- .house metadata (instance → mpcat40 for the semantic remap) -------
    house = "\n".join(
        [
            "H name 0 0 0 0 0 0 11 1 1 3 2 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0",
            "L 0 1 0 label 0 0 0 0 0 0 0 0 0 0 0 0 0",
            "R 0 0 0 0 b 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0",
            "C 3 3 chair 3 chair 0 0 0 0 0",
            "C 7 7 bath#tub 25 bathtub 0 0 0 0 0",
            # instance 0 chair, instance 1 bathtub, instance 2 chair
            "O 0 0 3 1.0 2.0 3.0 1 0 0 0 1 0 0.5 0.5 0.5 0 0 0 0 0 0 0 0",
            "O 1 0 7 4.0 5.0 6.0 1 0 0 0 1 0 1.0 1.0 1.0 0 0 0 0 0 0 0 0",
            "O 2 0 3 7.0 8.0 9.0 1 0 0 0 1 0 1.0 1.0 1.0 0 0 0 0 0 0 0 0",
            "",
        ]
    )
    with open(os.path.join(meta_dir, scene + ".house"), "w") as f:
        f.write(house)

    # --- episode dataset ---------------------------------------------------
    def episode(eid, start, rot_deg, goal, sound, offset, duration, category,
                distractor=None, dsound=None):
        ep = {
            "episode_id": str(eid),
            "scene_id": f"data/scene_datasets/mp3d/{scene}/{scene}.glb",
            "start_position": [float(v) for v in pos[start]],
            "start_rotation": quat_about_y(rot_deg),
            "info": {"geodesic_distance": float(GRID), "num_action": 3},
            "goals": [
                {
                    "position": [float(v) for v in pos[goal]],
                    "radius": 1e-5,
                    "object_id": "0",
                    "object_category": category,
                    "view_points": [
                        {"agent_state": {"position": [float(v) for v in pos[goal]]}}
                    ],
                }
            ],
            "object_category": category,
            "sound_id": sound,
            "offset": offset,
            "duration": duration,
        }
        if distractor is not None:
            ep["distractor_position_index"] = distractor
            ep["distractor_sound_id"] = dsound
        return ep

    ds_dir = os.path.join(root, "datasets", "semantic_audionav", "v1", "train")
    os.makedirs(os.path.join(ds_dir, "content"), exist_ok=True)
    top = {"episodes": [episode(0, 0, 0, 3, "telephone.wav", 0, 500, "chair")]}
    with gzip.open(os.path.join(ds_dir, "train.json.gz"), "wt") as f:
        json.dump(top, f)
    shard = {
        "episodes": [
            episode(1, 1, 90, 2, "water.wav", 5, 30, "table",
                    distractor=0, dsound="telephone.wav"),
            episode(2, 3, 270, 0, "telephone.wav", 0, 500, "cushion"),
        ]
    }
    with gzip.open(os.path.join(ds_dir, "content", scene + ".json.gz"), "wt") as f:
        json.dump(shard, f)

    print(f"reference fixtures written under {root}")


if __name__ == "__main__":
    main(os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_tree"))
