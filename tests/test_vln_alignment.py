"""R2R / VLN-CE → SoundSpaces dialog-episode alignment on fabricated,
format-exact fixtures (reference: scripts/generate_vln_episode.py).

World under test: an L-shaped 8-node scene graph (nodes 0-4 along +x, then
5-7 along +z from node 4) with one MatterSim connectivity viewpoint floating
1.5 m above each node. One FGR2R trajectory walks the whole L; its first
sub-instruction covers the straight leg (nodes 0-4), the second the turn
(nodes 4-7)."""

import gzip
import json
import os

import numpy as np
import pytest

from avlen_tpu.data.reference import load_reference_episodes
from avlen_tpu.data.vln import (
    adjust_fgr2r_headings,
    build_view2node,
    generate_dialog_dataset,
    load_connectivity,
    match_fgr2r_to_vlnce,
)
from avlen_tpu.sim.graph import NavGraph

SCAN = "testscan"
FULL_INSTR = "walk down the hall then turn left to the door"
SUB1 = ["walk", "down", "the", "hall"]
SUB2 = ["turn", "left", "to", "the", "door"]


def _graph() -> NavGraph:
    pos = np.array(
        [[i, 0, 0] for i in range(5)] + [[4, 0, z] for z in (1, 2, 3)], np.float32
    )
    edges = np.array([[i, i + 1] for i in range(7)], np.int32)
    return NavGraph(positions=pos, edges=edges)


def _pose_for(habitat_pos):
    """MatterSim pose (row-major 16) whose r_mat transform lands on
    ``habitat_pos``: translation (x_h, -z_h, y_h)."""
    x, y, z = (float(v) for v in habitat_pos)
    return [1, 0, 0, x, 0, 1, 0, -z, 0, 0, 1, y, 0, 0, 0, 1]


def _write_fixtures(tmp_path):
    graph = _graph()
    view_ids = [f"v{i}" for i in range(8)]
    conn = []
    for i, vid in enumerate(view_ids):
        p = graph.positions[i] + np.array([0, 1.5, 0.02], np.float32)
        unobstructed = [False] * 8
        if i > 0:
            unobstructed[i - 1] = True
        if i < 7:
            unobstructed[i + 1] = True
        conn.append(
            {
                "image_id": vid,
                "pose": _pose_for(p),
                "included": True,
                "unobstructed": unobstructed,
            }
        )
    conn_dir = tmp_path / "connectivity"
    conn_dir.mkdir()
    with open(conn_dir / f"{SCAN}_connectivity.json", "w") as f:
        json.dump(conn, f)

    # FGR2R: one trajectory over the whole path; chunk_view is 1-based
    # inclusive (generate_vln_episode.py:225-230). A second item whose full
    # instruction has no VLN-CE match must be pruned.
    fgr2r = [
        {
            "scan": SCAN,
            "path": view_ids,
            "heading": float(np.pi / 2),  # MatterSim: facing +x in habitat
            "instructions": [FULL_INSTR],
            "new_instructions": repr([[SUB1, SUB2]]),
            "chunk_view": [[[1, 5], [5, 8]]],
        },
        {
            "scan": SCAN,
            "path": view_ids[:3],
            "heading": 0.0,
            "instructions": ["instruction that vlnce never saw"],
            "new_instructions": repr([[["nowhere"]]]),
            "chunk_view": [[[1, 3]]],
        },
    ]
    fgr2r_path = tmp_path / "FGR2R_train.json"
    with open(fgr2r_path, "w") as f:
        json.dump(fgr2r, f)

    # VLN-CE: the matched episode supplies reference_path + start_rotation
    # (heading pi/2 about -y, [x,y,z,w] — generate_vln_episode.py:232-235)
    s = float(np.sin(np.pi / 4))
    vlnce = {
        "episodes": [
            {
                "instruction": {"instruction_text": FULL_INSTR},
                "scene_id": f"mp3d/{SCAN}/{SCAN}.glb",
                "reference_path": [
                    [float(v) for v in graph.positions[i] + [0, 1.5, 0.02]]
                    for i in range(8)
                ],
                "start_rotation": [0.0, -s, 0.0, s],
            }
        ]
    }
    vlnce_path = tmp_path / "train.json.gz"
    with gzip.open(vlnce_path, "wt") as f:
        json.dump(vlnce, f)

    # semantic audionav dataset shard: 7 episodes goal-at-node-7 so the
    # straight-leg sub-instruction over-matches and gets sampled down to 5
    nav_dir = tmp_path / "audionav"
    (nav_dir / "content").mkdir(parents=True)
    nav_eps = [
        {
            "episode_id": k,
            "scene_id": f"data/scene_datasets/mp3d/{SCAN}/{SCAN}.glb",
            "start_position": [0.0, 0.0, 0.0],
            "start_rotation": [0.0, 0.0, 0.0, 1.0],
            "goals": [{"position": [4.0, 0.0, 3.0], "object_category": "chair"}],
            "sound_id": "telephone.wav",
            "offset": 0,
            "duration": 500,
            "info": {"geodesic_distance": 7.0},
        }
        for k in range(7)
    ]
    with gzip.open(nav_dir / "content" / f"{SCAN}.json.gz", "wt") as f:
        json.dump({"episodes": nav_eps, "scan": SCAN}, f)

    return graph, str(conn_dir), str(fgr2r_path), str(vlnce_path), str(nav_dir)


def test_connectivity_and_view2node(tmp_path):
    graph, conn_dir, *_ = _write_fixtures(tmp_path)
    conn = load_connectivity(os.path.join(conn_dir, f"{SCAN}_connectivity.json"))
    assert conn.view_ids == [f"v{i}" for i in range(8)]
    np.testing.assert_allclose(
        conn.positions, graph.positions + np.array([0, 1.5, 0.02], np.float32),
        atol=1e-5,
    )
    assert conn.edges.shape == (7, 2)
    v2n = build_view2node(conn, graph)
    assert [v2n[f"v{i}"] for i in range(8)] == list(range(8))
    # a viewpoint two floors up maps to no node
    far = conn.positions[0] + np.array([0, 5.0, 0], np.float32)
    conn.view_ids.append("vfar")
    conn.positions = np.concatenate([conn.positions, far[None]], 0)
    assert build_view2node(conn, graph)["vfar"] is None


def test_heading_adjustment_tracks_the_turn(tmp_path):
    _, conn_dir, fgr2r_path, *_ = _write_fixtures(tmp_path)
    conn = load_connectivity(os.path.join(conn_dir, f"{SCAN}_connectivity.json"))
    with open(fgr2r_path) as f:
        items = json.load(f)
    adjusted = adjust_fgr2r_headings([items[0]], {SCAN: conn})[0]
    h = adjusted["all_headings"]
    assert len(h) == 8
    # straight leg: facing +x (MatterSim pi/2); after the turn: +z (pi)
    np.testing.assert_allclose(h[:5], np.pi / 2, atol=1e-4)
    np.testing.assert_allclose(h[5:], np.pi, atol=1e-4)


def test_fgr2r_vlnce_matching_slices_and_prunes(tmp_path):
    _, conn_dir, fgr2r_path, vlnce_path, _ = _write_fixtures(tmp_path)
    conn = load_connectivity(os.path.join(conn_dir, f"{SCAN}_connectivity.json"))
    with open(fgr2r_path) as f:
        items = json.load(f)
    with gzip.open(vlnce_path, "rt") as f:
        vlnce = json.load(f)["episodes"]
    adjusted = adjust_fgr2r_headings(items, {SCAN: conn})
    matched = match_fgr2r_to_vlnce(adjusted, vlnce)
    # the unmatched instruction is pruned; 2 sub-instructions survive
    assert len(matched) == 2
    assert matched[0]["sub_instr"] == " ".join(SUB1)
    assert matched[0]["view_points"] == [f"v{i}" for i in range(5)]
    # chunk-initial rotation comes straight from VLN-CE ([x,y,z,w])
    s = float(np.sin(np.pi / 4))
    np.testing.assert_allclose(matched[0]["rotation"], [0, -s, 0, s], atol=1e-6)
    # mid-path rotation derives from the adjusted heading at the chunk start
    assert matched[1]["sub_instr"] == " ".join(SUB2)
    x, y, z, w = matched[1]["rotation"]
    angle = np.degrees(2 * np.arctan2(np.sqrt(x * x + y * y + z * z), w))
    assert abs(angle - 90.0) < 1.0  # heading at node 3 still faces +x


def test_generate_dialog_dataset_and_roundtrip(tmp_path):
    graph, conn_dir, fgr2r_path, vlnce_path, nav_dir = _write_fixtures(tmp_path)
    out_dir = str(tmp_path / "dialog_approx" / "train")
    counts = generate_dialog_dataset(
        fgr2r_path=fgr2r_path,
        vlnce_paths=[vlnce_path],
        connectivity_dir=conn_dir,
        scene_graphs={SCAN: graph},
        audionav_dataset_dir=nav_dir,
        output_dir=out_dir,
    )
    # straight-leg sub-instruction pairs with all 7 audionav episodes,
    # sampled down to 5 (generate_vln_episode.py:639-641); the turn leg's
    # dialog start (node 4) is only 4 nodes from the goal — below the
    # min_path_len=7 bar — so it generates nothing
    assert counts == {SCAN: 5}

    with gzip.open(os.path.join(out_dir, "content", f"{SCAN}.json.gz"), "rt") as f:
        shard = json.load(f)
    assert shard["scan"] == SCAN
    for ep in shard["episodes"]:
        assert ep["sub_instr"] == " ".join(SUB1)
        assert ep["dialog_node"] == [0, 1, 2, 3, 4]
        assert ep["start_position"] == [0.0, 0.0, 0.0]
        assert ep["rotation_angle"] == 90
        az, el = ep["direction"]
        # subgoal node 4 lies along +x of the dialog start: az=0, el=0
        assert abs(az) < 1e-5 and abs(el) < 1e-5

    episodes = load_reference_episodes(
        os.path.join(out_dir, "dataset.json.gz"),
        {SCAN: graph},
        sound_names=["telephone.wav"],
    )
    assert len(episodes) == 5
    for ep in episodes:
        assert ep.start_node == 0
        assert ep.start_rot_idx == 1  # rotation_angle 90
        assert ep.goal_node == 7
        assert ep.sub_instr == " ".join(SUB1)
        assert ep.dialog_node == 4  # last node of the sub-instruction path
        assert ep.sound_id == 0


def test_min_path_len_gates_pairing(tmp_path):
    graph, conn_dir, fgr2r_path, vlnce_path, nav_dir = _write_fixtures(tmp_path)
    out_dir = str(tmp_path / "dialog_short" / "train")
    counts = generate_dialog_dataset(
        fgr2r_path=fgr2r_path,
        vlnce_paths=[vlnce_path],
        connectivity_dir=conn_dir,
        scene_graphs={SCAN: graph},
        audionav_dataset_dir=nav_dir,
        output_dir=out_dir,
        min_path_len=4,
        max_per_item=100,
    )
    # with the bar lowered both sub-instructions pair with all 7 episodes
    assert counts == {SCAN: 14}
