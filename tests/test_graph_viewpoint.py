"""Arbitrary viewpoint-graph engine tests (VERDICT r1 item 7): the native
engine must handle non-grid MatterSim-style connectivity graphs — arbitrary
positions, arbitrary degree — with BFS distances checked against networkx
and MatterSim-convention navigable-location ordering / heading updates
(speaker/src/lib/MatterSim.cpp newEpisode/makeAction/getState;
speaker/tasks/R2R/env.py:247-254 picks navigable entries by heading)."""

import numpy as np
import pytest

nx = pytest.importorskip("networkx")

from avlen_tpu.native.graph_engine import GraphEngine


def _random_geometric_scene(rng, n=40, k=3):
    """Random connected non-grid graph: kNN edges + a spanning chain."""
    pos = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    pos[:, 1] = 0.0
    edges = set()
    for u in range(n):
        d = np.linalg.norm(pos - pos[u], axis=1)
        for v in np.argsort(d)[1 : k + 1]:
            edges.add((min(u, int(v)), max(u, int(v))))
    order = rng.permutation(n)
    for a, b in zip(order[:-1], order[1:]):
        edges.add((min(int(a), int(b)), max(int(a), int(b))))
    return pos, np.array(sorted(edges), np.int32)


def test_vp_hops_match_networkx():
    rng = np.random.RandomState(0)
    pos, edges = _random_geometric_scene(rng)
    g = nx.Graph()
    g.add_nodes_from(range(len(pos)))
    g.add_edges_from(map(tuple, edges))
    eng = GraphEngine()
    sid = eng.add_scene_viewpoint(pos, edges)
    lengths = dict(nx.all_pairs_shortest_path_length(g))
    for a in range(len(pos)):
        for b in range(len(pos)):
            assert eng.vp_hops(sid, a, b) == lengths[a][b]


def test_vp_shortest_path_is_valid_and_minimal():
    rng = np.random.RandomState(1)
    pos, edges = _random_geometric_scene(rng, n=30)
    adj = {u: set() for u in range(len(pos))}
    for a, b in edges:
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    eng = GraphEngine()
    sid = eng.add_scene_viewpoint(pos, edges)
    for a, b in [(0, 17), (5, 29), (12, 3), (22, 22)]:
        path = eng.vp_shortest_path(sid, a, b)
        assert path[0] == a and path[-1] == b
        for u, v in zip(path, path[1:]):
            assert v in adj[u]
        assert len(path) == eng.vp_hops(sid, a, b) + 1


def test_vp_navigable_sorted_by_relative_heading():
    # star graph: center 0, spokes at known headings (atan2(dz, dx) deg)
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 0, 1], [-1, 0, 0], [0, 0, -1]], np.float32
    )  # headings from 0: 0, 90, 180, 270(-90)
    edges = np.array([[0, 1], [0, 2], [0, 3], [0, 4]], np.int32)
    eng = GraphEngine()
    sid = eng.add_scene_viewpoint(pos, edges)
    eng.vp_new_episode([sid], [0], [80.0])  # facing near node 2's spoke
    nodes, rels = eng.vp_navigable(0)
    assert nodes[0] == 0 and rels[0] == 0.0  # current viewpoint first
    # relative headings: node1 -80, node2 +10, node3 +100, node4 -170
    assert list(nodes[1:]) == [2, 1, 3, 4]
    np.testing.assert_allclose(rels[1:], [10.0, -80.0, 100.0, -170.0], atol=1e-4)


def test_vp_make_action_moves_and_snaps_heading():
    pos = np.array([[0, 0, 0], [2, 0, 0], [2, 0, 2]], np.float32)
    edges = np.array([[0, 1], [1, 2]], np.int32)
    eng = GraphEngine()
    sid = eng.add_scene_viewpoint(pos, edges)
    eng.vp_new_episode([sid, sid], [0, 0], [0.0, 0.0])
    # slot 0: move to nearest navigable (node 1, heading 0); slot 1: turn only
    invalid = eng.vp_make_action([1, 0], [0.0, 45.0])
    assert not invalid.any()
    nodes, headings, p = eng.vp_get_state()
    assert nodes.tolist() == [1, 0]
    np.testing.assert_allclose(headings, [0.0, 45.0], atol=1e-4)
    np.testing.assert_allclose(p[0], [2, 0, 0], atol=1e-6)
    # from node 1 facing 0deg, node 2 sits at +90: after moving there the
    # heading snaps to the traversed edge direction
    invalid = eng.vp_make_action([1, 0], [0.0, 0.0])
    nodes, headings, _ = eng.vp_get_state()
    assert nodes[0] == 2
    np.testing.assert_allclose(headings[0], 90.0, atol=1e-4)
    # out-of-range navigable index flags invalid and stays put
    invalid = eng.vp_make_action([9, 0], [0.0, 0.0])
    assert invalid[0]
    nodes, _, _ = eng.vp_get_state()
    assert nodes[0] == 2


def test_vp_and_grid_scenes_coexist():
    eng = GraphEngine()
    grid_pos = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    gid = eng.add_scene(grid_pos, np.array([[0, 1]], np.int32))
    pos, edges = _random_geometric_scene(np.random.RandomState(2), n=10)
    vid = eng.add_scene_viewpoint(pos, edges)
    assert eng.hops(gid, 0, 1) == 1
    assert eng.vp_hops(vid, 0, 0) == 0
