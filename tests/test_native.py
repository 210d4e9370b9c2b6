"""Native component tests: C++ graph engine vs the python scene tables, and
the mmap frame server round trip (the reference's C++ test surface is the
MatterSim Catch suite, speaker/src/test/main.cpp)."""

import numpy as np
import pytest

from avlen_tpu.sim.graph import build_scene_tables
from avlen_tpu.sim.synthetic import make_grid_scene, oracle_num_actions


@pytest.fixture(scope="module")
def engine_and_tables():
    pytest.importorskip("ctypes")
    from avlen_tpu.native.graph_engine import GraphEngine

    rng = np.random.RandomState(0)
    graph = make_grid_scene(rng, side=6, hole_frac=0.15)
    tables = build_scene_tables(graph)
    eng = GraphEngine()
    eng.add_scene(graph.positions, graph.edges)
    return eng, tables, graph


def test_engine_hops_match_python(engine_and_tables):
    eng, tables, graph = engine_and_tables
    n = tables.num_nodes
    for a in range(0, n, 2):
        for b in range(0, n, 2):
            assert eng.hops(0, a, b) == int(tables.hops[a, b])


def test_engine_step_semantics(engine_and_tables):
    eng, tables, graph = engine_and_tables
    n = tables.num_nodes
    eng.new_episode([0, 0], [0, n - 1], [0, 1])
    # turns
    eng.make_action([2, 3])
    nodes, rots, pos = eng.get_state()
    assert rots[0] == 1 and rots[1] == 0
    # forward matches the python fwd table
    eng.new_episode([0], [0], [0])
    collided = eng.make_action([1])
    nodes, rots, _ = eng.get_state()
    orient = (3 - 0) % 4
    target = tables.fwd_next[0, orient]
    if target < 0:
        assert collided[0] and nodes[0] == 0
    else:
        assert not collided[0] and nodes[0] == target


def test_engine_oracle_actions_reach_goal(engine_and_tables):
    eng, tables, graph = engine_and_tables
    n = tables.num_nodes
    rng = np.random.RandomState(1)
    for _ in range(5):
        a, b = rng.randint(n), rng.randint(n)
        if tables.hops[a, b] >= 2**15 or a == b:
            continue
        rot = rng.randint(4)
        acts = eng.oracle_actions(0, a, rot, b)
        assert acts[-1] == 0
        assert len(acts) == oracle_num_actions(tables, a, rot, b)
        # replay through the engine: must land on the goal
        eng.new_episode([0], [a], [rot])
        for act in acts[:-1]:
            collided = eng.make_action([act])
            assert not collided[0]
        nodes, _, _ = eng.get_state()
        assert nodes[0] == b


def test_engine_shortest_path(engine_and_tables):
    eng, tables, graph = engine_and_tables
    n = tables.num_nodes
    for a, b in [(0, n - 1), (n // 2, 0)]:
        if tables.hops[a, b] >= 2**15:
            continue
        path = eng.shortest_path(0, a, b)
        assert path[0] == a and path[-1] == b
        assert len(path) == tables.hops[a, b] + 1


def test_frame_server_roundtrip(tmp_path):
    from avlen_tpu.native.frame_server import FrameServer, write_frame_bank

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (7, 4, 8, 8, 3), dtype=np.uint8)
    path = str(tmp_path / "bank.avlf")
    write_frame_bank(path, frames)
    fs = FrameServer(path)
    assert (fs.n, fs.a) == (7, 4)
    nodes = np.array([0, 3, 6], np.int32)
    rots = np.array([1, 0, 3], np.int32)
    out = fs.gather(nodes, rots)
    for i in range(3):
        np.testing.assert_array_equal(out[i], frames[nodes[i], rots[i]])
    fs.close()
