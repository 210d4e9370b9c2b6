"""Graph table tests vs networkx (the reference's graph backend,
soundspaces/simulator.py:181, 736-745)."""

import networkx as nx
import numpy as np

from avlen_tpu.sim.graph import NavGraph, build_scene_tables, edge_direction_deg, pad_and_stack_tables
from avlen_tpu.sim.synthetic import make_grid_scene

RNG = np.random.RandomState(7)


def _to_nx(graph: NavGraph) -> nx.Graph:
    g = nx.Graph()
    for i, p in enumerate(graph.positions):
        g.add_node(i, point=p)
    for a, b in graph.edges:
        g.add_edge(int(a), int(b))
    return g


def test_hops_match_networkx():
    graph = make_grid_scene(RNG, side=7, hole_frac=0.2)
    t = build_scene_tables(graph)
    g = _to_nx(graph)
    lengths = dict(nx.all_pairs_shortest_path_length(g))
    for a in range(0, t.num_nodes, 3):
        for b in range(0, t.num_nodes, 3):
            want = lengths.get(a, {}).get(b)
            got = int(t.hops[a, b])
            if want is None:
                assert got >= 2**15
            else:
                assert got == want, (a, b)


def test_oracle_next_decreases_hops():
    graph = make_grid_scene(RNG, side=6, hole_frac=0.1)
    t = build_scene_tables(graph)
    n = t.num_nodes
    for a in range(n):
        for b in range(n):
            if a == b or t.hops[a, b] >= 2**15:
                assert t.oracle_next[a, b] == -1
            else:
                nxt = int(t.oracle_next[a, b])
                assert t.hops[nxt, b] == t.hops[a, b] - 1


def test_fwd_next_consistent_with_edge_directions():
    graph = make_grid_scene(RNG, side=5, hole_frac=0.0)
    t = build_scene_tables(graph)
    for u in range(t.num_nodes):
        for d in range(4):
            v = t.fwd_next[u, d]
            if v >= 0:
                assert edge_direction_deg(graph.positions[u], graph.positions[v]) == d * 90


def test_pad_and_stack():
    g1 = make_grid_scene(RNG, side=4, hole_frac=0.0)
    g2 = make_grid_scene(RNG, side=6, hole_frac=0.1)
    t1, t2 = build_scene_tables(g1), build_scene_tables(g2)
    stacked = pad_and_stack_tables([t1, t2])
    assert stacked["positions"].shape[0] == 2
    assert stacked["num_nodes"][0] == t1.num_nodes
    n1 = t1.num_nodes
    np.testing.assert_array_equal(stacked["hops"][0, :n1, :n1], t1.hops)
