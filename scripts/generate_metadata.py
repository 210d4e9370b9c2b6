"""Generate scene metadata (navigation graphs) for the framework.

Counterpart of scripts/generate_{matterport3d,replica}_metadata.py in the
reference (builds points.txt + graph.pkl per scene). Here: synthesizes grid
scenes (sim/synthetic.py) or converts existing points files, writing both
the reference-compatible `points.txt` and our packed `.npz` scene format.

Usage:
  python scripts/generate_metadata.py --output data/metadata --scenes 4 --side 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from avlen_tpu.sim.graph import build_scene_tables
from avlen_tpu.sim.synthetic import make_grid_scene


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--output", required=True)
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--side", type=int, default=8)
    p.add_argument("--grid-size", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    for i in range(args.scenes):
        graph = make_grid_scene(rng, side=args.side, grid_size=args.grid_size)
        tables = build_scene_tables(graph)
        scene_dir = os.path.join(args.output, f"scene{i:03d}")
        os.makedirs(scene_dir, exist_ok=True)
        # reference-compatible points.txt: index x y z
        with open(os.path.join(scene_dir, "points.txt"), "w") as f:
            for j, pos in enumerate(graph.positions):
                f.write(f"{j}\t{pos[0]:.6f}\t{pos[1]:.6f}\t{pos[2]:.6f}\n")
        np.savez(
            os.path.join(scene_dir, "scene.npz"),
            positions=graph.positions,
            edges=graph.edges,
            hops=tables.hops,
            fwd_next=tables.fwd_next,
            oracle_next=tables.oracle_next,
        )
        print(f"wrote {scene_dir}: {graph.num_nodes} nodes, {len(graph.edges)} edges")


if __name__ == "__main__":
    main()
