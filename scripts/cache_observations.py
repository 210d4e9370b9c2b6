"""Build per-scene frame banks.

Counterpart of scripts/cache_observations.py in the reference (renders and
pickles (node, angle) → {rgb, depth} caches via habitat-sim). This
environment has no renderer, so frames come from the synthetic generator (or
any `(node, rot) -> frame` callback for a real renderer); they are written in
the native mmap bank format served zero-copy by
avlen_tpu/native/frame_server.cpp.

Usage:
  python scripts/cache_observations.py --output data/scene_observations \
      --scenes 2 --side 8 --res 128
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from avlen_tpu.native.frame_server import write_frame_bank
from avlen_tpu.sim.synthetic import make_frames, make_grid_scene


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--output", required=True)
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--side", type=int, default=8)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    os.makedirs(args.output, exist_ok=True)
    for i in range(args.scenes):
        graph = make_grid_scene(rng, side=args.side)
        rgb, depth = make_frames(rng, graph.num_nodes, args.res)
        write_frame_bank(os.path.join(args.output, f"scene{i:03d}_rgb.avlf"), rgb)
        write_frame_bank(
            os.path.join(args.output, f"scene{i:03d}_depth.avlf"),
            (depth * 65535).astype(np.uint16),
        )
        print(f"scene{i:03d}: {graph.num_nodes} nodes cached at {args.res}px")


if __name__ == "__main__":
    main()
