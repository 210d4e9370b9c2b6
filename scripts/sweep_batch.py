"""Batch-size (NUM_PROCESSES) sweep of the production SAVi superstep.

The published bench fixes NUM_PROCESSES=128; this sweeps the env count to
find the throughput knee on the real chip (more envs amortize the scan/
dispatch overhead until HBM or the episode bank caps out). Same program as
`run.py --run-type train` (trainer built through the registry).

Usage:
    python -m scripts.sweep_batch [--envs 64 128 256] [--iters 3] [--banked True]

Prints one JSON line per setting plus a final summary line with the best.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--banked", default="True")
    ap.add_argument("--trainer", default="savi", choices=["savi", "interactive"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bench import bench_interactive, bench_savi

    best = (None, 0.0)
    for n in args.envs:
        t0 = time.time()
        try:
            if args.trainer == "savi":
                fps, mfu = bench_savi(n, args.iters, banked=args.banked == "True")
            else:
                fps, mfu = bench_interactive(n, args.iters)
        except Exception as e:  # OOM at large env counts ends the sweep cleanly
            print(json.dumps({"num_envs": n, "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            break
        row = {"num_envs": n, "fps": round(fps, 1), "wall_s": round(time.time() - t0, 1)}
        if mfu is not None:
            row["mfu"] = round(mfu, 5)
        print(json.dumps(row), flush=True)
        if fps > best[1]:
            best = (n, fps)
    print(json.dumps({"best_num_envs": best[0], "best_fps": round(best[1], 1),
                      "trainer": args.trainer}), flush=True)
    if best[0] is None:
        sys.exit(1)


if __name__ == "__main__":
    main()
