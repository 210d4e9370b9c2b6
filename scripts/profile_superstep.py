"""Profile the production supersteps on the real TPU (VERDICT r3 #3).

Builds the registry trainers exactly as bench.py does (non-banked SAVi SMT
and the AVLEN interactive 3-policy stack), captures a jax.profiler trace of
a few steady-state supersteps, and writes a device-time breakdown grouped by
XLA op category and by source scope, so optimization targets are chosen with
a profile in hand rather than by guess.

Usage:
    python scripts/profile_superstep.py [--which savi|interactive|both]
        [--envs N] [--iters K] [--out runs/profile_r4]

Outputs per workload:
    <out>/<which>/plugins/profile/...   raw trace (xplane + trace.json.gz)
    <out>/<which>_breakdown.json        grouped device-time summary
and prints the top-15 rows.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_trainer(which: str, num_envs: int):
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    from avlen_tpu.run import _enable_compile_cache
    from bench import _PRODUCTION_OPTS

    _enable_compile_cache()

    if which == "savi":
        opts = [
            "TRAINER_NAME", "savi",
            "RL.PPO.policy_type", "smt",
            "NUM_PROCESSES", str(num_envs),
            "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", "False",
        ]
        name = "savi"
    else:
        opts = [
            "TRAINER_NAME", "ddppo",
            "RL.PPO.policy_type", "interactive",
            "REPLAY_STORE", "True",
            "NUM_PROCESSES", str(num_envs),
            "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", "True",
        ]
        name = "ddppo"
    cfg = get_config(opts=_PRODUCTION_OPTS + opts,
                     model_dir=tempfile.mkdtemp(prefix="avlen_prof_"))
    trainer = registry.get_trainer(name)(cfg)
    trainer.ensure_setup()
    return trainer


def profile_one(which: str, num_envs: int, iters: int, out_dir: str):
    import jax

    trainer = build_trainer(which, num_envs)
    train_state = trainer._train_state()
    from avlen_tpu.parallel.ddppo import _dedupe_buffers

    carry = _dedupe_buffers(trainer.carry)
    key = jax.random.key(7)
    consts = trainer.env.consts
    superstep = getattr(trainer._superstep, "_jitted", trainer._superstep)

    # warmup: compile + reach audio/bank steady state
    for i in range(2):
        train_state, carry, traj, stats = superstep(
            train_state, carry, jax.random.fold_in(key, 100 + i), consts
        )
    jax.block_until_ready(stats["value_loss"])

    trace_dir = os.path.join(out_dir, which)
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for i in range(iters):
            train_state, carry, traj, stats = superstep(
                train_state, carry, jax.random.fold_in(key, i), consts
            )
        jax.block_until_ready(stats["value_loss"])
    wall = time.time() - t0
    t_steps, b = trainer.num_steps, trainer.env.num_envs
    fps = iters * t_steps * b / wall
    return trace_dir, {"wall_s": wall, "iters": iters, "fps": fps,
                       "num_envs": b, "t_steps": t_steps}


# -- trace.json.gz summarization ------------------------------------------

_FUSION_RE = re.compile(r"\.\d+$")


def summarize_trace(trace_dir: str):
    """EXCLUSIVE device-op durations from the captured chrome trace.

    Device spans nest (module run → while bodies → fusions); summing raw
    durations double-counts every level. Per device track (pid, tid) we
    compute each span's SELF time = duration − time covered by its direct
    children (computed with a stack sweep over start-sorted spans), then
    group self times by op kind (fusion/copy/while/...) and by the op's
    source scope. The per-module spans (the numeric run-id events) then
    contribute only true gaps, and kinds sum to the real device busy time."""
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    data = json.load(gzip.open(sorted(paths)[-1]))
    ev = data["traceEvents"]
    pid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"]["name"]

    tracks = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") != "X":
            continue
        if not pid_name.get(e.get("pid"), "").startswith("/device:"):
            continue
        tracks[(e.get("pid"), e.get("tid"))].append(e)

    by_kind = collections.Counter()
    by_scope = collections.Counter()
    device_total = 0.0
    for spans in tracks.values():
        spans.sort(key=lambda e: (float(e["ts"]), -float(e.get("dur", 0.0))))
        stack = []  # (end_ts, child_cover_accum index into selfs)
        selfs = []
        for e in spans:
            ts, dur = float(e["ts"]), float(e.get("dur", 0.0))
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            if stack:
                selfs[stack[-1][1]][1] += dur  # covered time inside parent
            selfs.append([e, 0.0])
            stack.append((ts + dur, len(selfs) - 1))
        for e, covered in selfs:
            self_us = max(0.0, float(e.get("dur", 0.0)) - covered)
            name = e.get("name", "")
            base = _FUSION_RE.sub("", name)
            if base.isdigit() or name.startswith("jit_") or name.startswith("jit("):
                base = "<module-gap>"
            device_total += self_us
            by_kind[base] += self_us
            args = e.get("args") or {}
            scope = args.get("long_name") or args.get("tf_op") or args.get("name") or ""
            scope = scope.split(";")[0].strip()
            parts = [p for p in scope.split("/") if p]
            by_scope["/".join(parts[:4]) if parts else f"<{base}>"] += self_us
    return device_total, by_kind, by_scope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="both", choices=["savi", "interactive", "both"])
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--out", default="runs/profile_r4")
    ap.add_argument("--summarize-only", default=None, metavar="TRACE_DIR",
                    help="re-summarize an existing trace dir and exit")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.summarize_only:
        device_total, by_kind, by_scope = summarize_trace(args.summarize_only)
        print(f"device self-time total {device_total / 1e6:.2f}s")
        for k, v in by_kind.most_common(20):
            print(f"  {v / 1e3:10.1f} ms  {k}")
        print("-- by scope --")
        for k, v in by_scope.most_common(20):
            print(f"  {v / 1e3:10.1f} ms  {k[:140]}")
        return

    whichs = ["savi", "interactive"] if args.which == "both" else [args.which]
    for which in whichs:
        trace_dir, stats = profile_one(which, args.envs, args.iters, args.out)
        device_total, by_kind, by_scope = summarize_trace(trace_dir)
        summary = {
            "run": stats,
            "device_time_ms": round(device_total / 1e3, 2),
            "device_util_of_wall": round(device_total / 1e6 / stats["wall_s"], 4),
            "by_kind_ms": {k: round(v / 1e3, 2) for k, v in by_kind.most_common(25)},
            "by_scope_ms": {k: round(v / 1e3, 2) for k, v in by_scope.most_common(40)},
        }
        out_path = os.path.join(args.out, f"{which}_breakdown.json")
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"== {which}: fps={stats['fps']:.0f} wall={stats['wall_s']:.2f}s "
              f"device={device_total / 1e6:.2f}s "
              f"({100 * summary['device_util_of_wall']:.0f}% of wall)")
        for k, v in list(by_scope.most_common(15)):
            print(f"  {v / 1e3:10.1f} ms  {k}")
        print("->", out_path)


if __name__ == "__main__":
    main()
