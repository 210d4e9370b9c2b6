"""Ablation timing of the SAVi superstep: collect vs PPO update vs full.

The published bench times one fused (collect -> update) program; to aim the
optimization effort this script times the two halves separately at the exact
bench shapes (bench.py _PRODUCTION_OPTS) and optionally dumps a profiler
trace. Run on the real TPU:

    python -m scripts.profile_superstep [--trace DIR] [--iters N]

Prints one JSON line {collect_s, update_s, superstep_s, ...}.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    ap.add_argument("--num-envs", type=int, default=128)
    ap.add_argument("--banked", default="True")
    ap.add_argument("--chunk", type=int, default=None,
                    help="override SCENE_MEMORY_TRANSFORMER.batched_eval_chunk")
    ap.add_argument(
        "--stage", default="all", choices=["all", "collect", "update", "superstep"],
        help="profile one stage per process (the 1-chip HBM cannot hold all "
        "three executables + their buffers at production shapes)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    from bench import _PRODUCTION_OPTS, _aot

    workdir = tempfile.mkdtemp(prefix="avlen_prof_")
    try:
        cfg = get_config(
            opts=_PRODUCTION_OPTS + [
                "TRAINER_NAME", "savi",
                "RL.PPO.policy_type", "smt",
                "NUM_PROCESSES", str(args.num_envs),
                "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", args.banked,
            ] + (
                ["RL.PPO.SCENE_MEMORY_TRANSFORMER.batched_eval_chunk", str(args.chunk)]
                if args.chunk else []
            ),
            model_dir=workdir,
        )
        trainer = registry.get_trainer("savi")(cfg)
        trainer.ensure_setup()

        from avlen_tpu.parallel.ddppo import _dedupe_buffers

        train_state = trainer._train_state()
        carry = _dedupe_buffers(trainer.carry)
        key = jax.random.key(7)
        consts = trainer.env.consts

        superstep = getattr(trainer._superstep, "_jitted", trainer._superstep)
        t0 = time.time()
        step_c, step_flops = _aot(superstep, train_state, carry, key, consts)
        print(f"[prof] superstep compile {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
        # run once: outputs give a post-warmup carry + a real batch for the
        # update-only timing (donation consumed the original carry buffers)
        train_state, carry, batch, stats = step_c(train_state, carry, key, consts)
        jax.block_until_ready(stats["value_loss"])

        def timeit(fn, *a):
            out = None
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(*a)
            jax.block_until_ready(jax.tree.leaves(out)[0])
            return (time.time() - t0) / args.iters

        results = {}
        trace_ctx = (
            (lambda: jax.profiler.trace(args.trace)) if args.trace
            else (lambda: __import__("contextlib").nullcontext())
        )

        # --- collect only (the trainer's own jitted collect, same program
        # the superstep's first half runs)
        if args.stage in ("all", "collect"):
            params, _, belief_params, _ = train_state
            collect_c, collect_flops = _aot(
                trainer._collect, consts, params, belief_params, carry
            )
            c2, b2 = collect_c(consts, params, belief_params, carry)
            jax.block_until_ready(b2.rewards)
            collect_s = timeit(lambda: collect_c(consts, params, belief_params, carry))
            print(f"[prof] collect_s={collect_s:.4f}", file=sys.stderr, flush=True)
            results.update(collect_s=round(collect_s, 4),
                           collect_flops=collect_flops)
            if args.stage == "collect" and args.trace:
                with trace_ctx():
                    jax.block_until_ready(
                        collect_c(consts, params, belief_params, carry)[1].rewards)
            del collect_c, c2, b2  # free before the next stage

        # --- update only, on the superstep's own batch
        if args.stage in ("all", "update"):
            def update_only(train_state, batch, key):
                return trainer._update_ts(train_state, batch, key, lambda g: g)

            upd = jax.jit(update_only)
            upd_c, upd_flops = _aot(upd, train_state, batch, key)
            out = upd_c(train_state, batch, key)
            jax.block_until_ready(out[1]["value_loss"])
            update_s = timeit(lambda: upd_c(train_state, batch, key))
            print(f"[prof] update_s={update_s:.4f}", file=sys.stderr, flush=True)
            results.update(update_s=round(update_s, 4), update_flops=upd_flops)
            if args.stage == "update" and args.trace:
                with trace_ctx():
                    jax.block_until_ready(upd_c(train_state, batch, key)[1]["value_loss"])
            del upd_c, out
            jax.clear_caches()

        # --- full superstep; donation-safe: re-feed each call's carry
        if args.stage in ("all", "superstep"):
            t0 = time.time()
            ts_t, carry_t = train_state, carry
            for _ in range(args.iters):
                ts_t, carry_t, _b, _s = step_c(ts_t, carry_t, key, consts)
            jax.block_until_ready(_s["value_loss"])
            superstep_s = (time.time() - t0) / args.iters
            print(f"[prof] superstep_s={superstep_s:.4f}", file=sys.stderr, flush=True)
            results.update(superstep_s=round(superstep_s, 4))
            if args.stage == "superstep" and args.trace:
                with trace_ctx():
                    out = step_c(ts_t, carry_t, key, consts)
                    jax.block_until_ready(out[3]["value_loss"])

        t_steps, num_envs = trainer.num_steps, trainer.env.num_envs
        if "collect_s" in results:
            results["collect_fps"] = round(t_steps * num_envs / results["collect_s"], 1)
        if "superstep_s" in results:
            results["superstep_fps"] = round(t_steps * num_envs / results["superstep_s"], 1)
        results.update(superstep_flops=step_flops, num_envs=num_envs,
                       t_steps=t_steps, device=jax.devices()[0].device_kind)
        print(json.dumps(results))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
