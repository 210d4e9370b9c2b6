"""Component-wise timing of the SAVi superstep at bench shapes.

Times, on the current default device (the real TPU chip under axon):
  1. audio render alone (fused RIR conv + STFT, 64 envs)
  2. env step alone (graph move + all sensors)
  3. SMT policy forward alone (act)
  4. the full non-banked collect (T steps)

so perf work targets the measured bottleneck instead of a guess.

Usage: python scripts/profile_components.py [--envs 64] [--steps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=64)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--side", type=int, default=8)
    p.add_argument("--rir", type=int, default=24000)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from avlen_tpu.core.episodes import pack_episodes
    from avlen_tpu.models.memory import init_memory
    from avlen_tpu.models.smt_policy import AudioNavSMTNet, SMTPolicy
    from avlen_tpu.rl.rollout_smt import SMTCarry, collect_rollout_smt
    from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
    from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank

    b = args.envs
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=args.side, rir_length=args.rir,
        sampling_rate=args.sr, frame_res=128, num_sounds=2,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 256, min_hops=2, max_hops=30, num_sounds=2)
    env = BatchedAudioNavEnv(
        bank, pack_episodes(eps, num_envs=b),
        EnvConfig(
            max_episode_steps=150,
            sensors=("spectrogram", "rgb", "depth", "pose", "category",
                     "category_belief", "location_belief"),
        ),
    )
    policy = SMTPolicy(
        net=AudioNavSMTNet(
            spectrogram_hw=env.spec_config.out_shape[:2], d_model=256,
            use_rgb=True, use_depth=True, dtype=dtype,
        )
    )
    key = jax.random.key(0)
    state, obs = env.reset()
    mem = init_memory(b, 150, policy.net.feature_size)
    prev_a = jnp.zeros((b,), jnp.int32)
    params = policy.init(key, obs, prev_a, mem.features, mem.valid, key, method=SMTPolicy.act)
    consts = env.binder.arrays

    def timeit(name, fn, *fargs, reps=None):
        reps = reps or args.iters
        t0 = time.time()
        out = fn(*fargs)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = fn(*fargs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"{name:32s} {dt*1e3:9.2f} ms/call   (compile {compile_s:.1f}s)", flush=True)
        return dt

    # 1. audio render alone
    from avlen_tpu.ops.audio import render_audiogoal

    rir = bank.rir.gather(state.scene, state.rot, state.node, state.goal_node)

    @jax.jit
    def audio_only(consts, state, rir):
        with env.binder.bind(consts):
            wbank = env._wbank
            return render_audiogoal(
                wbank.sounds_padded[state.sound], jnp.zeros_like(state.sound),
                rir, jnp.ones_like(state.sound, bool), args.sr,
                config=env.spec_config,
            )[1]

    t_audio = timeit("audio render (conv+stft)", audio_only, consts, state, rir)

    # 1b. rir gather alone
    @jax.jit
    def rir_only(consts, state):
        with env.binder.bind(consts):
            return env._wbank.rir.gather(state.scene, state.rot, state.node, state.goal_node)

    t_rir = timeit("rir gather/synthesize", rir_only, consts, state)

    # 2. env step alone
    @jax.jit
    def step_only(consts, state, actions):
        with env.binder.bind(consts):
            return env._step_impl_noquery(state, actions)

    t_step = timeit("env step (move+sensors)", step_only, consts, state, jnp.ones((b,), jnp.int32))

    # 3. policy forward alone
    @jax.jit
    def act_only(params, obs, prev_a, mf, mv, key):
        return policy.apply(params, obs, prev_a, mf, mv, key, method=SMTPolicy.act)

    t_act = timeit("SMT policy act", act_only, params, obs, prev_a, mem.features, mem.valid, key)

    # 4. full collect
    from avlen_tpu.models.belief_predictor import init_belief_state

    def collect(params, carry, consts):
        with env.binder.bind(consts):
            def act(o, pa, mf, mv, k):
                return policy.apply(params, o, pa, mf, mv, k, method=SMTPolicy.act)

            def val(o, pa, mf, mv):
                return policy.apply(params, o, pa, mf, mv, method=SMTPolicy.get_value)

            return collect_rollout_smt(env._step_impl_noquery, act, val, None, carry, args.steps)

    carry = SMTCarry(
        env_state=state, obs=obs, prev_action=prev_a,
        masks=jnp.zeros((b,), jnp.float32), memory=mem,
        belief=init_belief_state(b), key=jax.random.key(1),
    )
    collect_j = jax.jit(collect)
    t_collect = timeit("full collect (T steps)", collect_j, params, carry, consts, reps=2)

    per_step = t_collect / args.steps
    print(f"\nper scan step: {per_step*1e3:.2f} ms  "
          f"(audio {t_audio*1e3:.2f} + rir {t_rir*1e3:.2f} + step {t_step*1e3:.2f} + act {t_act*1e3:.2f} "
          f"= {(t_audio+t_step+t_act)*1e3:.2f} ms standalone sum; step includes audio)")
    print(f"collect fps: {args.envs * args.steps / t_collect:.0f} env-steps/s")


if __name__ == "__main__":
    main()
