"""End-to-end throughput benchmark: SAVi semantic audionav (flagship stack).

Measures combined rollout+update env-steps/sec on one chip for
1. the SAVi Scene-Memory-Transformer policy with belief predictor at audio
   steady state (precomputed spectrogram bank — the reference's
   _spectrogram_cache equivalent, soundspaces/simulator.py:723-734),
2. the same stack on the NON-banked audio path (per-step fused RIR
   convolution + STFT), and
3. the full AVLEN interactive superstep (π_g/π_l/π_q + CLIP text tower +
   belief predictor + π_q PPO + π_l replay CE) via the production trainer.

MFU is derived from XLA's compiled cost analysis (flops of the collect and
update executables) against the chip's peak bf16 FLOP/s.

The driver's metric ("env steps/sec/chip (rollout FPS) + PPO updates/sec on
SAVi semantic audionav", BASELINE.json). The reference publishes NO number
for this (BASELINE.md); its recipe ran 6 envs/GPU with per-step CPU audio
convolution + process-pipe env workers (ddppo_trainer.py:1161-1175 prints
fps; SoundSpaces-era logs are ~O(100-200) steps/s/GPU at steady state). The
REFERENCE_FPS below is therefore an ESTIMATE, and vs_baseline is labeled as
such in the output.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import numpy as np


def _note(msg: str) -> None:
    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)

def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: repeat runs (the driver re-runs this
    every round) skip the multi-minute 1-core compiles."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# per-GPU rollout+update steps/sec ESTIMATE (BASELINE.md: no published number)
REFERENCE_FPS = 150.0

_PEAK_BF16 = {
    # device_kind substring -> peak bf16 FLOP/s per chip
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,
}


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16.items():
        if sub in kind:
            return peak
    return None


def _aot(jitted, *args):
    """Compile once ahead-of-time; returns (callable_executable, flops).
    The same executable is used for warmup and timing, so cost analysis adds
    no second compilation."""
    compiled = jitted.lower(*args).compile()
    flops = 0.0
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
    except Exception:
        pass
    return compiled, flops


def bench_savi(num_envs: int, t_steps: int, iters: int, banked: bool):
    """(fps, mfu_or_None) for the SAVi SMT rollout+update superstep."""
    import jax
    import jax.numpy as jnp

    from avlen_tpu.core.episodes import pack_episodes
    from avlen_tpu.models.belief_predictor import (
        BeliefPredictorNet,
        init_belief_state,
        update_beliefs,
    )
    from avlen_tpu.models.memory import init_memory
    from avlen_tpu.models.smt_policy import AudioNavSMTNet, SMTPolicy
    from avlen_tpu.rl.gae import compute_gae
    from avlen_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
    from avlen_tpu.rl.rollout_smt import SMTCarry, collect_rollout_smt, evaluate_sequence_smt
    from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
    from avlen_tpu.sim.scene import precompute_spectrogram_bank
    from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank

    # production shapes: 16 kHz audio, 1.5 s RIRs, 128 px RGB-D, SMT memory 150
    d_model, memory_size = 256, 150
    compute_dtype = jnp.bfloat16

    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=8, rir_length=24000,
        sampling_rate=16000, frame_res=128, num_sounds=2,
    )
    if banked:
        bank.spec_bank = precompute_spectrogram_bank(bank, batch=512)
    eps = make_episodes(np.random.RandomState(1), tables, 256, min_hops=2, max_hops=30, num_sounds=2)
    packed = pack_episodes(eps, num_envs=num_envs)
    env = BatchedAudioNavEnv(
        bank, packed,
        EnvConfig(
            max_episode_steps=150,
            sensors=("spectrogram", "rgb", "depth", "pose", "category",
                     "category_belief", "location_belief"),
        ),
    )

    policy = SMTPolicy(
        net=AudioNavSMTNet(
            spectrogram_hw=env.spec_config.out_shape[:2],
            d_model=d_model,
            use_rgb=True,
            use_depth=True,
            dtype=compute_dtype,
        )
    )
    belief_net = BeliefPredictorNet(dtype=compute_dtype)

    key = jax.random.key(0)
    state, obs = env.reset()
    mem = init_memory(num_envs, memory_size, policy.net.feature_size)
    prev_a = jnp.zeros((num_envs,), jnp.int32)
    params = policy.init(key, obs, prev_a, mem.features, mem.valid, key, method=SMTPolicy.act)
    belief_params = belief_net.init(jax.random.fold_in(key, 1), obs["spectrogram"], obs.get("category"))
    ppo_cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2, lr=2.5e-4)
    optimizer = make_optimizer(ppo_cfg)
    opt_state = optimizer.init(params)

    def collect(params, belief_params, carry, consts):
      with env.binder.bind(consts):
        def act(o, pa, mf, mv, k):
            return policy.apply(params, o, pa, mf, mv, k, method=SMTPolicy.act)

        def val(o, pa, mf, mv):
            return policy.apply(params, o, pa, mf, mv, method=SMTPolicy.get_value)

        def belief_fn(st, o, new_ep):
            return update_beliefs(belief_params, belief_net, st, o, new_ep)

        return collect_rollout_smt(env._step_impl_noquery, act, val, belief_fn, carry, t_steps)

    def update(params, opt_state, batch, key):
        adv, ret = compute_gae(
            batch.rewards, batch.values, batch.bootstrap_value,
            1.0 - batch.dones.astype(jnp.float32), ppo_cfg.gamma, ppo_cfg.tau,
        )

        def evaluate_actions(p, o, init_mem, masks, actions):
            def eval_step(oo, pa, mf, mv, a):
                return policy.apply(p, oo, pa, mf, mv, a, method=SMTPolicy.evaluate_step)

            return evaluate_sequence_smt(eval_step, o, init_mem, masks, actions)

        return ppo_update(params, opt_state, batch, adv, ret, key, evaluate_actions, optimizer, ppo_cfg)

    carry = SMTCarry(
        env_state=state, obs=obs, prev_action=prev_a,
        masks=jnp.zeros((num_envs,), jnp.float32),
        memory=mem, belief=init_belief_state(num_envs), key=jax.random.key(1),
    )

    # AOT compile once; the executables serve warmup, cost analysis, timing
    consts = env.binder.arrays
    collect_c, flops_collect = _aot(jax.jit(collect), params, belief_params, carry, consts)
    carry, batch = collect_c(params, belief_params, carry, consts)
    update_c, flops_update = _aot(
        jax.jit(update), params, opt_state, batch, jax.random.key(2)
    )
    _p, _o, stats = update_c(params, opt_state, batch, jax.random.key(2))
    jax.block_until_ready(stats["value_loss"])
    flops_iter = flops_collect + flops_update

    t0 = time.time()
    for i in range(iters):
        carry, batch = collect_c(params, belief_params, carry, consts)
        params, opt_state, stats = update_c(params, opt_state, batch, jax.random.key(3 + i))
    jax.block_until_ready(stats["value_loss"])
    dt = time.time() - t0

    fps = iters * t_steps * num_envs / dt
    peak = _peak_flops()
    mfu = (flops_iter * iters / dt / peak) if (peak and flops_iter) else None
    return fps, mfu


def bench_interactive(num_envs: int, iters: int):
    """(fps, mfu_or_None) for the full AVLEN interactive superstep via the
    production trainer: π_q rollout with π_g/π_l towers + CLIP-tokenized
    instruction bank + belief predictor, π_q PPO update, π_l replay CE."""
    import jax

    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    import avlen_tpu.rl.trainers  # noqa: F401

    workdir = tempfile.mkdtemp(prefix="avlen_bench_")
    try:
        cfg = get_config(
            opts=[
                "TRAINER_NAME", "ddppo",
                "RL.PPO.policy_type", "interactive",
                "RL.PPO.use_belief_predictor", "True",
                "REPLAY_STORE", "True",
                "NUM_PROCESSES", str(num_envs),
                "RL.PPO.num_steps", "150",
                "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "150",
                "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size", "256",
                "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "150",
                "TASK_CONFIG.DATASET.SYNTHETIC.NUM_SCENES", "1",
                "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "8",
                "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "24000",
                "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "128",
                "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "16000",
                "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", "True",
            ],
            model_dir=workdir,
        )
        trainer = registry.get_trainer("ddppo")(cfg)
        trainer.ensure_setup()
        t_steps = trainer.num_steps

        train_state = trainer._train_state()
        carry = trainer.carry
        key = jax.random.key(7)
        consts = trainer.env.consts
        step_c, flops_iter = _aot(trainer._superstep, train_state, carry, key, consts)
        train_state, carry, traj, stats = step_c(train_state, carry, key, consts)  # warmup
        jax.block_until_ready(stats["value_loss"])

        t0 = time.time()
        for i in range(iters):
            train_state, carry, traj, stats = step_c(
                train_state, carry, jax.random.fold_in(key, i), consts
            )
        jax.block_until_ready(stats["value_loss"])
        dt = time.time() - t0

        fps = iters * t_steps * num_envs / dt
        peak = _peak_flops()
        mfu = (flops_iter * iters / dt / peak) if (peak and flops_iter) else None
        return fps, mfu
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    import jax

    _enable_compile_cache()
    _note("savi banked: building")
    fps, mfu = bench_savi(num_envs=128, t_steps=150, iters=5, banked=True)
    _note(f"savi banked: {fps:.0f} fps, mfu {mfu}")
    fps_raw, _ = bench_savi(num_envs=64, t_steps=50, iters=2, banked=False)
    _note(f"savi non-banked: {fps_raw:.0f} fps")
    fps_int, mfu_int = bench_interactive(num_envs=64, iters=2)
    _note(f"interactive: {fps_int:.0f} fps, mfu {mfu_int}")

    out = {
        "metric": (
            "rollout+update env steps/sec/chip (SAVi SMT semantic audionav: "
            "memory-150 scene transformer, belief predictor, 16kHz audio, "
            "128px RGB-D, 128 envs, spectrogram-bank steady state)"
        ),
        "value": round(fps, 1),
        "unit": "steps/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
        "baseline_note": (
            "REFERENCE_FPS=150 steps/s/GPU is an ESTIMATE (reference publishes no "
            "throughput number; SoundSpaces-era logs are O(100-200))"
        ),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "device": jax.devices()[0].device_kind,
        "extra": {
            "savi_smt_nonbanked_fps": round(fps_raw, 1),
            "savi_smt_nonbanked_note": "per-step fused RIR conv + STFT, 64 envs, T=50",
            "interactive_3policy_fps": round(fps_int, 1),
            "interactive_3policy_mfu": round(mfu_int, 4) if mfu_int is not None else None,
            "interactive_3policy_note": (
                "full AVLEN superstep: pi_g/pi_l/pi_q + CLIP dialog tower + belief "
                "predictor rollout, pi_q PPO + pi_l replay CE, 64 envs, T=150"
            ),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
