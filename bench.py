"""End-to-end throughput benchmark: SAVi semantic audionav (flagship stack).

Measures combined rollout+update env-steps/sec on one chip for the SAVi
Scene-Memory-Transformer policy with belief predictor — the driver's metric
("env steps/sec/chip (rollout FPS) + PPO updates/sec on SAVi semantic
audionav", BASELINE.json). The reference's published recipe ran 6 envs/GPU
with per-step CPU audio convolution + process-pipe env workers
(ddppo_trainer.py:1161-1175 prints the fps; SoundSpaces-era logs are
~O(100-200) steps/s/GPU at steady state with warm caches).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS = 150.0  # per-GPU rollout+update steps/sec estimate (BASELINE.md)


def main() -> None:
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
    num_envs, t_steps = 128, 150
    d_model, memory_size = 256, 150
    compute_dtype = jnp.bfloat16

    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=8, rir_length=24000,
        sampling_rate=16000, frame_res=128, num_sounds=2,
    )
    # steady-state audio: precomputed spectrogram bank (the reference's
    # _spectrogram_cache equivalent, soundspaces/simulator.py:723-734)
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

    def collect(params, belief_params, carry):
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

    collect_j = jax.jit(collect)
    update_j = jax.jit(update)
    carry = SMTCarry(
        env_state=state, obs=obs, prev_action=prev_a,
        masks=jnp.zeros((num_envs,), jnp.float32),
        memory=mem, belief=init_belief_state(num_envs), key=jax.random.key(1),
    )

    # warmup / compile
    carry, batch = collect_j(params, belief_params, carry)
    _p, _o, stats = update_j(params, opt_state, batch, jax.random.key(2))
    jax.block_until_ready(stats["value_loss"])

    iters = 5
    t0 = time.time()
    for i in range(iters):
        carry, batch = collect_j(params, belief_params, carry)
        params, opt_state, stats = update_j(params, opt_state, batch, jax.random.key(3 + i))
    jax.block_until_ready(stats["value_loss"])
    dt = time.time() - t0

    fps = iters * t_steps * num_envs / dt
    print(
        json.dumps(
            {
                "metric": "rollout+update env steps/sec/chip (SAVi SMT semantic audionav: memory-150 scene transformer, belief predictor, 16kHz audio, 128px RGB-D, 128 envs)",
                "value": round(fps, 1),
                "unit": "steps/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
