"""End-to-end throughput benchmark.

Measures rollout+update env-steps/sec for the AV-Nav audio-visual PPO stack
on one chip — the reference's headline throughput metric (fps printed by
ddppo_trainer.py:1161-1175; reference hardware: 4× RTX GPUs with GLOO,
6 envs/GPU, whose published-recipe rollout is bottlenecked by per-step CPU
audio convolution + STFT + process pipes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured against REFERENCE_FPS, a generous estimate of the
reference's per-GPU rollout+update fps on its own recipe (the repo publishes
no number; SoundSpaces-era training logs are ~O(100) fps/GPU with cached
audio). See BASELINE.md.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS = 150.0  # per-GPU steps/sec estimate for the reference stack


def main() -> None:
    import jax
    import jax.numpy as jnp

    from avlen_tpu.core.episodes import pack_episodes
    from avlen_tpu.models.policy import AudioNavBaselineNet, Policy
    from avlen_tpu.rl.gae import compute_gae
    from avlen_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update
    from avlen_tpu.rl.rollout import CarryState, collect_rollout
    from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
    from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank

    from avlen_tpu.sim.scene import precompute_spectrogram_bank

    # production-shaped world: 16 kHz audio, 1.5 s RIRs, 128px depth, 64 envs
    num_envs, t_steps, hidden = 64, 150, 512
    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=8, rir_length=24000,
        sampling_rate=16000, frame_res=128, num_sounds=2,
    )
    # steady-state audio path: the reference caches spectrograms per
    # (sound, src, recv, azimuth) after first computation
    # (soundspaces/simulator.py:723-734); the TPU equivalent precomputes the
    # bank once with the same golden-tested renderer and gathers per step.
    bank.spec_bank = precompute_spectrogram_bank(bank, batch=512)
    eps = make_episodes(np.random.RandomState(1), tables, 256, min_hops=2, max_hops=30, num_sounds=2)
    packed = pack_episodes(eps, num_envs=num_envs)
    env = BatchedAudioNavEnv(
        bank, packed,
        EnvConfig(max_episode_steps=150, sensors=("spectrogram", "depth", "pose", "category")),
    )
    policy = Policy(
        net=AudioNavBaselineNet(hidden_size=hidden, spectrogram_hw=env.spec_config.out_shape[:2]),
        num_actions=4,
    )
    state, obs = env.reset()
    key = jax.random.key(0)
    h0 = jnp.zeros((num_envs, hidden))
    params = policy.init(key, obs, h0, jnp.ones((num_envs,)), key, method=Policy.act)
    ppo_cfg = PPOConfig(ppo_epoch=4, num_mini_batch=2)
    optimizer = make_optimizer(ppo_cfg)
    opt_state = optimizer.init(params)

    def collect(params, carry):
        def pol(o, h, m, k):
            return policy.apply(params, o, h, m, k, method=Policy.act)

        def val(o, h, m):
            return policy.apply(params, o, h, m, method=Policy.get_value)

        return collect_rollout(env._step_impl_noquery, pol, val, carry, t_steps)

    def update(params, opt_state, batch, key):
        adv, ret = compute_gae(
            batch.rewards, batch.values, batch.bootstrap_value,
            1.0 - batch.dones.astype(jnp.float32), ppo_cfg.gamma, ppo_cfg.tau,
        )

        def ev(p, o, h0_, m, a):
            return policy.apply(p, o, h0_, m, a, method=Policy.evaluate_actions)

        return ppo_update(params, opt_state, batch, adv, ret, key, ev, optimizer, ppo_cfg)

    collect_j = jax.jit(collect)
    update_j = jax.jit(update)

    carry = CarryState(state, obs, h0, jnp.zeros((num_envs,)), jax.random.key(1))

    # warmup / compile
    carry, batch = collect_j(params, carry)
    params_w, opt_w, stats = update_j(params, opt_state, batch, jax.random.key(2))
    jax.block_until_ready(stats["value_loss"])

    iters = 5
    t0 = time.time()
    for i in range(iters):
        carry, batch = collect_j(params, carry)
        params, opt_state, stats = update_j(params, opt_state, batch, jax.random.key(3 + i))
    jax.block_until_ready(stats["value_loss"])
    dt = time.time() - t0

    steps = iters * t_steps * num_envs
    fps = steps / dt
    print(
        json.dumps(
            {
                "metric": "rollout+update env steps/sec/chip (AV-Nav audio-visual PPO, 16kHz audio, 64 envs)",
                "value": round(fps, 1),
                "unit": "steps/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
