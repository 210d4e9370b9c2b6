"""ITERATOR_OPTIONS semantics on the batched env (VERDICT r2 #7) and the
AV-WAN parity sweep's exactly-once eval (VERDICT r2 #10).

Reference semantics: habitat's EpisodeIterator reshuffles every cycle and
forces scene switches after max_scene_repeat_episodes (dataset.py:310-356);
round 2 left the batched env cycling a fixed per-slot order forever.
"""

import os

import jax.numpy as jnp
import numpy as np

from avlen_tpu.core.episodes import Episode, EpisodeStreamer


def _episodes(n, scenes=1):
    return [
        Episode(
            episode_id=str(i), scene_id=i % scenes, start_node=0, start_rot_idx=0,
            goal_node=1,
        )
        for i in range(n)
    ]


def test_streamer_reshuffles_between_cycles():
    eps = _episodes(12)
    s = EpisodeStreamer(eps, num_envs=1, episodes_per_env=12, shuffle=True, seed=3)
    first = s.initial_order()[0].tolist()
    # consume the whole first cycle, then refresh
    second_rolled = s.refresh(np.array([12]))[0].tolist()
    # refresh aligns pending[k] at position (cursor+k) % per; un-roll it
    second = [second_rolled[(12 + k) % 12] for k in range(12)]
    assert sorted(first) == list(range(12))
    assert sorted(second) == list(range(12))  # once-per-cycle preserved
    assert first != second  # reshuffled between cycles


def test_streamer_preserves_unconsumed_future():
    """A refresh after consuming k episodes must keep the not-yet-consumed
    remainder of the cycle (no episode skipped or duplicated)."""
    eps = _episodes(10)
    s = EpisodeStreamer(eps, num_envs=1, episodes_per_env=10, shuffle=True, seed=0)
    first = s.initial_order()[0].tolist()
    rolled = s.refresh(np.array([3]))[0].tolist()
    # pending[k] sits at position (3+k) % 10; pending[0] = current episode
    pending = [rolled[(3 + k) % 10] for k in range(10)]
    assert pending[:7] == first[3:]  # survivors in order
    # the 3 fresh draws start the next cycle (a permutation prefix)
    assert len(set(pending[7:])) == 3


def test_streamer_forces_scene_switches():
    eps = _episodes(16, scenes=2)
    s = EpisodeStreamer(
        eps, num_envs=1, episodes_per_env=16, shuffle=True,
        max_scene_repeat_episodes=2, seed=1,
    )
    order = s.initial_order()[0]
    scenes = [eps[i].scene_id for i in order]
    run = 1
    max_run = 1
    for a, b in zip(scenes, scenes[1:]):
        run = run + 1 if a == b else 1
        max_run = max(max_run, run)
    assert max_run <= 2


def test_batched_env_consumes_refreshed_streams(tmp_path):
    """Driving the batched env across two full dataset cycles with refreshes
    between rollouts: every episode id appears once per cycle per slot, and
    at least one slot's two cycle orders differ (shuffle)."""
    from avlen_tpu.config import get_config
    from avlen_tpu.sim.builder import construct_batched_env

    cfg = get_config(
        opts=[
            "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "4",
            "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
            "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES", "24",
            "TASK_CONFIG.DATASET.SYNTHETIC.NUM_SCENES", "2",
            "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
            "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "6",
            "NUM_PROCESSES", "2",
        ],
        model_dir=str(tmp_path),
    )
    env = construct_batched_env(cfg, with_depth=False)
    assert env.streamer is not None
    b = env.num_envs
    state, obs = env.reset()
    consumed = [[] for _ in range(b)]
    for bi in range(b):
        consumed[bi].append(int(np.asarray(state.ep_i)[bi]))
    stop = jnp.zeros((b,), jnp.int32)  # STOP ends the episode every step
    for k in range(70):
        state, out = env.step(state, stop)
        for bi in range(b):
            consumed[bi].append(int(np.asarray(state.ep_i)[bi]))
        if k % 3 == 2:  # refresh between "rollouts"
            state = env.refresh_ep_order(
                state, env.streamer.refresh(np.asarray(state.cursor))
            )
    for bi in range(b):
        ids = consumed[bi]
        slot_set = sorted(set(ids))
        per = len(slot_set)
        cycle1, cycle2 = ids[:per], ids[per : 2 * per]
        assert sorted(cycle1) == slot_set, "cycle 1 must cover the slot's episodes once"
        assert sorted(cycle2) == slot_set, "cycle 2 must cover the slot's episodes once"
    assert any(
        consumed[bi][: len(set(consumed[bi]))]
        != consumed[bi][len(set(consumed[bi])) : 2 * len(set(consumed[bi]))]
        for bi in range(b)
    ), "shuffle must change the order between cycles"


def test_avwan_eval_exactly_once(tmp_path):
    """AV-WAN eval uses the same exactly-once episode-id protocol as every
    other stack (round-2 fix, now swept into av_wan — VERDICT r2 #10)."""
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    from avlen_tpu.utils.tb import TensorboardWriter

    cfg = get_config(
        opts=[
            "TRAINER_NAME", "AVWanTrainer",
            "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "4",
            "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
            "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES", "9",
            "TASK_CONFIG.DATASET.SYNTHETIC.MAX_HOPS", "6",
            "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
            "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
            "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "6",
            "TASK_CONFIG.TASK.GEOMETRIC_MAP.INTERNAL_MAP_SIZE", "300",
            "TASK_CONFIG.TASK.ACTION_MAP.MAP_SIZE", "5",
            "TASK_CONFIG.TASK.GEOMETRIC_MAP.MAP_SIZE", "90",
            "TASK_CONFIG.TASK.ACOUSTIC_MAP.MAP_SIZE", "9",
            "PREDICTION_INTERVAL", "3",
            "NUM_PROCESSES", "2",
            "NUM_UPDATES", "1",
            "RL.PPO.num_steps", "4",
            "RL.PPO.num_mini_batch", "1",
            "RL.PPO.ppo_epoch", "1",
            "RL.PPO.hidden_size", "32",
            "TEST_EPISODE_COUNT", "9",
            "LOG_INTERVAL", "100",
            "CHECKPOINT_INTERVAL", "1",
            "VIDEO_OPTION", "[]",
        ],
        model_dir=str(tmp_path),
    )
    trainer = registry.get_trainer("AVWanTrainer")(cfg)
    trainer.train()
    ckpts = [f for f in os.listdir(cfg.CHECKPOINT_FOLDER) if f.startswith("ckpt")]
    assert ckpts
    with TensorboardWriter(cfg.TENSORBOARD_DIR) as writer:
        means = trainer._eval_checkpoint(
            os.path.join(cfg.CHECKPOINT_FOLDER, sorted(ckpts)[-1]), writer, 0
        )
    assert trainer._last_eval_episode_ids == list(range(9))
    assert "success" in means and "spl" in means
