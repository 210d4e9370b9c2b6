"""Environment construction from config.

The TPU analogue of `construct_envs` (ss_baselines/common/env_utils.py:
28-137): instead of spawning one simulator process per env and splitting
scenes across processes, it builds ONE batched device env whose episode
packing deals scenes round-robin across env slots (core/episodes.pack_episodes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from avlen_tpu.config.node import ConfigNode
from avlen_tpu.core.episodes import EpisodeDataset, EpisodeStreamer, pack_episodes
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig, RewardConfig
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


def reward_config_from(config: ConfigNode) -> RewardConfig:
    rl = config.RL
    return RewardConfig(
        success_reward=rl.SUCCESS_REWARD,
        slack_reward=rl.SLACK_REWARD,
        with_time_penalty=rl.WITH_TIME_PENALTY,
        with_distance_reward=rl.WITH_DISTANCE_REWARD,
        distance_reward_scale=rl.DISTANCE_REWARD_SCALE,
        with_query_constraint=rl.WITH_QUERY_CONSTRAINT,
        num_total_query=rl.NUM_TOTAL_QUERY,
        query_reward=rl.QUERY_REWARD,
        soft_query_reward=rl.SOFT_QUERY_REWARD,
        consecutive_constraint_reward=rl.CONSECUTIVE_CONSTRAINT_REWARD,
        with_distance_constraint=rl.WITH_DISTANCE_CONSTRAINT,
        query_reward_distance=rl.QUERY_REWARD_DISTANCE,
    )


def sensors_from_task(tc: ConfigNode) -> Tuple[str, ...]:
    mapping = {
        "SPECTROGRAM_SENSOR": "spectrogram",
        "AUDIOGOAL_SENSOR": "audiogoal",
        "CATEGORY": "category",
        "CATEGORY_BELIEF": "category_belief",
        "LOCATION_BELIEF": "location_belief",
        "POSE_SENSOR": "pose",
        "COLLISION": "collision",
        "ORACLE_ACTION_SENSOR": "oracle_action",
        "POINTGOAL_WITH_GPS_COMPASS_SENSOR": "pointgoal_with_gps_compass",
        "SEMANTIC_OBJECT_SENSOR": "semantic_object",
        "EGOMAP_SENSOR": "egomap",
        "MPCAT40_INDEX_SENSOR": "mpcat40_index",
    }
    sensors = [mapping[s] for s in tc.TASK.SENSORS if s in mapping]
    if not sensors:
        sensors = ["spectrogram", "pose", "category", "collision", "oracle_action"]
    return tuple(sensors)


def build_world_from_config(
    config: ConfigNode,
    with_rgb: bool = False,
    with_depth: bool = True,
    seed: Optional[int] = None,
):
    """(bank, tables, episodes) from either asset source.

    DATASET.SOURCE "synthetic" generates procedural worlds;
    "reference" ingests the reference's on-disk tree (metadata graphs,
    binaural RIR wav trees, scene-observation pickles, json.gz episode
    shards) through avlen_tpu/data/reference.py.
    """
    tc = config.TASK_CONFIG
    if tc.DATASET.SOURCE == "reference":
        from avlen_tpu.data.reference import ReferenceDataConfig, build_reference_scene_bank

        audio = tc.SIMULATOR.AUDIO
        content = list(tc.DATASET.CONTENT_SCENES)
        data_path = tc.DATASET.DATA_PATH.format(
            version=tc.DATASET.VERSION, split=tc.DATASET.SPLIT
        )
        ref_cfg = ReferenceDataConfig(
            metadata_dir=f"{audio.METADATA_DIR}/{tc.SIMULATOR.SCENE_DATASET}",
            binaural_rir_dir=f"{audio.BINAURAL_RIR_DIR}/{tc.SIMULATOR.SCENE_DATASET}",
            source_sound_dir=audio.SOURCE_SOUND_DIR,
            data_path=data_path,
            scene_observations_dir=(
                f"{tc.SIMULATOR.SCENE_OBSERVATION_DIR}/{tc.SIMULATOR.SCENE_DATASET}"
                if tc.SIMULATOR.USE_RENDERED_OBSERVATIONS else None
            ),
            sampling_rate=audio.RIR_SAMPLING_RATE,
            grid_size=tc.SIMULATOR.GRID_SIZE,
            max_rir_length=audio.MAX_RIR_LENGTH,
            scenes=None if content == ["*"] else content,
            dense_rir_max_bytes=int(audio.DENSE_RIR_MAX_BYTES),
            allow_host_prefetch=config.TPU.HOST_PREFETCH != "off",
        )
        return build_reference_scene_bank(ref_cfg)

    syn = tc.DATASET.SYNTHETIC
    rng = np.random.RandomState(seed if seed is not None else syn.SEED)
    bank, tables = make_scene_bank(
        rng,
        num_scenes=syn.NUM_SCENES,
        side=syn.SIDE,
        grid_size=tc.SIMULATOR.GRID_SIZE,
        sampling_rate=tc.SIMULATOR.AUDIO.RIR_SAMPLING_RATE,
        rir_length=syn.RIR_LENGTH,
        num_sounds=syn.NUM_SOUNDS,
        sound_secs=syn.SOUND_SECS,
        frame_res=syn.FRAME_RES,
        with_frames=with_rgb or with_depth,
    )
    episodes = make_episodes(
        rng,
        tables,
        syn.NUM_EPISODES,
        grid_size=tc.SIMULATOR.GRID_SIZE,
        num_sounds=syn.NUM_SOUNDS,
        min_hops=syn.MIN_HOPS,
        max_hops=syn.MAX_HOPS,
        with_distractor=tc.SIMULATOR.AUDIO.HAS_DISTRACTOR_SOUND,
    )
    if tc.DATASET.FRAME_CACHE_DIR:
        _load_frame_banks_via_server(bank, tables, tc.DATASET.FRAME_CACHE_DIR)
    if syn.PACK_HOST_RIRS:
        _pack_synthetic_host_rirs(bank, tc.SIMULATOR.AUDIO.RIR_SAMPLING_RATE)
    return bank, tables, episodes


def _pack_synthetic_host_rirs(bank, sampling_rate: int) -> None:
    """Densely render the procedural RIRs and re-serve them through the mmap
    `HostRIRStore` — the config-only route (DATASET.SYNTHETIC.PACK_HOST_RIRS)
    onto the host-served audio paths (io_callback gathers, or the chunked
    host-prefetch cache on callback-less backends) at any synthetic scale.
    This is how benchmarks/tests exercise the real-reference-data serving
    machinery (the counterpart of the reference's per-step wav reads,
    soundspaces/simulator.py:652-662) without shipping Matterport assets."""
    import atexit
    import os
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from avlen_tpu.data.reference import HostRIRStore, pack_dense_rirs

    s_count = int(bank.tables["positions"].shape[0])
    n = bank.max_nodes
    probe = np.asarray(
        bank.rir.gather(jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    )
    length = probe.shape[1]
    total_bytes = s_count * 4 * n * n * length * 2 * 4
    if total_bytes > 16 << 30:
        raise ValueError(
            f"PACK_HOST_RIRS would render a {total_bytes / 2**30:.1f} GB dense "
            "bank; shrink SYNTHETIC.SIDE/RIR_LENGTH (real reference data is "
            "already served host-side without densification)"
        )
    gather = jax.jit(lambda sc, a, r, s: bank.rir.gather(sc, a, r, s))
    combos = np.stack(
        np.meshgrid(np.arange(s_count), np.arange(4), np.arange(n), np.arange(n),
                    indexing="ij"), -1,
    ).reshape(-1, 4).astype(np.int32)
    dense = np.empty((combos.shape[0], length, 2), np.float32)
    for i in range(0, combos.shape[0], 1024):
        part = combos[i : i + 1024]
        dense[i : i + part.shape[0]] = np.asarray(
            gather(part[:, 0], part[:, 1], part[:, 2], part[:, 3])
        )
    dense = dense.reshape(s_count, 4, n, n, length, 2)
    cache_dir = tempfile.mkdtemp(prefix="avlen_packed_rirs_")
    atexit.register(shutil.rmtree, cache_dir, ignore_errors=True)
    idx = pack_dense_rirs(dense, os.path.join(cache_dir, "rirs"), sampling_rate)
    del dense
    bank.rir = HostRIRStore(idx)


def _load_frame_banks_via_server(bank, tables_list, cache_dir: str) -> None:
    """Replace the bank's frames with cached ones served by the native mmap
    frame server (scripts/cache_observations.py writes them) — the runtime
    counterpart of the reference's per-scene observation pickles loaded at
    sim startup (soundspaces/simulator.py:62-93, 372-377)."""
    import os

    import jax.numpy as jnp

    from avlen_tpu.native.frame_server import FrameServer

    n_max = int(bank.tables["positions"].shape[1])
    rgbs, depths = [], []
    for i, t in enumerate(tables_list):
        nodes = np.repeat(np.arange(t.num_nodes, dtype=np.int32), 4)
        rots = np.tile(np.arange(4, dtype=np.int32), t.num_nodes)
        rgb_path = os.path.join(cache_dir, f"scene{i:03d}_rgb.avlf")
        depth_path = os.path.join(cache_dir, f"scene{i:03d}_depth.avlf")
        if not (os.path.exists(rgb_path) and os.path.exists(depth_path)):
            raise FileNotFoundError(f"frame bank missing for scene {i} in {cache_dir}")
        srv = FrameServer(rgb_path, dtype=np.uint8)
        r = srv.gather(nodes, rots).reshape(t.num_nodes, 4, srv.h, srv.w, srv.c)
        srv.close()
        srv = FrameServer(depth_path, dtype=np.uint16)
        d = srv.gather(nodes, rots).reshape(t.num_nodes, 4, srv.h, srv.w, srv.c)
        srv.close()
        rp = np.zeros((n_max,) + r.shape[1:], np.uint8)
        dp = np.zeros((n_max,) + d.shape[1:], np.float32)
        rp[: t.num_nodes] = r
        dp[: t.num_nodes] = d.astype(np.float32) / 65535.0
        rgbs.append(rp)
        depths.append(dp)
    bank.rgb = jnp.asarray(np.stack(rgbs))
    bank.depth = jnp.asarray(np.stack(depths))


def construct_batched_env(
    config: ConfigNode,
    num_envs: Optional[int] = None,
    with_rgb: bool = False,
    with_depth: bool = True,
    seed: Optional[int] = None,
    extra_sensors: Tuple[str, ...] = (),
) -> BatchedAudioNavEnv:
    tc = config.TASK_CONFIG
    b = num_envs or config.NUM_PROCESSES
    bank, tables, episodes = build_world_from_config(
        config, with_rgb=with_rgb, with_depth=with_depth, seed=seed
    )
    # heard/unheard sound-split sanitation: no train episode may use a
    # held-out sound (DATASET.HELD_OUT_SOUNDS; eval remapping lives in
    # BatchedAudioNavEnv.eval_consts — semantic_audionav_task.py:222-224)
    sound_split = None
    held = list(tc.DATASET.HELD_OUT_SOUNDS)
    if held:
        names = getattr(bank, "sound_names", None)
        held_ids = set()
        for h in held:
            if isinstance(h, str) and not h.lstrip("-").isdigit():
                if names is None or h not in names:
                    raise ValueError(f"HELD_OUT_SOUNDS entry {h!r} not in the sound set")
                held_ids.add(names.index(h))
            else:
                held_ids.add(int(h))
        num_sounds = int(bank.sounds_padded.shape[0])
        train_ids = [i for i in range(num_sounds) if i not in held_ids]
        if not train_ids:
            raise ValueError("HELD_OUT_SOUNDS holds out every sound; nothing to train on")
        for ep in episodes:
            if ep.sound_id in held_ids:
                ep.sound_id = train_ids[ep.sound_id % len(train_ids)]
            if ep.distractor_sound_id in held_ids:
                ep.distractor_sound_id = train_ids[ep.distractor_sound_id % len(train_ids)]
        sound_split = (train_ids, sorted(held_ids))

    it_opts = tc.ENVIRONMENT.ITERATOR_OPTIONS
    if 0 < it_opts.NUM_EPISODE_SAMPLE < len(episodes):
        # habitat Dataset NUM_EPISODE_SAMPLE: train on a random subset
        rng_s = np.random.RandomState(config.SEED)
        keep = sorted(rng_s.choice(len(episodes), it_opts.NUM_EPISODE_SAMPLE, replace=False))
        episodes = [episodes[i] for i in keep]
    packed = pack_episodes(episodes, num_envs=b)
    # per-slot episode streams honoring ITERATOR_OPTIONS (shuffle per cycle,
    # forced scene switches — habitat dataset.py:310-356); trainers call
    # env.streamer.refresh between supersteps (EpisodeStreamer docstring)
    streamer = None
    if it_opts.SHUFFLE or it_opts.MAX_SCENE_REPEAT_EPISODES > 0:
        streamer = EpisodeStreamer(
            episodes, b, int(packed["order"].shape[1]),
            shuffle=it_opts.SHUFFLE,
            group_by_scene=it_opts.GROUP_BY_SCENE,
            max_scene_repeat_episodes=it_opts.MAX_SCENE_REPEAT_EPISODES,
            seed=config.SEED,
        )
        packed["order"] = streamer.initial_order()

    sensors = list(sensors_from_task(tc))
    if with_depth and "depth" not in sensors:
        sensors.append("depth")
    if with_rgb and "rgb" not in sensors:
        sensors.append("rgb")
    if config.RL.PPO.use_belief_predictor or config.RL.PPO.policy_type in ("smt", "dialog", "interactive"):
        # belief slots must exist in every observation for the SMT stacks
        # (filled by the belief predictor or zeros — nav.py:452-512)
        extra_sensors = tuple(extra_sensors) + ("category_belief", "location_belief", "category")
    for s in extra_sensors:
        if s not in sensors:
            sensors.append(s)
    # reference banks without cached frames can't serve visual sensors
    if bank.rgb is None:
        sensors = [s for s in sensors if s != "rgb"]
    if bank.depth is None:
        sensors = [s for s in sensors if s not in ("depth", "egomap")]
    if bank.semantic is None:
        sensors = [s for s in sensors if s != "semantic_object"]

    # callback-free host audio serving: when the RIR provider is the mmap
    # HostRIRStore and host callbacks are unavailable (or TPU.HOST_PREFETCH
    # forces it), swap in the device associative cache + host prefetcher and
    # record per-step audio pairs for its verify/replay loop
    # (data/host_prefetch.py, parallel/chunked.py)
    host_prefetcher = None
    from avlen_tpu.data.reference import HostRIRStore

    if isinstance(bank.rir, HostRIRStore):
        from avlen_tpu.utils.platform import host_callbacks_supported

        mode = config.TPU.HOST_PREFETCH
        if mode == "on" or (mode == "auto" and not host_callbacks_supported()):
            from avlen_tpu.data.host_prefetch import HostRIRPrefetcher

            host_prefetcher = HostRIRPrefetcher(
                bank.rir,
                np.asarray(bank.tables["hops"]),
                packed,
                capacity=int(tc.SIMULATOR.AUDIO.RIR_CACHE_SLOTS),
                has_distractor=tc.SIMULATOR.AUDIO.HAS_DISTRACTOR_SOUND,
            )
            bank.rir = host_prefetcher.make_cache()

    env_cfg = EnvConfig(
        max_episode_steps=tc.ENVIRONMENT.MAX_EPISODE_STEPS,
        success_distance=tc.TASK.SUCCESS_DISTANCE,
        grid_size=tc.SIMULATOR.GRID_SIZE,
        sensors=tuple(sensors),
        reward=reward_config_from(config),
        has_distractor=tc.SIMULATOR.AUDIO.HAS_DISTRACTOR_SOUND,
        # the TopDownMap *measure* (habitat nav.py:705) needs the agent trace
        # in the step metrics; it is rendered host-side from the trace
        # (utils/maps.top_down_map_measure), like the videos
        record_pose_info=bool(config.VIDEO_OPTION)
        or "TOP_DOWN_MAP" in tc.TASK.MEASUREMENTS,
        record_audio_pairs=host_prefetcher is not None,
    )
    audio_cfg = tc.SIMULATOR.AUDIO
    if (
        audio_cfg.CACHE_SPECTROGRAMS
        and not env_cfg.has_distractor
        and host_prefetcher is None  # cache starts empty — nothing to render
    ):
        from avlen_tpu.sim.scene import precompute_spectrogram_bank

        bank.spec_bank = precompute_spectrogram_bank(
            bank, max_bytes=audio_cfg.SPECTROGRAM_CACHE_MAX_BYTES
        )
    if audio_cfg.CACHE_SOUND_FFTS and bank.spec_bank is None:
        from avlen_tpu.sim.scene import precompute_sound_fft_bank

        bank.sound_fft_bank = precompute_sound_fft_bank(bank)

    env = BatchedAudioNavEnv(bank, packed, env_cfg)
    env.host_prefetcher = host_prefetcher  # chunked-rollout audio serving
    env.scene_tables = tables  # host-side per-scene tables (speaker/instruction bank)
    env.episodes = episodes  # host-side episode list (sub_instr bank, iterator refresh)
    env.streamer = streamer  # per-slot ITERATOR_OPTIONS episode streams
    env.sound_split = sound_split  # (train_ids, held_out_ids) or None
    return env
