"""Callback-free host audio path (VERDICT r3 #1): chunked rollouts with a
device associative RIR cache + host prefetch (data/host_prefetch.py,
parallel/chunked.py) replace `io_callback` mmap gathers on backends whose
PJRT implements no host send/recv (the axon TPU). These tests force the path
on (TPU.HOST_PREFETCH=on) so CI exercises it even though XLA:CPU supports
callbacks.

Reference cost replaced: per-step `wavfile.read` + `fftconvolve`
(soundspaces/simulator.py:652-699).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "reference_tree")
SCENE_DIR = os.path.join(ROOT, "metadata", "mp3d", "sceneA")
RIR_DIR = os.path.join(ROOT, "binaural_rirs", "mp3d", "sceneA")
SOUND_DIR = os.path.join(ROOT, "sounds", "1s_all")
DATA_PATH = os.path.join(ROOT, "datasets", "semantic_audionav", "v1", "train", "train.json.gz")


@pytest.fixture(scope="module", autouse=True)
def ensure_fixtures():
    if not os.path.exists(SCENE_DIR):
        from tests.data.make_reference_fixtures import main

        main(ROOT)


def _packed_store(tmp_path):
    from avlen_tpu.data.reference import HostRIRStore, load_rir_tree, pack_rir_tree

    dense = load_rir_tree([RIR_DIR], num_nodes=4, sampling_rate=4000)
    prefix = str(tmp_path / "rirs")
    pack_rir_tree([RIR_DIR], 4, prefix, sampling_rate=4000)
    return dense, HostRIRStore(prefix + ".npz")


def test_assoc_cache_serves_exact_rirs_and_zeros_on_miss(tmp_path):
    from avlen_tpu.data.host_prefetch import HostRIRPrefetcher

    dense, store = _packed_store(tmp_path)
    hops = np.zeros((1, 4, 4), np.int32)  # all pairs "reachable" (unit test)
    eps = {k: np.zeros((1,), np.int32) for k in ("scene", "start_node", "goal_node", "distractor_node")}
    pf = HostRIRPrefetcher(store, hops, eps, capacity=32)
    cache = pf.make_cache()

    # cache (scene=0, az=1, recv=2, src=3) and (0, 0, 0, 1)
    keys = np.asarray([pf._pack(*map(np.int64, t)) for t in [(0, 1, 2, 3), (0, 0, 0, 1)]])
    cache = pf.ensure(cache, keys)
    got = cache.gather(
        jnp.zeros((3,), jnp.int32),
        jnp.asarray([1, 0, 2], jnp.int32),
        jnp.asarray([2, 0, 1], jnp.int32),
        jnp.asarray([3, 1, 2], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got[0]), dense[0, 1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), dense[0, 0, 0, 1], atol=1e-6)
    assert float(np.abs(np.asarray(got[2])).sum()) == 0.0  # miss → silence
    # re-ensuring the same keys is upload-free
    before = pf.uploads
    cache = pf.ensure(cache, keys)
    assert pf.uploads == before


def test_lru_eviction_and_capacity_error(tmp_path):
    from avlen_tpu.data.host_prefetch import HostRIRPrefetcher

    _, store = _packed_store(tmp_path)
    hops = np.zeros((1, 4, 4), np.int32)
    eps = {k: np.zeros((1,), np.int32) for k in ("scene", "start_node", "goal_node", "distractor_node")}
    pf = HostRIRPrefetcher(store, hops, eps, capacity=4)
    cache = pf.make_cache()
    all_keys = np.asarray(
        [pf._pack(np.int64(0), np.int64(a), np.int64(r), np.int64(s))
         for a in range(2) for r in range(2) for s in range(2)]
    )  # 8 keys > capacity 4
    cache = pf.ensure(cache, all_keys[:4])
    first_four = set(int(k) for k in all_keys[:4])
    assert set(pf.key_to_slot) == first_four
    cache = pf.ensure(cache, all_keys[4:8])  # evicts the LRU first four
    assert set(pf.key_to_slot) == set(int(k) for k in all_keys[4:8])
    with pytest.raises(RuntimeError, match="RIR_CACHE_SLOTS"):
        pf.ensure(cache, all_keys)  # 8 > capacity in one working set


def _reference_config(extra=()):
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config

    opts = [
        "TASK_CONFIG.DATASET.SOURCE", "reference",
        "TASK_CONFIG.DATASET.DATA_PATH", DATA_PATH,
        "TASK_CONFIG.SIMULATOR.SCENE_DATASET", "mp3d",
        "TASK_CONFIG.SIMULATOR.AUDIO.METADATA_DIR", os.path.join(ROOT, "metadata"),
        "TASK_CONFIG.SIMULATOR.AUDIO.BINAURAL_RIR_DIR", os.path.join(ROOT, "binaural_rirs"),
        "TASK_CONFIG.SIMULATOR.AUDIO.SOURCE_SOUND_DIR", SOUND_DIR,
        "TASK_CONFIG.SIMULATOR.SCENE_OBSERVATION_DIR", os.path.join(ROOT, "scene_observations"),
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "4000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "10",
        "NUM_PROCESSES", "2",
        "NUM_UPDATES", "2",
        "RL.PPO.num_steps", "8",
        "RL.PPO.num_mini_batch", "1",
        "RL.PPO.ppo_epoch", "1",
        "RL.PPO.hidden_size", "32",
        "LOG_INTERVAL", "1",
        "CHECKPOINT_INTERVAL", "1000000",
    ] + list(extra)
    return get_config(opts=opts)


_PREFETCH_OPTS = [
    "TRAINER_NAME", "savi",
    "TASK_CONFIG.SIMULATOR.AUDIO.DENSE_RIR_MAX_BYTES", "0",
    "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", "False",
    "TASK_CONFIG.SIMULATOR.AUDIO.RIR_CACHE_SLOTS", "512",
    "TPU.HOST_PREFETCH", "on",
    "TPU.ROLLOUT_CHUNK", "4",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size", "32",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "2",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.nhead", "2",
]


def _model_dirs(cfg, tmp_path):
    cfg.defrost()
    cfg.MODEL_DIR = str(tmp_path)
    cfg.CHECKPOINT_FOLDER = os.path.join(str(tmp_path), "data")
    cfg.TENSORBOARD_DIR = os.path.join(str(tmp_path), "tb")
    cfg.LOG_FILE = ""
    cfg.freeze()
    return cfg


def test_savi_trains_from_reference_tree_via_host_prefetch(tmp_path):
    """The VERDICT r3 #1 'done' bar: SAVi trains from the reference fixture
    tree with the dense-bank threshold forced to 0 on a backend treated as
    callback-less — every RIR reaches the device through the chunked
    prefetch cache, no io_callback anywhere in the program."""
    from avlen_tpu.core.registry import registry
    from avlen_tpu.data.host_prefetch import AssocRIRCache

    cfg = _model_dirs(_reference_config(_PREFETCH_OPTS), tmp_path)
    trainer = registry.get_trainer("savi")(cfg)
    trainer.ensure_setup()
    assert isinstance(trainer.env.bank.rir, AssocRIRCache)
    assert trainer.env.host_prefetcher is not None
    assert trainer._chunked is not None and trainer._chunk_len == 4
    trainer.train()
    assert trainer.num_updates_done == 2
    for leaf in jax.tree.leaves(trainer.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # the prefetcher actually served data and never needed a replay on this
    # fully-covered fixture (lookahead 2 >= resets per 4-step chunk here is
    # not guaranteed — replays are allowed, but data must have flowed)
    assert trainer.env.host_prefetcher.uploaded_entries > 0


def test_host_prefetch_observations_match_dense_bank(tmp_path):
    """Exactness: the same episode stream stepped with the same actions
    yields bit-identical spectrograms whether RIRs come from the dense
    device bank or through the prefetch cache."""
    from avlen_tpu.parallel.chunked import ChunkedCollector
    from avlen_tpu.sim.builder import construct_batched_env

    cfg_dense = _reference_config(["TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", "False"])
    cfg_pref = _reference_config(_PREFETCH_OPTS[2:])  # skip TRAINER_NAME pair
    env_a = construct_batched_env(cfg_dense, with_depth=False)
    env_b = construct_batched_env(cfg_pref, with_depth=False)
    assert env_b.host_prefetcher is not None

    state_a, obs_a = env_a.reset()
    state_b, obs_b = env_b.reset()
    coll = ChunkedCollector(env_b.host_prefetcher, env_b.binder, 1, 1)
    consts_b = coll.prime(state_b)
    obs_b = env_b._observe_jit(consts_b, state_b)
    np.testing.assert_allclose(
        np.asarray(obs_a["spectrogram"]), np.asarray(obs_b["spectrogram"]), atol=1e-5
    )

    step_a = jax.jit(env_a._step_impl_noquery)

    def step_b_fn(consts, s, a):
        with env_b.binder.bind(consts):
            return env_b._step_impl_noquery(s, a)

    step_b = jax.jit(step_b_fn)
    rng = np.random.RandomState(0)
    for _ in range(6):
        actions = jnp.asarray(rng.randint(1, 4, size=(env_a.num_envs,)), jnp.int32)
        # refresh the cache for the upcoming step (radius 1)
        from avlen_tpu.data.host_prefetch import env_state_to_host

        coll.cache = coll.prefetcher.ensure(
            coll.cache, coll.prefetcher.plan(env_state_to_host(state_b), 1)
        )
        consts_b = coll.current_consts()
        state_a, out_a = step_a(state_a, actions)
        state_b, out_b = step_b(consts_b, state_b, actions)
        np.testing.assert_allclose(
            np.asarray(out_a.obs["spectrogram"]),
            np.asarray(out_b.obs["spectrogram"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_a.reward), np.asarray(out_b.reward), atol=1e-6
        )


from tests.isolation import isolated


@isolated(__file__)
def test_savi_host_prefetch_trains_on_mesh(tmp_path):
    """Chunked prefetch under shard_map on the 8-device mesh: the collect
    chunks run as SPMD programs over sharded env slots while the host
    refreshes the replicated cache between chunks; the PPO update pmean-syncs
    grads as usual."""
    from avlen_tpu.core.registry import registry

    cfg = _model_dirs(
        _reference_config(_PREFETCH_OPTS + ["NUM_PROCESSES", "8", "NUM_UPDATES", "1"]),
        tmp_path,
    )
    trainer = registry.get_trainer("savi")(cfg)
    trainer.ensure_setup()
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    assert trainer._chunked is not None
    trainer.train()
    assert trainer.num_updates_done == 1
    for leaf in jax.tree.leaves(trainer.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pack_host_rirs_routes_synthetic_world_through_store(tmp_path):
    """DATASET.SYNTHETIC.PACK_HOST_RIRS (r5): the procedural RIRs are densely
    rendered, packed into the HostRIRStore on-disk format and re-served
    through the chunked prefetch cache — the config-only route that lets
    benchmarks exercise the real-reference-data serving machinery (the
    counterpart of soundspaces/simulator.py:652-662) at any synthetic scale.
    Spectrograms must match the pure device-bank world bit-for-bit."""
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry
    from avlen_tpu.data.host_prefetch import AssocRIRCache

    opts = [
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_SCENES", "1",
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "3",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "600",
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES", "16",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "32",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "4000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "10",
        "NUM_PROCESSES", "2",
        "NUM_UPDATES", "2",
        "RL.PPO.num_steps", "8",
        "RL.PPO.num_mini_batch", "1",
        "RL.PPO.ppo_epoch", "1",
        "RL.PPO.hidden_size", "32",
        "LOG_INTERVAL", "1",
        "CHECKPOINT_INTERVAL", "1000000",
    ]
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.sim.builder import construct_batched_env

    cfg_dense = get_config(opts=opts + [
        "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", "False",
    ])
    cfg_pack = get_config(opts=opts + _PREFETCH_OPTS[2:] + [
        "TASK_CONFIG.DATASET.SYNTHETIC.PACK_HOST_RIRS", "True",
    ])
    env_a = construct_batched_env(cfg_dense, with_depth=False)
    env_b = construct_batched_env(cfg_pack, with_depth=False)
    assert env_b.host_prefetcher is not None
    assert isinstance(env_b.bank.rir, AssocRIRCache)

    from avlen_tpu.parallel.chunked import ChunkedCollector

    state_a, obs_a = env_a.reset()
    state_b, _ = env_b.reset()
    coll = ChunkedCollector(env_b.host_prefetcher, env_b.binder, 1, 1)
    consts_b = coll.prime(state_b)
    obs_b = env_b._observe_jit(consts_b, state_b)
    np.testing.assert_allclose(
        np.asarray(obs_a["spectrogram"]), np.asarray(obs_b["spectrogram"]), atol=1e-5
    )

    # and the savi trainer trains end-to-end through the packed route
    cfg = _model_dirs(
        get_config(opts=opts + _PREFETCH_OPTS + [
            "TASK_CONFIG.DATASET.SYNTHETIC.PACK_HOST_RIRS", "True",
        ]),
        tmp_path,
    )
    trainer = registry.get_trainer("savi")(cfg)
    trainer.ensure_setup()
    assert trainer._chunked is not None
    trainer.train()
    assert trainer.num_updates_done == 2
    for leaf in jax.tree.leaves(trainer.params):
        assert np.isfinite(np.asarray(leaf)).all()
