"""Semantic visual channel tests (VERDICT r1 item 10): pixelwise
SemanticObjectSensor parity (instance → mpcat40 → 21-way task id remap,
soundspaces/tasks/nav.py:570-698) and EgoMap exposure as an env sensor
(nav.py:236-406)."""

import numpy as np

from avlen_tpu.core.episodes import pack_episodes
from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
from avlen_tpu.sim.mp3d_utils import (
    CATEGORY_INDEX_MAPPING,
    CATEGORY_TO_MP3D_CATEGORY_ID,
    NUM_TASK_CATEGORIES,
    mp3d_id_to_task_id,
)
from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank


def _make_env(sensors, num_envs=4):
    rng = np.random.RandomState(0)
    bank, tables = make_scene_bank(rng, num_scenes=1, side=4, rir_length=200,
                                   sampling_rate=2000, frame_res=16)
    eps = make_episodes(np.random.RandomState(1), tables, 16, min_hops=1, max_hops=4)
    packed = pack_episodes(eps, num_envs=num_envs)
    env = BatchedAudioNavEnv(bank, packed, EnvConfig(max_episode_steps=10, sensors=sensors))
    return env, bank


def test_mp3d_to_task_table_matches_reference_semantics():
    table = mp3d_id_to_task_id()
    for name, task_id in CATEGORY_INDEX_MAPPING.items():
        assert table[CATEGORY_TO_MP3D_CATEGORY_ID[name]] == task_id
    # every unmapped mpcat40 id collapses to the extra 'unknown' class
    mapped = set(CATEGORY_TO_MP3D_CATEGORY_ID.values())
    for i in range(200):
        if i not in mapped:
            assert table[i] == NUM_TASK_CATEGORIES


def test_semantic_object_sensor_remap():
    env, bank = _make_env(("spectrogram", "pose", "semantic_object"))
    state, obs = env.reset()
    sem = np.asarray(obs["semantic_object"])
    b = env.num_envs
    h = bank.semantic.shape[3]
    assert sem.shape == (b, h, h)
    assert sem.min() >= 0 and sem.max() <= NUM_TASK_CATEGORIES

    # replicate the remap chain in numpy for slot 0
    scene, node, rot = int(state.scene[0]), int(state.node[0]), int(state.rot[0])
    inst = np.asarray(bank.semantic)[scene, node, rot]
    inst_map = np.asarray(bank.semantic_instance_to_mp3d)[scene]
    inst = np.where(inst >= inst_map.shape[0], 0, inst)
    expect = mp3d_id_to_task_id()[np.clip(inst_map[inst], 0, 199)]
    np.testing.assert_array_equal(sem[0], expect)
    # frames must contain both mapped objects and unknown background
    assert (sem == NUM_TASK_CATEGORIES).any()


def test_semantic_object_sensor_steps_under_jit():
    import jax.numpy as jnp

    env, _ = _make_env(("spectrogram", "pose", "semantic_object"))
    state, obs = env.reset()
    state, out = env.step(state, jnp.ones((env.num_envs,), jnp.int32))
    assert out.obs["semantic_object"].shape[0] == env.num_envs


def test_egomap_env_sensor():
    env, bank = _make_env(("spectrogram", "pose", "depth", "egomap"))
    _, obs = env.reset()
    ego = np.asarray(obs["egomap"])
    assert ego.shape == (env.num_envs, 31, 31, 2)
    assert set(np.unique(ego)).issubset({0.0, 1.0})
    # explored ⊇ obstacle wherever obstacle is set
    assert (ego[..., 1] >= ego[..., 0]).all()

    from avlen_tpu.ops.mapping import depth_to_egomap

    import jax.numpy as jnp

    state, _ = env.reset()
    depth = bank.depth[state.scene, state.node, state.rot]
    np.testing.assert_array_equal(ego, np.asarray(depth_to_egomap(depth)))


def test_builder_exposes_semantic_sensors():
    from avlen_tpu.config import get_config
    from avlen_tpu.sim.builder import construct_batched_env

    cfg = get_config(opts=[
        "NUM_PROCESSES", "2",
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "4",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
        "TASK_CONFIG.TASK.SENSORS",
        "['SPECTROGRAM_SENSOR','POSE_SENSOR','SEMANTIC_OBJECT_SENSOR','EGOMAP_SENSOR']",
    ])
    env = construct_batched_env(cfg, with_depth=True)
    _, obs = env.reset()
    assert "semantic_object" in obs and "egomap" in obs
