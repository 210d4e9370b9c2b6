"""Frame-server → env wiring test (VERDICT r1 §2.1: the native mmap frame
bank must actually feed the training path, not just its own unit test)."""

import os

import numpy as np

from avlen_tpu.config import get_config
from avlen_tpu.native.frame_server import write_frame_bank
from avlen_tpu.sim.builder import build_world_from_config, construct_batched_env

OPTS = [
    "NUM_PROCESSES", "2",
    "TASK_CONFIG.DATASET.SYNTHETIC.NUM_SCENES", "1",
    "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "4",
    "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
    "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
    "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
]


def test_env_serves_frames_from_native_cache(tmp_path):
    cfg = get_config(opts=OPTS)
    bank, tables, _ = build_world_from_config(cfg, with_rgb=True, with_depth=True)

    # write per-scene banks in the cache format (what cache_observations.py
    # produces), but with recognizable contents distinct from the generator's
    rng = np.random.RandomState(3)
    cache = str(tmp_path)
    n = tables[0].num_nodes
    rgb = rng.randint(0, 255, (n, 4, 16, 16, 3), np.uint8)
    depth01 = rng.rand(n, 4, 16, 16, 1).astype(np.float32)
    write_frame_bank(os.path.join(cache, "scene000_rgb.avlf"), rgb)
    write_frame_bank(
        os.path.join(cache, "scene000_depth.avlf"), (depth01 * 65535).astype(np.uint16)
    )

    cfg2 = get_config(opts=OPTS + ["TASK_CONFIG.DATASET.FRAME_CACHE_DIR", cache])
    env = construct_batched_env(cfg2, with_rgb=True, with_depth=True)
    state, obs = env.reset()
    node0, rot0 = int(state.node[0]), int(state.rot[0])
    np.testing.assert_array_equal(np.asarray(obs["rgb"][0]), rgb[node0, rot0])
    np.testing.assert_allclose(
        np.asarray(obs["depth"][0]),
        (depth01[node0, rot0] * 65535).astype(np.uint16).astype(np.float32) / 65535.0,
        atol=1e-6,
    )
