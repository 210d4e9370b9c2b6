"""Round-3 stragglers: MPCat40Index sensor, TopDownMap measure, scheduled
sampling for the speaker (VERDICT r2 #9 / Missing #6)."""

import jax
import jax.numpy as jnp
import numpy as np


def _env(tmp_path, extra_opts=()):
    from avlen_tpu.config import get_config
    from avlen_tpu.sim.builder import construct_batched_env

    opts = [
        "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "4",
        "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
        "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES", "8",
        "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "6",
        "NUM_PROCESSES", "2",
    ] + list(extra_opts)
    cfg = get_config(opts=opts, model_dir=str(tmp_path))
    return cfg, construct_batched_env(cfg, with_depth=False)


def test_mpcat40_index_sensor(tmp_path):
    """mpcat40_index = the episode category's raw mpcat40 id, shape (B, 1)
    (MPCAT40Index, soundspaces/tasks/nav.py:515-569)."""
    from avlen_tpu.sim.mp3d_utils import task_id_to_mp3d_id

    cfg, env = _env(
        tmp_path,
        ["TASK_CONFIG.TASK.SENSORS", '["SPECTROGRAM_SENSOR", "MPCAT40_INDEX_SENSOR"]'],
    )
    assert "mpcat40_index" in env.config.sensors
    state, obs = env.reset()
    assert obs["mpcat40_index"].shape == (2, 1)
    table = task_id_to_mp3d_id()
    got = np.asarray(obs["mpcat40_index"])[:, 0]
    want = table[np.asarray(state.category)]
    np.testing.assert_array_equal(got, want)
    # chair (task 0) must map to mpcat40 3, bathtub (15) to 25 (nav.py:521-540)
    assert table[0] == 3 and table[15] == 25


def test_top_down_map_measure(tmp_path):
    """TASK.MEASUREMENTS TOP_DOWN_MAP enables the agent trace and the
    host-side measure renders the habitat info["top_down_map"] contract."""
    from avlen_tpu.utils.maps import top_down_map_measure

    cfg, env = _env(
        tmp_path, ["TASK_CONFIG.TASK.MEASUREMENTS", '["TOP_DOWN_MAP"]', "VIDEO_OPTION", "[]"]
    )
    assert env.config.record_pose_info
    state, obs = env.reset()
    metrics_seq = []
    step = jax.jit(env._step_impl_noquery)
    for _ in range(3):
        state, out = step(state, jnp.ones((2,), jnp.int32))
        metrics_seq.append(out.metrics)
    stacked = {k: jnp.stack([m[k] for m in metrics_seq]) for k in metrics_seq[0]}
    assert "agent_node" in stacked
    payload = top_down_map_measure(stacked, env.scene_tables, t=2, b=0)
    assert payload["map"].shape == (256, 256, 3) and payload["map"].dtype == np.uint8
    assert payload["fog_of_war_mask"].shape == (256, 256)
    y, x = payload["agent_map_coord"]
    assert 0 <= y < 256 and 0 <= x < 256
    assert isinstance(payload["agent_angle"], float)


def test_sound_fft_bank_bit_equal_to_inline_path(tmp_path):
    """The precomputed per-(sound, second) segment-rFFT bank must reproduce
    the inline non-banked audio path bit-for-bit (same ops, same inputs)."""
    cfg, env = _env(
        tmp_path,
        [
            "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", "False",
            "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SOUND_FFTS", "True",
            "TASK_CONFIG.DATASET.SYNTHETIC.SOUND_SECS", "3",
        ],
    )
    assert env.bank.sound_fft_bank is not None
    assert env.bank.sound_fft_bank.dtype == jnp.complex64

    state, obs_banked = env.reset()
    env.bank.sound_fft_bank = None  # rebind: inline path
    env.binder.add("bank", env.bank)
    state2, obs_inline = env.reset()
    np.testing.assert_array_equal(
        np.asarray(obs_banked["spectrogram"]), np.asarray(obs_inline["spectrogram"])
    )
    # stays equal across steps (audio_index advances through the 3-s sound)
    step = jax.jit(env._step_impl_noquery)
    s_b, s_i = state, state2
    envb = env
    for _ in range(3):
        s_i, out_i = step(s_i, jnp.ones((2,), jnp.int32))
    # re-enable the bank and replay the same actions
    from avlen_tpu.sim.scene import precompute_sound_fft_bank

    envb.bank.sound_fft_bank = precompute_sound_fft_bank(envb.bank)
    envb.binder.add("bank", envb.bank)
    step2 = jax.jit(envb._step_impl_noquery)
    for _ in range(3):
        s_b, out_b = step2(s_b, jnp.ones((2,), jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(out_b.obs["spectrogram"]), np.asarray(out_i.obs["spectrogram"])
    )


def test_speaker_scheduled_sampling_trains_and_decodes():
    from avlen_tpu.dialog.speaker.speaker import Speaker
    from avlen_tpu.dialog.speaker.train_speaker import train_speaker
    from avlen_tpu.sim.graph import build_scene_tables
    from avlen_tpu.sim.synthetic import make_grid_scene

    rng = np.random.RandomState(0)
    tables = [build_scene_tables(make_grid_scene(rng, side=3))]
    params, vocab, acc = train_speaker(
        tables, num_steps=30, batch=16, hidden_size=32, scheduled_sampling=True
    )
    assert np.isfinite(acc)
    sp = Speaker(
        [t.positions for t in tables], backend="neural", vocab=vocab,
        neural_params=params, hidden_size=32,
    )
    words = sp.generate_instr([{"heading": 270, "scene": 0, "path": [0, 1]}])[0]["words"]
    assert isinstance(words, list)
