"""Aux subsystem tests: scripts, simple agents, video, maps, preemption state,
pretraining job, episode iterator semantics, checkpoint polling."""

import os
import subprocess
import sys

import numpy as np
import pytest

from avlen_tpu.core.episodes import Episode, EpisodeDataset, EpisodeIterator
from avlen_tpu.utils.checkpoint import list_checkpoints, poll_checkpoint_folder, save_checkpoint


def _run_script(args, timeout=240):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "", "AVLEN_TESTS_REEXEC": "1"})
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable] + args, env=env, capture_output=True, text=True, timeout=timeout, cwd=root
    )


def test_ambisonic_to_binaural_script(tmp_path):
    ambi = np.random.RandomState(0).randn(3, 4, 200).astype(np.float32)
    inp = tmp_path / "ambi.npy"
    np.save(inp, ambi)
    out = tmp_path / "binaural"
    r = _run_script(["scripts/ambisonic_to_binaural.py", "--input", str(inp), "--output", str(out)])
    assert r.returncode == 0, r.stderr
    for angle in (0, 90, 180, 270):
        arr = np.load(out / f"{angle}.npy")
        assert arr.shape == (3, 200, 2)
    # rotation by 180° swaps the Y contribution sign: L(0) == R(180)
    b0 = np.load(out / "0.npy")
    b180 = np.load(out / "180.npy")
    np.testing.assert_allclose(b0[..., 0], b180[..., 1], atol=1e-5)


def test_generate_metadata_script(tmp_path):
    r = _run_script(["scripts/generate_metadata.py", "--output", str(tmp_path), "--scenes", "1", "--side", "5"])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "scene000" / "points.txt").exists()
    data = np.load(tmp_path / "scene000" / "scene.npz")
    assert data["positions"].shape[1] == 3
    assert data["hops"].shape[0] == data["positions"].shape[0]


def test_generate_vln_episodes_script(tmp_path):
    out = tmp_path / "dialog.json.gz"
    r = _run_script(
        ["scripts/generate_vln_episodes.py", "--output", str(out), "--episodes", "10", "--scenes", "1", "--side", "6"]
    )
    assert r.returncode == 0, r.stderr
    ds = EpisodeDataset.from_json_gz(str(out))
    assert len(ds.episodes) == 10
    assert all(e.sub_instr for e in ds.episodes)
    assert any("forward" in e.sub_instr or "turn" in e.sub_instr for e in ds.episodes)


def test_simple_agents_and_benchmark():
    from avlen_tpu.core.episodes import pack_episodes
    from avlen_tpu.sim.env import BatchedAudioNavEnv, EnvConfig
    from avlen_tpu.sim.simple_agents import GoalFollower, RandomAgent, benchmark_agent
    from avlen_tpu.sim.synthetic import make_episodes, make_scene_bank

    bank, tables = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=5, rir_length=300, sampling_rate=2000,
        with_frames=False,
    )
    eps = make_episodes(np.random.RandomState(1), tables, 12, min_hops=1, max_hops=4)
    packed = pack_episodes(eps, num_envs=3)
    env = BatchedAudioNavEnv(bank, packed, EnvConfig(max_episode_steps=20, sensors=("spectrogram", "pose")))

    oracle_stats = benchmark_agent(env, GoalFollower(), num_episodes=6)
    assert oracle_stats["success"] == 1.0
    random_stats = benchmark_agent(env, RandomAgent(), num_episodes=6)
    assert random_stats["success"] <= oracle_stats["success"]


def test_video_and_maps(tmp_path):
    from avlen_tpu.utils.maps import draw_top_down_map
    from avlen_tpu.utils.video import generate_video, write_wav

    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1]], np.float32)
    edges = np.array([[0, 1], [1, 2]])
    img = draw_top_down_map(positions, edges, agent_node=0, agent_rot=1, goal_node=2)
    assert img.shape == (256, 256, 3)
    assert (img != 255).any()

    frames = [img, img]
    audio = np.random.RandomState(0).randn(2000, 2).astype(np.float32) * 0.1
    generate_video(
        ["disk"], str(tmp_path), frames, episode_id="e1", checkpoint_idx=0,
        metrics={"spl": 0.5}, audios=audio, sampling_rate=1000, fps=2,
    )
    written = os.listdir(tmp_path)
    assert any(f.endswith((".mp4", ".gif")) for f in written)
    write_wav(str(tmp_path / "a.wav"), audio, 1000)
    assert (tmp_path / "a.wav").stat().st_size > 100


def test_preemption_state_roundtrip(tmp_path, monkeypatch):
    from avlen_tpu.utils import preemption

    monkeypatch.setattr(preemption, "INTERRUPTED_STATE_DIR", str(tmp_path))
    path = preemption.save_interrupted_state({"step": 7, "arr": np.arange(3)})
    state = preemption.load_interrupted_state()
    assert state["step"] == 7
    np.testing.assert_array_equal(state["arr"], np.arange(3))
    assert os.path.exists(path)


def test_pretraining_job_learns_category():
    from avlen_tpu.pretraining.audiogoal_predictor import train_audiogoal_predictor
    from avlen_tpu.sim.synthetic import make_scene_bank

    bank, _ = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=4, rir_length=200,
        sampling_rate=2000, num_sounds=3, with_frames=False,
    )
    _, metrics = train_audiogoal_predictor(bank, num_steps=30, batch=16, num_categories=3, log_interval=100)
    assert np.isfinite(metrics["ce"]) and np.isfinite(metrics["mse"])
    assert metrics["acc"] > 0.4  # distinct synthetic tones separate quickly


def test_episode_iterator_semantics():
    eps = [Episode(str(i), scene_id=i % 3, start_node=0, start_rot_idx=0, goal_node=1) for i in range(9)]
    ds = EpisodeDataset(eps)
    it = ds.episode_iterator(cycle=True, shuffle=True, group_by_scene=True, seed=1)
    seen = [next(it) for _ in range(9)]
    scenes = [e.scene_id for e in seen]
    # scene-grouped: each scene's episodes are contiguous
    changes = sum(1 for a, b in zip(scenes, scenes[1:]) if a != b)
    assert changes == 2
    # cycling continues past one epoch
    more = [next(it) for _ in range(3)]
    assert len(more) == 3
    # non-cycling stops
    it2 = ds.episode_iterator(cycle=False, shuffle=False, group_by_scene=False)
    assert len(list(it2)) == 9


def test_checkpoint_polling(tmp_path):
    for i in (0, 1, 2):
        save_checkpoint(str(tmp_path), f"ckpt.{i}.pth", {"i": i})
    assert len(list_checkpoints(str(tmp_path))) == 3
    nxt = poll_checkpoint_folder(str(tmp_path), 0)
    assert nxt.endswith("ckpt.1.pth")
    assert poll_checkpoint_folder(str(tmp_path), 2) is None


def test_ques_gen_vocab_and_model():
    import jax
    import jax.numpy as jnp

    from avlen_tpu.dialog.ques_gen import QuesGen, ques_out, ques_vocabulary

    vocab = ques_vocabulary()
    assert "what" in vocab.word2idx
    model = QuesGen(vocab_size=len(vocab), hidden_size=32, max_len=5)
    rgb = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    params = model.init(jax.random.key(0), rgb)
    out = ques_out(params, model, vocab, rgb)
    assert isinstance(out[0], str)
