"""Benchmark/Challenge evaluation protocol (soundspaces/benchmark.py:26-170,
challenge.py:17-26): local episode-loop eval, and the remote habitat-challenge
RPC surface served + consumed over gRPC generic handlers."""

import numpy as np
import pytest

from avlen_tpu.config import get_config
from avlen_tpu.core.challenge import (
    Benchmark,
    Challenge,
    EvaluationServer,
    pack_package,
    unpack_package,
)

TINY = [
    "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "5",
    "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "400",
    "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "32",
    "TASK_CONFIG.DATASET.SYNTHETIC.NUM_EPISODES", "12",
    "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "4000",
    "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "8",
]


class ForwardAgent:
    """Deterministic: always MOVE_FORWARD; episodes end at the step cap or
    upon reaching the goal region."""

    def reset(self):
        pass

    def act(self, observations):
        assert isinstance(observations, dict) and "spectrogram" in observations
        assert observations["spectrogram"].ndim == 3  # unbatched, single-env
        return 1


def test_package_codec_roundtrip():
    payload = b"hello \x00 proto"
    msg = pack_package(payload)
    # proto3 wire format: tag (field 1, wire type 2), varint length, bytes
    assert msg[0] == 0x0A and msg[1] == len(payload)
    assert unpack_package(msg) == payload
    # empty payload serializes to the empty message (proto3 default field)
    assert pack_package(b"") == b""
    assert unpack_package(b"") == b""
    big = bytes(300)
    assert unpack_package(pack_package(big)) == big


def test_local_evaluate_averages_metrics(tmp_path):
    cfg = get_config(opts=TINY, model_dir=str(tmp_path))
    bench = Benchmark(config=cfg)
    metrics = bench.evaluate(ForwardAgent(), num_episodes=3)
    for key in ("success", "spl"):
        assert key in metrics
    assert all(np.isfinite(v) for v in metrics.values())


def test_remote_evaluate_matches_local(tmp_path, monkeypatch):
    cfg = get_config(opts=TINY, model_dir=str(tmp_path))
    server = EvaluationServer(cfg, port=0, num_episodes=3).start()
    try:
        monkeypatch.setenv("EVALENV_ADDPORT", f"localhost:{server.port}")
        remote = Benchmark(eval_remote=True).evaluate(ForwardAgent())
        assert server._submitted  # evalai_update_submission RPC arrived
    finally:
        server.stop(0)
    local = Benchmark(config=cfg).evaluate(ForwardAgent(), num_episodes=3)
    assert set(remote) == set(local)
    for k in local:
        assert remote[k] == pytest.approx(local[k]), k


def test_challenge_reads_config_env_var(tmp_path, monkeypatch):
    # a TASK config, as the reference's Challenge expects (challenge.py:19
    # → benchmark.py:37 get_task_config)
    cfg_yaml = tmp_path / "challenge.yaml"
    cfg_yaml.write_text(
        "DATASET:\n  SYNTHETIC:\n    SIDE: 5\n"
        "    RIR_LENGTH: 400\n    FRAME_RES: 32\n    NUM_EPISODES: 12\n"
        "SIMULATOR:\n  AUDIO:\n    RIR_SAMPLING_RATE: 4000\n"
        "ENVIRONMENT:\n  MAX_EPISODE_STEPS: 8\n"
    )
    monkeypatch.setenv("CHALLENGE_CONFIG_FILE", str(cfg_yaml))
    challenge = Challenge()
    metrics = challenge.submit(ForwardAgent())
    assert "success" in metrics
