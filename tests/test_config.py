"""Config system tests: yacs-equivalent merge/freeze/override semantics
(reference behavior: ss_baselines/savi/config/default.py:298-369 and
habitat-lab-dialog/test/test_config.py)."""

import pytest

from avlen_tpu.config import CN, get_config, get_task_config


def test_attribute_access_and_nesting():
    c = CN({"A": 1, "B": {"C": "x"}})
    assert c.A == 1
    assert c.B.C == "x"


def test_freeze_blocks_mutation():
    c = CN({"A": 1})
    c.freeze()
    with pytest.raises(AttributeError):
        c.A = 2
    c.defrost()
    c.A = 2
    assert c.A == 2


def test_merge_from_list_type_coercion():
    cfg = get_config()
    cfg.defrost()
    cfg.merge_from_list(["RL.PPO.lr", "1e-4", "NUM_UPDATES", "5", "USE_VECENV", "False"])
    assert cfg.RL.PPO.lr == pytest.approx(1e-4)
    assert cfg.NUM_UPDATES == 5
    assert cfg.USE_VECENV is False


def test_merge_from_list_rejects_unknown_key():
    cfg = get_config()
    cfg.defrost()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NO.SUCH.KEY", "1"])


def test_yaml_merge(tmp_path):
    yaml_path = tmp_path / "exp.yaml"
    yaml_path.write_text("TRAINER_NAME: savi\nRL:\n  PPO:\n    hidden_size: 256\n")
    cfg = get_config(str(yaml_path))
    assert cfg.TRAINER_NAME == "savi"
    assert cfg.RL.PPO.hidden_size == 256
    # untouched defaults survive
    assert cfg.RL.PPO.clip_param == 0.2


def test_model_dir_path_derivation(tmp_path):
    cfg = get_config(model_dir=str(tmp_path / "run1"))
    assert cfg.TENSORBOARD_DIR.endswith("run1/tb")
    assert cfg.CHECKPOINT_FOLDER.endswith("run1/data")
    assert cfg.LOG_FILE.endswith("run1/train.log")


def test_eval_overrides():
    cfg = get_config(run_type="eval")
    assert cfg.NUM_PROCESSES == 10
    assert cfg.TEST_EPISODE_COUNT == 500  # val split default
    assert cfg.USE_SYNC_VECENV is True


def test_task_config_defaults():
    tc = get_task_config()
    assert tc.SIMULATOR.AUDIO.RIR_SAMPLING_RATE == 44100
    assert tc.TASK.POSSIBLE_ACTIONS == ["STOP", "MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"]
    assert tc.is_frozen()


def test_clone_is_independent():
    cfg = get_config()
    c2 = cfg.clone()
    c2.SEED = 99
    assert cfg.SEED == 0
