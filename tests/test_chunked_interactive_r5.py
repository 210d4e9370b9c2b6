"""Chunk-aware interactive / avnav training (VERDICT r4 #2): the flagship
AVLEN trainer (π_g / π_l / π_q + speaker) trains at real-Matterport scale on
io_callback-less backends by driving BOTH host streams — mmap RIRs AND
speaker instruction tokens — through the chunk-boundary prefetch machinery
(data/host_prefetch.py, dialog/instr_prefetch.py, parallel/chunked.py).

Reference cost replaced: per-step `wavfile.read`+`fftconvolve`
(soundspaces/simulator.py:652-699) + the per-query speaker invocation
(ss_baselines/savi/ppo/ppo_trainer.py:549-562).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "reference_tree")
DATA_PATH = os.path.join(ROOT, "datasets", "semantic_audionav", "v1", "train", "train.json.gz")


@pytest.fixture(scope="module", autouse=True)
def ensure_fixtures():
    if not os.path.exists(os.path.join(ROOT, "metadata", "mp3d", "sceneA")):
        from tests.data.make_reference_fixtures import main

        main(ROOT)


def _reference_opts():
    return [
        "TASK_CONFIG.DATASET.SOURCE", "reference",
        "TASK_CONFIG.DATASET.DATA_PATH", DATA_PATH,
        "TASK_CONFIG.SIMULATOR.SCENE_DATASET", "mp3d",
        "TASK_CONFIG.SIMULATOR.AUDIO.METADATA_DIR", os.path.join(ROOT, "metadata"),
        "TASK_CONFIG.SIMULATOR.AUDIO.BINAURAL_RIR_DIR", os.path.join(ROOT, "binaural_rirs"),
        "TASK_CONFIG.SIMULATOR.AUDIO.SOURCE_SOUND_DIR", os.path.join(ROOT, "sounds", "1s_all"),
        "TASK_CONFIG.SIMULATOR.SCENE_OBSERVATION_DIR", os.path.join(ROOT, "scene_observations"),
        "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "4000",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "10",
        "NUM_PROCESSES", "2",
        "NUM_UPDATES", "2",
        "LOG_INTERVAL", "1",
        "CHECKPOINT_INTERVAL", "1000000",
        "RL.PPO.num_steps", "8",
        "RL.PPO.num_mini_batch", "1",
        "RL.PPO.ppo_epoch", "1",
        "RL.PPO.hidden_size", "32",
    ]


_PREFETCH = [
    "TASK_CONFIG.SIMULATOR.AUDIO.DENSE_RIR_MAX_BYTES", "0",
    "TASK_CONFIG.SIMULATOR.AUDIO.CACHE_SPECTROGRAMS", "False",
    "TASK_CONFIG.SIMULATOR.AUDIO.RIR_CACHE_SLOTS", "512",
    "TPU.HOST_PREFETCH", "on",
    "TPU.ROLLOUT_CHUNK", "4",
]

_INTERACTIVE = [
    "TRAINER_NAME", "ddppo",
    "RL.PPO.policy_type", "interactive",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.hidden_size", "32",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.memory_size", "2",
    "RL.PPO.SCENE_MEMORY_TRANSFORMER.nhead", "2",
    "RL.PPO.CLIP_WIDTH", "32",
    "RL.PPO.CLIP_LAYERS", "1",
    "RL.PPO.use_belief_predictor", "False",
    "NUM_DIALOG_STEPS", "2",
    # the chunked-prefetch instruction source, forced so CI exercises the
    # real-scale route even though XLA:CPU supports callbacks
    "SPEAKER.BANK_MODE", "cached",
]


def _config(extra=(), tmp_path=None):
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config

    cfg = get_config(opts=_reference_opts() + list(extra),
                     model_dir=str(tmp_path) if tmp_path else None)
    return cfg


def test_interactive_trains_from_reference_tree_via_host_prefetch(tmp_path):
    """The VERDICT r4 #2 'done' bar: the FULL interactive trainer trains from
    the reference fixture tree with the dense-bank threshold forced to 0 —
    every RIR *and* every oracle instruction reaches the device through the
    chunk-boundary prefetch caches; no io_callback, no O(N²) bank."""
    from avlen_tpu.core.registry import registry
    from avlen_tpu.data.host_prefetch import AssocRIRCache
    from avlen_tpu.dialog.instr_prefetch import CachedInstrSource

    cfg = _config(_PREFETCH + _INTERACTIVE, tmp_path)
    trainer = registry.get_trainer("ddppo")(cfg)
    trainer.ensure_setup()
    assert isinstance(trainer.env.bank.rir, AssocRIRCache)
    assert trainer.env.host_prefetcher is not None
    assert trainer._chunked is not None and trainer._chunk_len == 4
    assert trainer.instr_bank is None, "O(N^2) bank must not be materialized"
    assert isinstance(trainer.instr_source, CachedInstrSource)
    assert trainer.instr_prefetcher is not None
    trainer.train()
    assert trainer.num_updates_done == 2
    for leaf in jax.tree.leaves(trainer.params_option):
        assert np.isfinite(np.asarray(leaf)).all()
    # both host streams actually served data
    assert trainer.env.host_prefetcher.uploaded_entries > 0
    assert trainer.instr_prefetcher.uploaded_entries > 0


def test_cached_instr_tokens_match_host_speaker(tmp_path):
    """Exactness: tokens gathered from the prefetched AssocInstrCache are
    bit-identical to direct host-speaker invocations for every (node, rot,
    goal) in the planned ball — the cache is a transport, not an approximation."""
    from avlen_tpu.core.registry import registry

    cfg = _config(_PREFETCH + _INTERACTIVE, tmp_path)
    trainer = registry.get_trainer("ddppo")(cfg)
    trainer.ensure_setup()
    pf = trainer.instr_prefetcher
    # plan + upload the standing ball around every env's current state; the
    # prefetcher's host mirror is stateful, so extend the collector's LIVE
    # cache (primed at setup) rather than a fresh one
    from avlen_tpu.data.host_prefetch import env_state_to_host

    host_st = env_state_to_host(trainer.carry.env_state)
    keys = pf.plan(host_st, 4)
    cache = pf.ensure(trainer._chunked.instr_cache, keys)
    keys = np.asarray(sorted(pf.key_to_slot), np.int64)  # everything cached
    scene, rot, node, goal = pf._unpack(keys)
    got = np.asarray(
        cache.gather(
            jnp.asarray(scene, jnp.int32), jnp.asarray(rot, jnp.int32),
            jnp.asarray(node, jnp.int32), jnp.asarray(goal, jnp.int32),
        )
    )
    want = pf._fetch(scene, rot, node, goal)
    np.testing.assert_array_equal(got, want)
    assert (np.abs(want).sum(axis=1) > 0).any(), "speaker produced only empty rows"


def test_dialog_pretraining_trains_via_host_prefetch(tmp_path):
    """π_l dialog pretraining (oracle windows) on the chunked path: the
    oracle instruction tokens consumed at window starts come through the
    prefetch cache; dataset sub_instr rows (when present) bypass it."""
    from avlen_tpu.core.registry import registry

    cfg = _config(
        _PREFETCH + _INTERACTIVE + [
            "DIALOG_TRAINING", "True",
            "NUM_UPDATES_DIALOG", "2",
            "CHECKPOINT_INTERVAL_DIALOG", "1000000",
        ],
        tmp_path,
    )
    trainer = registry.get_trainer("ddppo")(cfg)
    trainer.ensure_setup()
    assert trainer._chunked is not None
    trainer.train()
    assert trainer.num_updates_done == 2
    for leaf in jax.tree.leaves(trainer.params_dialog):
        assert np.isfinite(np.asarray(leaf)).all()
    assert trainer.instr_prefetcher.uploaded_entries > 0


def test_avnav_trains_from_reference_tree_via_host_prefetch(tmp_path):
    """The av_nav stack on the chunked audio path (no instruction stream)."""
    from avlen_tpu.core.registry import registry

    cfg = _config(
        _PREFETCH + ["TRAINER_NAME", "AVNavTrainer"], tmp_path
    )
    trainer = registry.get_trainer("AVNavTrainer")(cfg)
    trainer.ensure_setup()
    assert trainer._chunked is not None
    trainer.train()
    assert trainer.num_updates_done == 2
    for leaf in jax.tree.leaves(trainer.params):
        assert np.isfinite(np.asarray(leaf)).all()
    assert trainer.env.host_prefetcher.uploaded_entries > 0


def test_avwan_still_guarded_loudly(tmp_path):
    """avwan's planner substeps are not chunk-radius mapped yet — it must
    fail loudly on the host-prefetch path, never render silence."""
    from avlen_tpu.core.registry import registry

    cfg = _config(_PREFETCH + ["TRAINER_NAME", "AVWanTrainer"], tmp_path)
    trainer = registry.get_trainer("AVWanTrainer")(cfg)
    with pytest.raises(NotImplementedError, match="chunked"):
        trainer.ensure_setup()
