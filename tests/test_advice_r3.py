"""Regression tests for round-2 advisor findings (ADVICE.md round 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from avlen_tpu.sim.scene import DenseRIRBank, ProceduralRIRBank, SceneBank


def _tiny_bank_with_dense_rirs():
    rirs = np.zeros((1, 4, 3, 3, 8, 2), np.float32)
    tables = {
        "positions": jnp.zeros((1, 3, 3), jnp.float32),
        "hops": jnp.zeros((1, 3, 3), jnp.int32),
    }
    return SceneBank(
        tables=tables,
        sounds_padded=jnp.zeros((1, 32), jnp.float32),
        sound_secs=jnp.ones((1,), jnp.int32),
        rir=DenseRIRBank(rirs),
    )


def test_dense_rir_bank_unflatten_accepts_non_array_leaves():
    """jax.tree.map(lambda _: P(), bank) must not crash when the bank holds a
    DenseRIRBank — the sharding-spec map in parallel/ddppo.py does exactly
    this for reference/MP3D RIR data (advisor medium finding)."""
    bank = _tiny_bank_with_dense_rirs()
    specs = jax.tree.map(lambda _: P(), bank)
    leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert leaves and all(isinstance(leaf, P) for leaf in leaves)

    # None-leaves (e.g. eval_shape placeholders) must round-trip too
    flat, treedef = jax.tree.flatten(bank)
    rebuilt = jax.tree.unflatten(treedef, [None] * len(flat))
    assert isinstance(rebuilt.rir, DenseRIRBank)


def test_dense_rir_bank_survives_jit_boundary():
    bank = _tiny_bank_with_dense_rirs()

    @jax.jit
    def f(b):
        return b.rir.gather(
            jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
        )

    out = f(bank)
    assert out.shape == (2, 8, 2)


def test_merge_matching_params_preserves_target_dtype():
    from avlen_tpu.utils.checkpoint import merge_matching_params

    target = {"w": jnp.zeros((3, 2), jnp.bfloat16), "b": jnp.zeros((2,), jnp.float32)}
    source = {"w": np.ones((3, 2), np.float32), "b": np.ones((2,), np.float32)}
    merged, copied, skipped = merge_matching_params(target, source)
    assert merged["w"].dtype == jnp.bfloat16
    assert merged["b"].dtype == jnp.float32
    assert np.asarray(merged["w"], np.float32).sum() == 6.0
    assert len(copied) == 2 and not skipped


def test_clip_tokenize_strict_mode_raises_on_overflow():
    from avlen_tpu.models.clip_bpe import default_tokenizer

    tok = default_tokenizer()
    long_text = "walk past the couch and turn left " * 30
    out = tok.tokenize([long_text])  # default truncates
    assert out.shape == (1, 77)
    with pytest.raises(RuntimeError):
        tok.tokenize([long_text], truncate=False)


def test_vp_shortest_path_truncation_not_reported_as_success():
    from avlen_tpu.native.graph_engine import GraphEngine

    # a 6-node chain: path 0→5 has 6 nodes; max_len=3 truncates
    n = 6
    positions = np.stack(
        [np.arange(n, dtype=np.float32), np.zeros(n, np.float32), np.zeros(n, np.float32)],
        axis=1,
    )
    edges = np.array([[i, i + 1] for i in range(n - 1)], np.int32)
    eng = GraphEngine()
    sid = eng.add_scene_viewpoint(positions, edges)
    full = eng.vp_shortest_path(sid, 0, n - 1)
    assert full == list(range(n))
    truncated = eng.vp_shortest_path(sid, 0, n - 1, max_len=3)
    assert truncated == []  # sentinel, not a silent 3-node "success"


def test_missing_pretrained_path_raises():
    import avlen_tpu.rl.trainers  # noqa: F401
    from avlen_tpu.config import get_config
    from avlen_tpu.core.registry import registry

    cfg = get_config(
        opts=[
            "TASK_CONFIG.DATASET.SYNTHETIC.SIDE", "3",
            "TASK_CONFIG.DATASET.SYNTHETIC.RIR_LENGTH", "200",
            "TASK_CONFIG.DATASET.SYNTHETIC.FRAME_RES", "16",
            "TASK_CONFIG.SIMULATOR.AUDIO.RIR_SAMPLING_RATE", "2000",
            "NUM_PROCESSES", "1",
            "TRAINER_NAME", "savi",
            "RL.DDPPO.pretrained", "True",
            "RL.DDPPO.pretrained_weights", "/nonexistent/ckpt.pth",
        ],
        model_dir="/tmp/avlen_test_missing_ckpt",
    )
    trainer = registry.get_trainer("savi")(cfg)
    with pytest.raises(FileNotFoundError):
        trainer.ensure_setup()
