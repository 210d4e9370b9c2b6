"""Fused SMT-encode Pallas kernel (VERDICT r4 #3): numerics of
ops/pallas_smt.smt_encode (and its pure-JAX mirror smt_encode_ref) against
the Flax SMTStateEncoder module, with and without a decoder goal query,
under masking and padding; gradients flow through the custom-vjp backward.

Reference cost beaten: the 3-forwards-per-step SMT hot loop
(ss_baselines/savi/ppo/ppo_trainer.py:323-897, smt_state_encoder.py:109-188).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avlen_tpu.models.smt import SMTStateEncoder
from avlen_tpu.ops.pallas_smt import smt_encode, smt_encode_ref

B, M, F, D, H = 5, 13, 24, 32, 4  # deliberately unaligned B/M/F


def _setup(goal=False, pose=False, pretraining=False, seed=0):
    rng = np.random.RandomState(seed)
    module = SMTStateEncoder(
        input_size=F, d_model=D, nhead=H,
        pose_indices=(F - 4, F) if pose else None,
        pretraining=pretraining,
    )
    x = jnp.asarray(rng.randn(B, F), jnp.float32)
    memory = jnp.asarray(rng.randn(B, M, F), jnp.float32)
    masks = jnp.asarray(rng.rand(B, M) > 0.4, jnp.float32)
    g = jnp.asarray(rng.randn(B, D), jnp.float32) if goal else None
    params = module.init(jax.random.key(seed), x, memory, masks, g)["params"]
    return module, params, x, memory, masks, g


def _entries_valid(params, x, memory, masks, pretraining=False):
    """The module's pre-transformer stitching (no pose encode here)."""
    b = x.shape[0]
    mm = jnp.zeros_like(masks) if pretraining else masks
    valid = jnp.concatenate([mm, jnp.ones((b, 1), mm.dtype)], axis=1)
    entries = jnp.concatenate([memory, x[:, None, :]], axis=1)
    return entries, valid


@pytest.mark.parametrize("goal", [False, True])
def test_ref_matches_module(goal):
    module, params, x, memory, masks, g = _setup(goal=goal)
    want = module.apply({"params": params}, x, memory, masks, g)
    entries, valid = _entries_valid(params, x, memory, masks)
    got = smt_encode_ref(params, entries, valid, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("goal", [False, True])
def test_fused_matches_module(goal):
    module, params, x, memory, masks, g = _setup(goal=goal, seed=1)
    want = module.apply({"params": params}, x, memory, masks, g)
    entries, valid = _entries_valid(params, x, memory, masks)
    got = smt_encode(params, entries, valid, g, H, 2, jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_grads_match_module_grads():
    module, params, x, memory, masks, g = _setup(goal=True, seed=2)

    def loss_module(p):
        return jnp.sum(module.apply({"params": p}, x, memory, masks, g) ** 2)

    def loss_fused(p):
        entries, valid = _entries_valid(p, x, memory, masks)
        out = smt_encode(p, entries, valid, g, H, 2, jax.default_backend() != "tpu")
        return jnp.sum(out**2)

    g_mod = jax.grad(loss_module)(params)
    g_fus = jax.grad(loss_fused)(params)
    # the fused path does not touch pose params here; compare the rest
    flat_m = jax.tree_util.tree_flatten_with_path(g_mod)[0]
    flat_f = {tuple(map(str, p)): v for p, v in jax.tree_util.tree_flatten_with_path(g_fus)[0]}
    for path, vm in flat_m:
        key = tuple(map(str, path))
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(vm), atol=5e-4, rtol=1e-3,
            err_msg=str(key),
        )


def test_module_fused_flag_is_dropin():
    """SMTStateEncoder(fused=True) must produce the module's numbers with the
    module's param tree — the integration point the policies flip on."""
    module, params, x, memory, masks, g = _setup(goal=True, pose=True, seed=3)
    fused_mod = SMTStateEncoder(
        input_size=F, d_model=D, nhead=H, pose_indices=(F - 4, F), fused=True
    )
    want = module.apply({"params": params}, x, memory, masks, g)
    got = fused_mod.apply({"params": params}, x, memory, masks, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_module_fused_flag_pretraining():
    module, params, x, memory, masks, g = _setup(pretraining=True, seed=4)
    fused_mod = SMTStateEncoder(input_size=F, d_model=D, nhead=H, pretraining=True, fused=True)
    want = module.apply({"params": params}, x, memory, masks, None)
    got = fused_mod.apply({"params": params}, x, memory, masks, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
