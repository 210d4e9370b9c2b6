"""Superstep compile-once guarantee (parallel/ddppo._stable_call).

The trainers feed the jitted superstep args whose placement drifts across
updates: update 0 passes host-built (uncommitted) arrays, later updates mix
in committed leaves (donation outputs, `refresh_ep_order` device_puts).
pjit keys its executable cache on input shardings, so each distinct
signature used to trigger a full recompile — one ~60-500 s XLA compile per
update on every trainer. The builders now commit every argument to a stable
placement before the call; these tests pin that the underlying jit compiles
exactly once across placement-drifting call patterns.
"""

import contextlib
import logging

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from avlen_tpu.parallel.ddppo import make_local_superstep, make_sharded_superstep
from avlen_tpu.parallel.mesh import make_mesh


@contextlib.contextmanager
def count_xla_compiles(fn_name: str, out: list):
    """Count 'Finished XLA compilation of jit(<fn_name>)' log events —
    the expensive thing; pjit's fastpath cache may hold more entries that
    share one executable."""

    class Counter(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "Finished XLA compilation" in msg and f"jit({fn_name})" in msg:
                out.append(msg)

    handler = Counter()
    logger = logging.getLogger("jax._src.dispatch")
    prev_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)
    prev_flag = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    try:
        yield out
    finally:
        jax.config.update("jax_log_compiles", prev_flag)
        logger.removeHandler(handler)
        logger.setLevel(prev_level)


def _mini_parts():
    """Minimal (collect, update) pair over a NamedTuple-free dict carry."""
    from typing import NamedTuple

    class Carry(NamedTuple):
        key: jax.Array
        masks: jax.Array
        obs: jax.Array

    def collect(train_state, carry):
        params = train_state[0]
        batch = {"x": carry.obs @ params["w"], "masks": carry.masks}
        return carry._replace(obs=carry.obs + 1.0), batch

    def update(train_state, batch, key, grad_reduce):
        params, opt = train_state
        g = grad_reduce({"w": jnp.ones_like(params["w"]) * batch["x"].mean()})
        params = {"w": params["w"] - 0.01 * g["w"]}
        return (params, opt), {"loss": batch["x"].mean()}

    def fresh_inputs():
        # host-built numpy → uncommitted args, as the trainers produce at setup
        params = {"w": np.ones((3, 3), np.float32)}
        opt = np.zeros((1,), np.float32)
        carry = Carry(
            key=jax.random.key(0),
            masks=np.ones((4,), np.float32),
            obs=np.zeros((4, 3), np.float32),
        )
        return (params, opt), carry

    return collect, update, fresh_inputs


def test_local_superstep_compiles_once_across_placement_drift():
    collect, update, fresh = _mini_parts()
    step = make_local_superstep(collect, update, donate=True)
    ts, carry = fresh()
    key = jax.random.key(1)

    with count_xla_compiles("local_step", []) as compiles:
        # update 0: uncommitted host args
        ts, carry, batch, stats = step(ts, carry, key)
        # update 1: device outputs, but one leaf re-committed host-side
        # (the refresh_ep_order pattern)
        carry = carry._replace(
            obs=jax.device_put(np.asarray(carry.obs), carry.obs.sharding)
        )
        ts, carry, batch, stats = step(ts, carry, key)
        # update 2: pure device outputs
        ts, carry, batch, stats = step(ts, carry, key)
        jax.block_until_ready(stats["loss"])

    assert len(compiles) == 1, compiles


def test_sharded_superstep_compiles_once_across_placement_drift():
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    mesh = make_mesh(("data",), (2,), jax.devices()[:2])
    collect, update, fresh = _mini_parts()
    ts, carry = fresh()
    step, carry_spec = make_sharded_superstep(
        collect, update, ts, jax.tree.map(jnp.asarray, carry), mesh,
        num_steps=1, donate=True,
    )
    key = jax.random.key(1)

    with count_xla_compiles("body", []) as compiles:
        ts, carry, batch, stats = step(ts, carry, key)
        carry = carry._replace(masks=np.ones((4,), np.float32))  # host leaf again
        ts, carry, batch, stats = step(ts, carry, key)
        ts, carry, batch, stats = step(ts, carry, key)
        jax.block_until_ready(stats["loss"])

    assert len(compiles) == 1, compiles
