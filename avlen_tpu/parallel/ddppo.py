"""DD-PPO as one SPMD program over a device mesh.

The reference's decentralized distributed PPO (ss_baselines/savi/ddppo/algo/
ddppo.py:49-100: torch DDP gradient buckets; ddppo_trainer.py:515-1200:
per-GPU processes, TCPStore rollout counters, straggler preemption at
sync_frac=0.6) re-designed for TPUs: every chip runs the SAME jitted
(rollout → GAE → PPO) superstep on its shard of env slots under `shard_map`,
and gradient sync is a `lax.pmean` inside each minibatch step — the moral
equivalent of DDP's bucketed allreduce, but compiled into the XLA program on
ICI. SPMD synchrony makes straggler preemption moot: all chips step the
batched env in lockstep, so there is no slow worker to wait for.

``make_sharded_superstep`` is the generic entry point used by the SAVi and
interactive trainers (any carry NamedTuple with ``key``/``masks`` fields);
``make_ddppo_step`` specializes it to the GRU (av-nav) stack.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import contextlib

from avlen_tpu.rl.gae import compute_gae
from avlen_tpu.rl.ppo import PPOConfig, ppo_update
from avlen_tpu.rl.rollout import CarryState, RolloutBatch, collect_rollout


def _bound(binder, consts):
    """binder.bind(consts) when a binder is in play, else a no-op context."""
    return binder.bind(consts) if binder is not None else contextlib.nullcontext()


def _buffer_key(x: jax.Array):
    """Identity of the underlying device buffer(s), not the Array object:
    device_put no-ops and output aliasing can hand back DISTINCT Array
    objects sharing one buffer, which id() cannot see."""
    try:
        return tuple(
            s.data.unsafe_buffer_pointer() for s in x.addressable_shards
        )
    except Exception:
        return id(x)


def _dedupe_buffers(tree):
    """Copy repeated buffers so a donated pytree holds each device buffer at
    most once (XLA rejects donating the same buffer twice; freshly-built
    carries sometimes share a zeros array across leaves). After the first
    superstep the outputs are distinct buffers, so this is a no-op."""
    seen = set()

    def f(x):
        if isinstance(x, jax.Array):
            k = _buffer_key(x)
            if k in seen:
                return jnp.copy(x)
            seen.add(k)
        return x

    return jax.tree.map(f, tree)


def _donating(step_fn):
    """Wrap a carry-donating jitted superstep with input dedupe."""

    def wrapped(train_state, carry, key, consts=None):
        return step_fn(train_state, _dedupe_buffers(carry), key, consts)

    wrapped._jitted = step_fn  # AOT lower/compile access (bench.py)
    return wrapped


def _stable_call(jitted, put, donate: bool):
    """Commit every superstep argument to its target placement before the
    jitted call so the input-sharding signature is IDENTICAL across updates.

    Without this, update 0 passes host-built (uncommitted) args, update 1
    mixes in the committed leaf `refresh_ep_order` device_puts, and update 2
    passes the fully-committed donation outputs — three distinct sharding
    signatures, and pjit recompiles the superstep for each (observed: one
    ~60-500 s XLA compile per update on every trainer). ``put`` device_puts
    the (train_state, carry, key, consts) tuple; device_put is a no-op for
    leaves already placed, so steady-state overhead is one tree traversal."""

    def wrapped(train_state, carry, key, consts=None):
        # dedupe BEFORE the puts: device_put may return a fresh Array object
        # for an already-placed leaf, so two identical-object leaves can turn
        # into distinct objects sharing one buffer — invisible to the
        # id-based dedupe, and XLA rejects donating one buffer twice
        if donate:
            carry = _dedupe_buffers(carry)
        train_state, carry, key, consts = put(train_state, carry, key, consts)
        return jitted(train_state, carry, key, consts)

    wrapped._jitted = jitted  # AOT lower/compile access (bench.py)
    return wrapped


def _leaf_spec(shape: Tuple[int, ...], num_envs: int, num_steps: Optional[int], axis: str):
    if (
        num_steps is not None
        and len(shape) >= 2
        and shape[0] == num_steps
        and shape[1] == num_envs
    ):
        return P(None, axis)  # time-major rollout tensor (T, B, ...)
    if len(shape) >= 1 and shape[0] == num_envs:
        return P(axis)  # env-leading state tensor (B, ...)
    return P()


def infer_env_specs(tree, num_envs: int, axis: str = "data", num_steps: Optional[int] = None):
    """PartitionSpecs for a carry/rollout pytree: leaves with a leading env
    dimension shard over ``axis``; (T, B, ...) time-major leaves shard on
    their env dim; everything else (scalars, RNG keys) replicates. Matching
    is by shape, so carry/batch trees must not contain unrelated leaves whose
    leading dims coincide with ``num_envs``/``num_steps``."""

    def spec(x):
        shape = getattr(x, "shape", None)
        if shape is None:
            return P()
        return _leaf_spec(tuple(shape), num_envs, num_steps, axis)

    return jax.tree.map(spec, tree)


def make_sharded_superstep(
    collect: Callable,  # (train_state, carry) -> (carry, batch); per-env pure, no collectives
    update: Callable,  # (train_state, batch, key, grad_reduce) -> (train_state, stats)
    train_state_example,
    carry_example,  # NamedTuple with .masks (B,) and .key fields
    mesh: Mesh,
    num_steps: int,
    axis: str = "data",
    binder=None,  # utils/hoist.ConstBinder holding the asset banks
    donate: bool = False,  # donate the carry buffers (TPU.DONATE_ROLLOUTS)
):
    """Compile (rollout → update) into one SPMD program over ``mesh``.

    Env state/obs/memories shard over their env dimension; params and
    optimizer states replicate; ``update`` receives ``grad_reduce`` =
    ``lax.pmean`` over the mesh axis (DDP-equivalent gradient sync,
    ss_baselines/savi/ddppo/algo/ddppo.py:61-97). Per-shard RNG is
    decorrelated by folding in the axis index, then split into independent
    rollout and update streams.

    Returns ``(step_fn, carry_spec)`` where ``step_fn(train_state, carry,
    key, consts) -> (train_state, carry, batch, stats)`` is jitted and
    ``carry_spec`` is the carry's PartitionSpec tree (for `shard_pytree`).
    ``consts`` is ``binder.arrays`` — the asset banks enter the program as
    replicated runtime arguments, never as HLO literals (utils/hoist.py).
    """
    num_envs = int(carry_example.masks.shape[0])
    per_axis = int(mesh.shape[axis])
    if num_envs % per_axis != 0:
        raise ValueError(
            f"num_envs={num_envs} not divisible by mesh axis {axis!r} size {per_axis}"
        )
    carry_spec = infer_env_specs(carry_example, num_envs, axis)
    _, batch_struct = jax.eval_shape(collect, train_state_example, carry_example)
    batch_spec = infer_env_specs(batch_struct, num_envs, axis, num_steps=num_steps)

    def body(train_state, carry, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        rollout_key, update_key = jax.random.split(key)
        carry = carry._replace(key=rollout_key)
        carry, batch = collect(train_state, carry)
        train_state, stats = update(
            train_state, batch, update_key, lambda g: jax.lax.pmean(g, axis)
        )
        stats = jax.tree.map(lambda v: jax.lax.pmean(v, axis), stats)
        return train_state, carry, batch, stats

    # the carry is pure rollout state (env state, obs, memories, RNG) and a
    # fresh one is returned every step, so its buffers can be donated —
    # in-place reuse instead of a copy per superstep (TPU.DONATE_ROLLOUTS)
    donate_kw = {"donate_argnums": (1,)} if donate else {}

    if binder is None:
        step = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), carry_spec, P()),
            out_specs=(P(), carry_spec, batch_spec, P()),
            check_vma=False,
        )
        jitted3 = jax.jit(step, **donate_kw)
        rep0 = NamedSharding(mesh, P())

        def wrapped(train_state, carry, key):
            if donate:  # before the puts — see _stable_call
                carry = _dedupe_buffers(carry)
            train_state = jax.device_put(train_state, rep0)
            key = jax.device_put(key, rep0)
            carry = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), carry, carry_spec
            )
            return jitted3(train_state, carry, key)

        wrapped._jitted = jitted3
        return wrapped, carry_spec

    consts_spec = jax.tree.map(lambda _: P(), binder.arrays)

    def local_step(train_state, carry, key, consts):
        with binder.bind(consts):
            return body(train_state, carry, key)

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), carry_spec, P(), consts_spec),
        out_specs=(P(), carry_spec, batch_spec, P()),
        check_vma=False,
    )
    jitted = jax.jit(step, **donate_kw)

    rep = NamedSharding(mesh, P())

    def put(train_state, carry, key, consts):
        carry = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), carry, carry_spec
        )
        return (
            jax.device_put(train_state, rep),
            carry,
            jax.device_put(key, rep),
            consts if consts is None else jax.device_put(consts, rep),
        )

    return _stable_call(jitted, put, donate), carry_spec


def make_local_superstep(collect: Callable, update: Callable, binder=None, donate: bool = False):
    """Single-device analogue of `make_sharded_superstep` with identical
    semantics and signature (identity grad_reduce, same RNG split)."""

    def local_step(train_state, carry, key, consts=None):
        with _bound(binder, consts):
            rollout_key, update_key = jax.random.split(key)
            carry = carry._replace(key=rollout_key)
            carry, batch = collect(train_state, carry)
            train_state, stats = update(train_state, batch, update_key, lambda g: g)
            return train_state, carry, batch, stats

    donate_kw = {"donate_argnums": (1,)} if donate else {}
    jitted = jax.jit(local_step, **donate_kw)
    dev = jax.devices()[0]

    def put(train_state, carry, key, consts):
        return jax.device_put((train_state, carry, key, consts), dev)

    return _stable_call(jitted, put, donate)


def shard_pytree(tree, spec_tree, mesh: Mesh):
    """Place a host-built pytree onto the mesh according to its spec tree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec_tree
    )


class DDPPOStep(NamedTuple):
    step_fn: Callable  # (params, opt_state, carry, key, consts) -> (params, opt_state, carry, batch, stats)
    mesh: Mesh


def make_ddppo_step(
    env_step: Callable,
    policy_act: Callable,  # (params, obs, h, m, key) -> (a, lp, v, h, logits)
    policy_value: Callable,  # (params, obs, h, m) -> v
    evaluate_actions: Callable,  # (params, obs, h0, masks, actions) -> (v, lp, ent, logits)
    optimizer,
    ppo_cfg: PPOConfig,
    num_steps: int,
    mesh: Mesh,
    carry_example: CarryState,
    params_example,
    opt_example,
    axis: str = "data",
    binder=None,
    donate: bool = False,
) -> DDPPOStep:
    """The GRU (av-nav style) stack on top of `make_sharded_superstep`."""

    def collect(train_state, carry: CarryState):
        params, _ = train_state

        def pol(obs, h, m, k):
            return policy_act(params, obs, h, m, k)

        def val(obs, h, m):
            return policy_value(params, obs, h, m)

        return collect_rollout(env_step, pol, val, carry, num_steps)

    def update(train_state, batch: RolloutBatch, key, grad_reduce):
        params, opt_state = train_state
        adv, ret = compute_gae(
            batch.rewards,
            batch.values,
            batch.bootstrap_value,
            1.0 - batch.dones.astype(jnp.float32),
            ppo_cfg.gamma,
            ppo_cfg.tau,
        )
        params, opt_state, stats = ppo_update(
            params, opt_state, batch, adv, ret, key, evaluate_actions,
            optimizer, ppo_cfg, grad_reduce=grad_reduce,
        )
        return (params, opt_state), stats

    sharded, _carry_spec = make_sharded_superstep(
        collect, update, (params_example, opt_example), carry_example,
        mesh, num_steps, axis, binder=binder, donate=donate,
    )

    def step_fn(params, opt_state, carry, key, consts=None):
        (params, opt_state), carry, batch, stats = sharded(
            (params, opt_state), carry, key, consts
        )
        return params, opt_state, carry, batch, stats

    return DDPPOStep(step_fn=step_fn, mesh=mesh)


def shard_carry(carry: CarryState, mesh: Mesh, axis: str = "data") -> CarryState:
    """Place a host-built carry onto the mesh with env-dim sharding."""
    num_envs = int(carry.masks.shape[0])
    return shard_pytree(carry, infer_env_specs(carry, num_envs, axis), mesh)
