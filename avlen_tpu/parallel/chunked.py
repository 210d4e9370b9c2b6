"""Chunked rollout execution: T-step rollouts as K C-step jitted scans with
host data exchange between chunks.

This is the execution half of the callback-free host data path
(data/host_prefetch.py): backends whose PJRT implements no host send/recv
(the axon TPU tunnel) cannot serve mmap RIRs or host-speaker tokens through
`io_callback` inside one T-step scan, so the rollout runs as chunks and the
host rides ahead of the device between them —

    refresh cache (prefetch ball) → device chunk scan → verify pairs → next

with an exact replay backstop: if a chunk requested a pair the cache did not
hold (only possible when more episodes end inside one chunk than the
prefetch lookahead covered), the missing entries are uploaded and the chunk
re-runs from its saved carry, making observations bit-identical to an
uncached run. The PPO update stays one jitted program over the recombined
(T, B, ...) batch.

Reference cost replaced: the per-step host RPC loop of
`_collect_rollout_step` + per-step `wavfile.read`/`fftconvolve`
(ss_baselines/savi/ppo/ppo_trainer.py:323-897,
soundspaces/simulator.py:652-699).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.data.host_prefetch import HostRIRPrefetcher, env_state_to_host
from avlen_tpu.utils.logging import logger


def require_no_host_prefetch(env, trainer: str) -> None:
    """Loud failure for trainers whose rollouts are not chunk-aware: an env
    built on the host-prefetch audio path starts with an EMPTY device cache,
    so an unchunked T-step scan would silently render silence for every
    step. The savi / ddppo (interactive + dialog) / avnav trainers drive
    their rollouts through a ChunkedCollector instead; only avwan remains
    guarded (its high-level planner step advances several low-level env
    steps per scan step, so the chunk→graph-ball radius mapping needs the
    planner's substep bound — not yet wired)."""
    if getattr(env, "host_prefetcher", None) is not None:
        raise NotImplementedError(
            f"the '{trainer}' trainer does not support the chunked "
            "host-prefetch audio path (TPU.HOST_PREFETCH); its audio would "
            "silently be silence. Raise SIMULATOR.AUDIO.DENSE_RIR_MAX_BYTES "
            "so the RIR bank fits HBM, run on a host-callback-capable "
            "backend, or use the savi/ddppo/avnav trainers."
        )


def replace_bank_rir(consts: Dict, cache) -> Dict:
    """New consts dict whose SceneBank carries ``cache`` as its RIR provider."""
    import dataclasses

    consts = dict(consts)
    consts["bank"] = dataclasses.replace(consts["bank"], rir=cache)
    return consts


def combine_rollout_batches(trajs: Sequence):
    """K chunk RolloutBatches → one T-step batch: time-leaves concatenate,
    ``initial_hidden`` comes from chunk 0 (the pre-rollout ring state the PPO
    replay starts from), ``bootstrap_value`` from the last chunk (the only
    chunk whose post-state bootstraps GAE)."""
    from avlen_tpu.rl.rollout import RolloutBatch

    if len(trajs) == 1:
        return trajs[0]
    cat = lambda *xs: jnp.concatenate(xs, axis=0)
    d = {}
    for f in RolloutBatch._fields:
        if f == "initial_hidden":
            d[f] = trajs[0].initial_hidden
        elif f == "bootstrap_value":
            d[f] = trajs[-1].bootstrap_value
        else:
            d[f] = jax.tree.map(cat, *(getattr(t, f) for t in trajs))
    return RolloutBatch(**d)


def combine_traj_dicts(trajs: Sequence[Dict]):
    """Dict-shaped (interactive) chunk trajectories → one T-step trajectory
    (same first/last rules as combine_rollout_batches)."""
    if len(trajs) == 1:
        return trajs[0]
    out = {}
    for k in trajs[0]:
        if k == "initial_memories":
            out[k] = trajs[0][k]
        elif k == "bootstrap_value":
            out[k] = trajs[-1][k]
        else:
            out[k] = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *(t[k] for t in trajs)
            )
    return out


def resolve_chunk(num_steps: int, requested: int) -> int:
    """Largest divisor of ``num_steps`` that is ≤ the requested chunk length
    (static shapes: every chunk scan must compile once)."""
    chunk = max(1, min(int(requested) or num_steps, num_steps))
    while num_steps % chunk:
        chunk -= 1
    return chunk


def make_chunked_superstep(
    collect_n: Callable,  # (train_state, carry, n) -> (carry, traj); binder-read
    update: Callable,  # (train_state, batch, key, grad_reduce) -> (train_state, stats)
    train_state_example,
    carry_example,
    mesh,  # jax.sharding.Mesh or None
    num_steps: int,
    chunk: int,
    binder,
    collector: "ChunkedCollector",
    metrics_of: Callable = lambda traj: traj.metrics,
    combine: Callable = combine_rollout_batches,
    axis: str = "data",
):
    """The chunked counterpart of parallel/ddppo.make_{local,sharded}_superstep:
    same (train_state, carry, key, consts) -> (train_state, carry, batch,
    stats) signature, but the rollout half runs as host-driven chunks through
    ``collector`` while the PPO update stays one jitted (optionally
    shard_map'd) program. Carry buffers are NOT donated — the saved chunk
    carry must survive for the verify/replay backstop.

    Returns (step_fn, carry_spec) — carry_spec is None without a mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        def collect_chunk(consts, train_state, carry):
            with binder.bind(consts):
                return collect_n(train_state, carry, chunk)

        collect_jit = jax.jit(collect_chunk)

        def update_local(train_state, batch, key, consts):
            with binder.bind(consts):
                return update(train_state, batch, key, lambda g: g)

        update_jit = jax.jit(update_local)

        def step_fn(train_state, carry, key, consts):
            rollout_key, update_key = jax.random.split(key)
            carry = carry._replace(key=rollout_key)
            carry, batch, consts2 = collector.run(
                lambda c, cr: collect_jit(c, train_state, cr),
                carry, consts, metrics_of, combine,
            )
            train_state, stats = update_jit(train_state, batch, update_key, consts2)
            return train_state, carry, batch, stats

        return step_fn, None

    from avlen_tpu.parallel.ddppo import infer_env_specs

    num_envs = int(carry_example.masks.shape[0])
    carry_spec = infer_env_specs(carry_example, num_envs, axis)
    _, chunk_struct = jax.eval_shape(
        lambda ts, c: collect_n(ts, c, chunk), train_state_example, carry_example
    )
    chunk_spec = infer_env_specs(chunk_struct, num_envs, axis, num_steps=chunk)
    consts_spec = jax.tree.map(lambda _: P(), binder.arrays)
    rep = NamedSharding(mesh, P())

    def local_collect(consts, train_state, carry):
        with binder.bind(consts):
            # per-shard RNG decorrelation re-applied at every chunk start:
            # the chunk-boundary out_spec collapses the evolved key to one
            # shard's value, so each chunk folds the axis index back in
            carry = carry._replace(
                key=jax.random.fold_in(carry.key, jax.lax.axis_index(axis))
            )
            return collect_n(train_state, carry, chunk)

    # consts carries the AssocRIRCache, whose key/buf tables CHANGE between
    # chunks but keep their shapes — the jit signature stays stable
    collect_sm = jax.shard_map(
        local_collect, mesh=mesh,
        in_specs=(consts_spec, P(), carry_spec),
        out_specs=(carry_spec, chunk_spec),
        check_vma=False,
    )
    collect_jit = jax.jit(collect_sm)

    update_state = {}  # built lazily: the combined batch fixes the specs

    def _build_update(batch):
        batch_spec = infer_env_specs(batch, num_envs, axis, num_steps=num_steps)

        def local_update(train_state, batch, key, consts):
            with binder.bind(consts):
                key = jax.random.fold_in(key, jax.lax.axis_index(axis))
                train_state, stats = update(
                    train_state, batch, key, lambda g: jax.lax.pmean(g, axis)
                )
                return train_state, jax.tree.map(
                    lambda v: jax.lax.pmean(v, axis), stats
                )

        update_state["spec"] = batch_spec
        update_state["jit"] = jax.jit(
            jax.shard_map(
                local_update, mesh=mesh,
                in_specs=(P(), batch_spec, P(), consts_spec),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )

    def put_spec(tree, spec):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec
        )

    def step_fn(train_state, carry, key, consts):
        rollout_key, update_key = jax.random.split(key)
        carry = carry._replace(key=rollout_key)
        train_state = jax.device_put(train_state, rep)

        def chunk_fn(c, cr):
            # commit placements so the input-sharding signature is identical
            # across chunks/updates (see ddppo._stable_call)
            return collect_jit(
                jax.device_put(c, rep), train_state, put_spec(cr, carry_spec)
            )

        carry, batch, consts2 = collector.run(
            chunk_fn, carry, consts, metrics_of, combine
        )
        if "jit" not in update_state:
            _build_update(batch)
        train_state, stats = update_state["jit"](
            train_state,
            put_spec(batch, update_state["spec"]),
            jax.device_put(update_key, rep),
            jax.device_put(consts2, rep),
        )
        return train_state, carry, batch, stats

    return step_fn, carry_spec


class ChunkedCollector:
    """Drives one rollout as prefetch → chunk scan → verify (→ replay) loops.

    Owns the device RIR cache between calls; every returned ``consts`` dict
    carries the current cache so the subsequent update jit (and the trainer's
    stored env binder) see the live table. ``chunk_fn(consts, carry)`` is any
    jitted C-step collector returning ``(carry, traj)``; ``metrics_of``
    extracts the step-metrics dict holding the recorded audio pairs;
    ``combine`` merges the K chunk trajectories.
    """

    def __init__(
        self,
        prefetcher: HostRIRPrefetcher,
        binder,
        chunk: int,
        num_steps: int,
        max_replays: int = 16,
        instr_prefetcher=None,  # dialog/instr_prefetch.HostInstrPrefetcher
    ):
        if num_steps % chunk:
            raise ValueError(f"chunk {chunk} must divide num_steps {num_steps}")
        self.prefetcher = prefetcher
        self.binder = binder
        self.chunk = chunk
        self.num_chunks = num_steps // chunk
        self.max_replays = max_replays
        self.cache = prefetcher.make_cache()
        # per-phase wall-second accumulators (bench/profiling: where does the
        # chunked path spend its non-device time? — VERDICT r4 #5)
        self.timings = {"plan_s": 0.0, "ensure_s": 0.0, "device_s": 0.0, "verify_s": 0.0}
        # optional second prefetched stream: speaker instruction tokens for
        # the interactive/dialog rollouts (same plan geometry, same
        # verify/replay backstop — dialog/instr_prefetch.py)
        self.instr = instr_prefetcher
        self.instr_cache = instr_prefetcher.make_cache() if instr_prefetcher else None

    # ------------------------------------------------------------------
    def current_consts(self, consts: Optional[Dict] = None) -> Dict:
        consts = replace_bank_rir(
            dict(consts) if consts is not None else dict(self.binder.arrays),
            self.cache,
        )
        if self.instr is not None:
            consts["instr_cache"] = self.instr_cache
        return consts

    def prime(self, env_state, consts: Optional[Dict] = None) -> Dict:
        """Prefetch the pairs of a freshly reset state (radius 0: just the
        standing pairs + lookahead spawns) so the reset's ``_observe`` can be
        recomputed against a warm cache. Returns consts with the cache."""
        st = env_state_to_host(env_state)
        self.cache = self.prefetcher.ensure(self.cache, self.prefetcher.plan(st, 0))
        if self.instr is not None:
            self.instr_cache = self.instr.ensure(self.instr_cache, self.instr.plan(st, 0))
        return self.current_consts(consts)

    # ------------------------------------------------------------------
    def run(
        self,
        chunk_fn: Callable,  # (consts, carry) -> (carry, traj)
        carry,
        consts: Optional[Dict] = None,
        metrics_of: Callable = lambda traj: traj.metrics,
        combine: Callable = combine_rollout_batches,
    ):
        """Collect num_chunks × chunk steps. Returns (carry, traj, consts)."""
        import time

        trajs: List = []
        for _ in range(self.num_chunks):
            # prefetch everything the next `chunk` steps can request
            t0 = time.perf_counter()
            st = env_state_to_host(carry.env_state)
            plan = self.prefetcher.plan(st, self.chunk)
            instr_plan = self.instr.plan(st, self.chunk) if self.instr is not None else None
            t1 = time.perf_counter()
            self.timings["plan_s"] += t1 - t0
            self.cache = self.prefetcher.ensure(self.cache, plan)
            if self.instr is not None:
                self.instr_cache = self.instr.ensure(self.instr_cache, instr_plan)
            t2 = time.perf_counter()
            self.timings["ensure_s"] += t2 - t1
            consts_k = self.current_consts(consts)
            saved = carry
            for attempt in range(self.max_replays):
                t3 = time.perf_counter()
                carry2, traj = chunk_fn(consts_k, saved)
                pair_vals = {
                    k: v for k, v in metrics_of(traj).items()
                    if k.startswith("pair_")
                }
                # one async round trip for all recorded pair arrays
                for v in pair_vals.values():
                    if hasattr(v, "copy_to_host_async"):
                        v.copy_to_host_async()
                metrics = {k: np.asarray(v) for k, v in pair_vals.items()}
                t4 = time.perf_counter()
                self.timings["device_s"] += t4 - t3
                missing = self.prefetcher.missing_of(
                    self.prefetcher.requested_keys(metrics)
                )
                missing_instr = (
                    self.instr.missing_of(self.instr.requested_keys(metrics))
                    if self.instr is not None
                    else np.zeros((0,), np.int64)
                )
                self.timings["verify_s"] += time.perf_counter() - t4
                if missing.size == 0 and missing_instr.size == 0:
                    break
                # backstop: more resets than the lookahead covered — upload
                # the missing entries and replay the chunk exactly
                self.prefetcher.replays += 1
                logger.warning(
                    "chunked rollout: %d uncached audio pairs + %d uncached "
                    "instructions requested (replay %d) — raise the prefetcher "
                    "lookahead if frequent",
                    missing.size, missing_instr.size, attempt + 1,
                )
                if missing.size:
                    self.cache = self.prefetcher.ensure(self.cache, missing)
                if missing_instr.size:
                    self.instr_cache = self.instr.ensure(self.instr_cache, missing_instr)
                consts_k = self.current_consts(consts)
            else:
                raise RuntimeError(
                    f"chunk did not converge after {self.max_replays} replays"
                )
            carry = carry2
            trajs.append(traj)
        return carry, combine(trajs), self.current_consts(consts)
