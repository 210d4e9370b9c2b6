"""Callback-free host RIR serving: device associative cache + host prefetch.

The designated real-Matterport audio path is `HostRIRStore` — a memory-mapped
RIR bank gathered into jitted rollouts via `io_callback`
(data/reference.py). This TPU's PJRT backend (axon) does NOT implement host
send/recv callbacks, so that gather cannot run inside a compiled program
here. This module is the SURVEY §7 "async host rollout queue" alternative:

* the rollout scan is split into C-step chunks (parallel/chunked.py);
* audio RIRs come from a small device-resident **associative cache**
  (`AssocRIRCache`): per lookup, each env's packed (scene, azimuth, receiver,
  source) key is compared against the cache's key table — one (B, C) compare
  + gather, no host interaction inside the chunk;
* **between** chunks the host refreshes the cache from the mmap store:
  it reads the chunk-end env states (a few (B,) int transfers), computes
  every pair reachable within the next chunk (graph-ball of radius
  ``chunk`` around each agent via the host hops table, × 4 azimuths ×
  {goal, distractor}, plus the next ``lookahead`` episodes of each slot's
  stream — episode identities are deterministic given the dealt ep_order),
  and uploads only the entries not already cached (LRU eviction);
* a **verify + replay** backstop makes the semantics exact: each chunk's
  trajectory records the audio pair it actually rendered per step
  (EnvConfig.record_audio_pairs); if any requested pair was not cached
  (possible only when more than ``lookahead`` episodes end within one
  chunk), the host uploads the missing RIRs and re-runs the chunk from its
  saved carry — observations are therefore always bit-identical to a
  hypothetical uncached run.

Reference cost replaced: the per-step host ``wavfile.read(binaural_rir)`` +
``fftconvolve`` (soundspaces/simulator.py:652-699) — here the steady-state
per-step host cost is zero and the per-chunk host cost is a handful of mmap
reads riding ahead of the device scan.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_pair_key_a(scene, az, recv, n_max: int):
    """First half of the pair key: (scene·4 + az)·N + recv (fits i32)."""
    return (scene * 4 + az) * n_max + recv


@dataclasses.dataclass
class AssocRIRCache:
    """Device-resident associative RIR cache (drop-in SceneBank.rir provider).

    Keys are split across two int32 tables so no int64 arithmetic happens on
    device: ``key_a`` packs (scene, azimuth, receiver), ``key_b`` is the
    source node. Empty slots hold -1. A lookup compares the batch's packed
    keys against both tables ((B, C) boolean work — negligible next to the
    audio FFTs) and gathers the matching rows; misses return silence, which
    the verify/replay loop in parallel/chunked.py then repairs exactly.
    """

    key_a: jax.Array  # (C,) i32, -1 = empty
    key_b: jax.Array  # (C,) i32
    buf: jax.Array  # (C, L, 2) f32
    n_max: int  # static: node-count stride of the key packing
    length: int  # static: L

    @classmethod
    def create(cls, capacity: int, length: int, n_max: int) -> "AssocRIRCache":
        return cls(
            key_a=jnp.full((capacity,), -1, jnp.int32),
            key_b=jnp.full((capacity,), -1, jnp.int32),
            buf=jnp.zeros((capacity, length, 2), jnp.float32),
            n_max=n_max,
            length=length,
        )

    @property
    def capacity(self) -> int:
        return int(self.buf.shape[0])

    def gather(self, scene, az_idx, recv, src):
        """(B,) indices → (B, L, 2) RIRs; uncached pairs → zeros."""
        ka = pack_pair_key_a(scene, az_idx, recv, self.n_max).astype(jnp.int32)
        kb = src.astype(jnp.int32)
        m = (self.key_a[None, :] == ka[:, None]) & (self.key_b[None, :] == kb[:, None])
        idx = jnp.argmax(m, axis=1)
        hit = jnp.any(m, axis=1)
        return self.buf[idx] * hit[:, None, None].astype(self.buf.dtype)


jax.tree_util.register_pytree_node(
    AssocRIRCache,
    lambda c: ((c.key_a, c.key_b, c.buf), (c.n_max, c.length)),
    lambda aux, ch: AssocRIRCache(ch[0], ch[1], ch[2], aux[0], aux[1]),
)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_entries(key_a, key_b, buf, slots, new_a, new_b, new_rirs):
    return (
        key_a.at[slots].set(new_a),
        key_b.at[slots].set(new_b),
        buf.at[slots].set(new_rirs),
    )


def _pad_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class HostPairPrefetcher:
    """Generic host-side planner/refresher/verifier for a device-resident
    associative (scene, a∈[0,4), node, src) → payload cache.

    Owns the host mirror of the cache (key → slot map, LRU clocks) plus host
    copies of the hops table and the packed episode fields it needs to
    predict upcoming pairs. All per-refresh work is numpy-vectorized.

    Two concrete uses share this machinery because their key spaces are
    isomorphic: binaural RIRs keyed by (scene, azimuth, receiver, source)
    — `HostRIRPrefetcher` — and oracle speaker instructions keyed by
    (scene, rot, node, goal) — `dialog.instr_prefetch.HostInstrPrefetcher`.
    Subclasses provide ``make_cache`` (the empty device cache), ``_fetch``
    (host payload lookup for a batch of unpacked keys) and
    ``requested_keys`` (extraction of the pairs a chunk actually consumed
    from its recorded trajectory metrics).
    """

    def __init__(
        self,
        hops: np.ndarray,  # (S, N, N) host hop table (UNREACHABLE = large)
        packed_eps: Dict[str, np.ndarray],  # scene/start_node/goal_node/distractor_node
        capacity: int = 4096,
        lookahead_episodes: int = 2,
        has_distractor: bool = False,
    ):
        self.hops = np.asarray(hops)
        self.n_max = int(self.hops.shape[1])
        self.eps = {
            k: np.asarray(packed_eps[k])
            for k in ("scene", "start_node", "goal_node", "distractor_node")
        }
        self.capacity = int(capacity)
        self.lookahead = int(lookahead_episodes)
        self.has_distractor = bool(has_distractor)

        self.key_to_slot: Dict[int, int] = {}
        self.slot_key = np.full(self.capacity, -1, np.int64)
        self.slot_used = np.zeros(self.capacity, np.int64)  # LRU clock
        self._tick = 0
        # instrumentation (tests/bench)
        self.uploads = 0
        self.uploaded_entries = 0
        self.replays = 0

    # -- key packing ------------------------------------------------------
    def _pack(self, scene, az, recv, src) -> np.ndarray:
        a = (scene.astype(np.int64) * 4 + az) * self.n_max + recv
        return a * self.n_max + src

    def _unpack(self, keys: np.ndarray):
        src = keys % self.n_max
        a = keys // self.n_max
        recv = a % self.n_max
        rest = a // self.n_max
        az = rest % 4
        scene = rest // 4
        return scene, az, recv, src

    # -- subclass hooks -----------------------------------------------------
    def make_cache(self):
        raise NotImplementedError

    def _fetch(self, scene, az, recv, src) -> np.ndarray:
        """(k,) unpacked keys → (k, ...) payload rows (host side)."""
        raise NotImplementedError

    def requested_keys(self, metrics: Dict[str, np.ndarray]) -> np.ndarray:
        raise NotImplementedError

    # -- planning ---------------------------------------------------------
    def plan(self, env_state_host: Dict[str, np.ndarray], radius: int) -> np.ndarray:
        """All packed pair keys the next chunk may request, per the current
        states plus each slot's next ``lookahead`` dealt episodes.

        Fully numpy-vectorized (VERDICT r4 #5 — the per-env Python loop was
        measurable host time at recipe shapes): one fancy-indexed
        (K, N) ball lookup over all K = B·(1+lookahead) episode descriptors,
        then broadcasted key packing over hits × 4 azimuths × sources.
        """
        scene = np.asarray(env_state_host["scene"], np.int64)
        node = np.asarray(env_state_host["node"], np.int64)
        goal = np.asarray(env_state_host["goal_node"], np.int64)
        distractor = np.asarray(env_state_host["distractor_node"], np.int64)
        ep_order = np.asarray(env_state_host["ep_order"])  # (B, P)
        cursor = np.asarray(env_state_host["cursor"])  # (B,)
        b = scene.shape[0]
        per = ep_order.shape[1]
        # (B, lookahead) upcoming episode ids of each slot's dealt stream
        li = np.arange(1, self.lookahead + 1)
        nxt = ep_order[np.arange(b)[:, None], (cursor[:, None] + li[None, :]) % per]
        nxt = nxt.ravel()
        d_scene = np.concatenate([scene, self.eps["scene"][nxt].astype(np.int64)])
        d_node = np.concatenate([node, self.eps["start_node"][nxt].astype(np.int64)])
        d_goal = np.concatenate([goal, self.eps["goal_node"][nxt].astype(np.int64)])
        d_dist = np.concatenate([distractor, self.eps["distractor_node"][nxt].astype(np.int64)])

        reach = self.hops[d_scene, d_node] <= radius  # (K, N) graph balls
        reach[np.arange(d_scene.size), d_node] = True  # standing node always
        ri, recv = np.nonzero(reach)
        az = np.arange(4, dtype=np.int64)
        ka = (d_scene[ri, None] * 4 + az[None, :]) * self.n_max + recv[:, None]
        keys = [(ka * self.n_max + d_goal[ri, None]).ravel()]
        if self.has_distractor:
            m = d_dist[ri] >= 0
            if m.any():
                keys.append((ka[m] * self.n_max + d_dist[ri][m, None]).ravel())
        return np.unique(np.concatenate(keys))

    # -- cache maintenance --------------------------------------------------
    def ensure(self, cache: AssocRIRCache, keys: np.ndarray) -> AssocRIRCache:
        """Upload every key in ``keys`` not yet cached; LRU-evict as needed.
        Marks all of ``keys`` as freshly used. Returns the (possibly new)
        device cache."""
        self._tick += 1
        keys = np.unique(np.asarray(keys, np.int64))
        have = np.asarray([k in self.key_to_slot for k in keys], bool)
        # refresh LRU clocks of everything needed
        for k in keys[have]:
            self.slot_used[self.key_to_slot[k]] = self._tick
        missing = keys[~have]
        if missing.size == 0:
            return cache
        if missing.size > self.capacity:
            raise RuntimeError(
                f"RIR working set for one chunk ({missing.size} new pairs) exceeds "
                f"the device cache capacity ({self.capacity}); raise "
                f"SIMULATOR.AUDIO.RIR_CACHE_SLOTS or lower TPU.ROLLOUT_CHUNK"
            )

        # slot assignment: free slots first, then LRU among not-needed
        free = np.flatnonzero(self.slot_key == -1)
        slots = free[: missing.size]
        if slots.size < missing.size:
            needed_now = self.slot_used == self._tick
            evictable = np.flatnonzero((self.slot_key != -1) & ~needed_now)
            if evictable.size < missing.size - slots.size:
                raise RuntimeError(
                    f"cannot fit the chunk's RIR working set: need "
                    f"{missing.size - slots.size} more slots, only "
                    f"{evictable.size} evictable of {self.capacity} "
                    "(raise SIMULATOR.AUDIO.RIR_CACHE_SLOTS)"
                )
            order = evictable[np.argsort(self.slot_used[evictable])]
            victims = order[: missing.size - slots.size]
            for s in victims:
                del self.key_to_slot[int(self.slot_key[s])]
                self.slot_key[s] = -1
            slots = np.concatenate([slots, victims])

        scene, az, recv, src = self._unpack(missing)
        rirs = self._fetch(scene, az, recv, src)  # (k, ...) payload rows

        # mirror update
        for s, k in zip(slots, missing):
            self.key_to_slot[int(k)] = int(s)
            self.slot_key[s] = k
            self.slot_used[s] = self._tick

        # device update, padded to a power of two so the scatter jit compiles
        # O(log) shape variants instead of one per distinct refresh size
        k = missing.size
        kp = _pad_pow2(k)
        pad = kp - k
        slots_p = np.concatenate([slots, np.repeat(slots[:1], pad)]).astype(np.int32)
        miss_p = np.concatenate([missing, np.repeat(missing[:1], pad)])
        rirs_p = np.concatenate([rirs, np.repeat(rirs[:1], pad, axis=0)], axis=0)
        new_a = (miss_p // self.n_max).astype(np.int32)
        new_b = (miss_p % self.n_max).astype(np.int32)
        key_a, key_b, buf = _scatter_entries(
            cache.key_a, cache.key_b, cache.buf,
            jnp.asarray(slots_p), jnp.asarray(new_a), jnp.asarray(new_b),
            jnp.asarray(rirs_p),
        )
        self.uploads += 1
        self.uploaded_entries += int(k)
        return dataclasses.replace(cache, key_a=key_a, key_b=key_b, buf=buf)

    def missing_of(self, requested: np.ndarray) -> np.ndarray:
        return np.asarray(
            [k for k in requested if int(k) not in self.key_to_slot], np.int64
        )


class HostRIRPrefetcher(HostPairPrefetcher):
    """`HostPairPrefetcher` over the mmap RIR bank: payloads are (L, 2) f32
    binaural RIRs read through ``HostRIRStore.gather_host``
    (data/reference.py); the a-slot of the key is the discrete azimuth."""

    def __init__(
        self,
        store,  # HostRIRStore (data/reference.py) — host side only
        hops: np.ndarray,
        packed_eps: Dict[str, np.ndarray],
        capacity: int = 4096,
        lookahead_episodes: int = 2,
        has_distractor: bool = False,
    ):
        super().__init__(hops, packed_eps, capacity, lookahead_episodes, has_distractor)
        self.store = store

    def make_cache(self) -> AssocRIRCache:
        return AssocRIRCache.create(self.capacity, self.store.length, self.n_max)

    def _fetch(self, scene, az, recv, src) -> np.ndarray:
        return self.store.gather_host(scene, az, recv, src)  # (k, L, 2)

    # -- verification -------------------------------------------------------
    def requested_keys(self, metrics: Dict[str, np.ndarray]) -> np.ndarray:
        """Packed keys actually requested during a chunk, from the trajectory's
        recorded pair metrics (EnvConfig.record_audio_pairs)."""
        ka = np.asarray(metrics["pair_key_a"], np.int64).ravel()
        src = np.asarray(metrics["pair_src"], np.int64).ravel()
        keys = [ka * self.n_max + src]
        if "pair_dsrc" in metrics:
            dsrc = np.asarray(metrics["pair_dsrc"], np.int64).ravel()
            sel = dsrc >= 0
            keys.append(ka[sel] * self.n_max + dsrc[sel])
        return np.unique(np.concatenate(keys))


def env_state_to_host(env_state) -> Dict[str, np.ndarray]:
    """Pull the scalar state fields the prefetcher plans from (tiny D2H).

    The copies are issued async first so the 6 fields ride one round trip of
    the (possibly tunneled) transport instead of 6 sequential ones."""
    fields = {
        "scene": env_state.scene,
        "node": env_state.node,
        "goal_node": env_state.goal_node,
        "distractor_node": env_state.distractor_node,
        "ep_order": env_state.ep_order,
        "cursor": env_state.cursor,
    }
    for v in fields.values():
        if hasattr(v, "copy_to_host_async"):
            v.copy_to_host_async()
    return {k: np.asarray(v) for k, v in fields.items()}
