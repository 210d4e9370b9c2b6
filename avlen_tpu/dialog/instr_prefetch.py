"""Callback-free oracle-instruction serving for chunked interactive rollouts.

The reference invokes the pretrained speaker on every query and CLIP-tokenizes
the text on the host (ss_baselines/savi/ppo/ppo_trainer.py:549-562 →
speaker_pipeline.py:110-124). On backends whose PJRT implements no host
callbacks (the axon TPU tunnel), and for scenes too large to precompute the
O(S·N²·4) instruction bank, instructions ride the same chunk-boundary
prefetch machinery as the RIRs (data/host_prefetch.py):

* the rollout gathers each step's tokens from a small device-resident
  **associative token cache** (`AssocInstrCache`), keyed by the packed
  (scene, rot, node, goal) tuple — the full speaker input state;
* **between** chunks `HostInstrPrefetcher` plans every (node-ball × 4 rots ×
  goal) pair the next chunk can request (identical key geometry to the RIR
  plan — rot plays the azimuth slot, goal plays the source slot), runs the
  speaker + CLIP tokenizer on the host for uncached pairs (memoized — each
  distinct instruction is generated once per training run), and scatters the
  new token rows into the cache;
* the **verify + replay** backstop in parallel/chunked.py makes the
  semantics exact: the rollout records the packed key of every step whose
  query *starts* (pair_instr_a / pair_instr_src trajectory metrics); a
  requested-but-uncached instruction triggers one host upload + exact chunk
  replay, so tokens are always bit-identical to an unchunked run.

Steady-state host cost: zero per step, a few memoized speaker calls per
chunk boundary. This is what lets the FULL interactive AVLEN trainer (π_g /
π_l / π_q + neural speaker) train at real-Matterport scale on an
io_callback-less TPU backend.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avlen_tpu.data.host_prefetch import HostPairPrefetcher, pack_pair_key_a


@dataclasses.dataclass
class AssocInstrCache:
    """Device-resident associative instruction-token cache (the instruction
    analogue of data/host_prefetch.AssocRIRCache). ``key_a`` packs
    (scene, rot, node); ``key_b`` is the goal node; ``buf`` holds the CLIP
    token rows. Empty slots are -1; a lookup miss returns all-zero tokens,
    which the verify/replay loop repairs exactly."""

    key_a: jax.Array  # (C,) i32, -1 = empty
    key_b: jax.Array  # (C,) i32
    buf: jax.Array  # (C, 77) i32 CLIP tokens
    n_max: int  # static: node-count stride of the key packing
    length: int  # static: context length

    @classmethod
    def create(cls, capacity: int, context_length: int, n_max: int) -> "AssocInstrCache":
        return cls(
            key_a=jnp.full((capacity,), -1, jnp.int32),
            key_b=jnp.full((capacity,), -1, jnp.int32),
            buf=jnp.zeros((capacity, context_length), jnp.int32),
            n_max=n_max,
            length=context_length,
        )

    def gather(self, scene, rot, node, goal):
        """(B,) indices → (B, 77) token rows; uncached pairs → zeros."""
        ka = pack_pair_key_a(scene, rot, node, self.n_max).astype(jnp.int32)
        kb = goal.astype(jnp.int32)
        m = (self.key_a[None, :] == ka[:, None]) & (self.key_b[None, :] == kb[:, None])
        idx = jnp.argmax(m, axis=1)
        hit = jnp.any(m, axis=1)
        return self.buf[idx] * hit[:, None].astype(self.buf.dtype)


jax.tree_util.register_pytree_node(
    AssocInstrCache,
    lambda c: ((c.key_a, c.key_b, c.buf), (c.n_max, c.length)),
    lambda aux, ch: AssocInstrCache(ch[0], ch[1], ch[2], aux[0], aux[1]),
)


class HostInstrPrefetcher(HostPairPrefetcher):
    """`HostPairPrefetcher` whose payloads are speaker-generated CLIP token
    rows. ``_fetch`` runs the (memoized) host speaker + tokenizer — the
    reference's per-query `Speaker.generate_instr` + `clip.tokenize`
    (speaker_pipeline.py:110-124, ppo_trainer.py:560-561) hoisted to chunk
    boundaries. Key slots: a = rot (heading quadrant), recv = current node,
    src = goal node; no distractor source exists for instructions."""

    def __init__(
        self,
        lookup,  # HostSpeakerInstructionSource-style memoized (s, n, r, g) -> (77,) i32
        hops: np.ndarray,
        packed_eps: Dict[str, np.ndarray],
        capacity: int = 4096,
        lookahead_episodes: int = 2,
        context_length: int = 77,
    ):
        super().__init__(
            hops, packed_eps, capacity, lookahead_episodes, has_distractor=False
        )
        self._lookup = lookup
        self.context_length = int(context_length)

    def make_cache(self) -> AssocInstrCache:
        return AssocInstrCache.create(self.capacity, self.context_length, self.n_max)

    def _fetch(self, scene, rot, node, goal) -> np.ndarray:
        out = np.zeros((scene.shape[0], self.context_length), np.int32)
        for i in range(scene.shape[0]):
            out[i] = self._lookup(int(scene[i]), int(node[i]), int(rot[i]), int(goal[i]))
        return out

    # -- verification -------------------------------------------------------
    def requested_keys(self, metrics: Dict[str, np.ndarray]) -> np.ndarray:
        """Packed keys of the instructions a chunk actually consumed: the
        rollout records (key_a, goal) at query-start steps and -1 elsewhere
        (rl/rollout_interactive.py)."""
        if "pair_instr_a" not in metrics:
            return np.zeros((0,), np.int64)
        ka = np.asarray(metrics["pair_instr_a"], np.int64).ravel()
        src = np.asarray(metrics["pair_instr_src"], np.int64).ravel()
        sel = ka >= 0
        return np.unique(ka[sel] * self.n_max + src[sel])


class CachedInstrSource:
    """Device-side instruction source backed by an `AssocInstrCache` bound on
    the env binder (consts name ``instr_cache`` — refreshed between chunks by
    parallel/chunked.ChunkedCollector). Drop-in for the ``instr_bank``
    callable slot of collect_rollout_interactive / _dialog_pretrain; exposes
    ``keys_of`` so the rollout can record which pairs it consumed for the
    verify/replay backstop."""

    record_requests = True

    def __init__(self, binder, n_max: int):
        self.binder = binder
        self.n_max = int(n_max)

    def keys_of(self, env_state):
        ka = pack_pair_key_a(
            env_state.scene, env_state.rot, env_state.node, self.n_max
        ).astype(jnp.int32)
        return ka, env_state.goal_node.astype(jnp.int32)

    def __call__(self, env_state, newly) -> jax.Array:
        cache: AssocInstrCache = self.binder.get("instr_cache")
        return cache.gather(
            env_state.scene, env_state.rot, env_state.node, env_state.goal_node
        )
