"""Scale-safe oracle-instruction sources for the interactive/dialog rollouts.

The reference invokes a pretrained speaker model on every query
(ss_baselines/savi/ppo/ppo_trainer.py:549-562 → speaker_pipeline.py:110-124)
and tokenizes the text with CLIP (ppo_trainer.py:560-561). Two TPU-native
source shapes cover all scene sizes:

* **bank** — the full (S, N, 4, N, 77) token tensor precomputed at setup
  (dialog/instruction_bank.py); instruction lookup is one device gather and
  the whole rollout stays a zero-host-round-trip `lax.scan`. Feasible for
  small/synthetic scenes only: the bank is O(S·N²·4·77) and costs S·N²·4
  speaker calls to build.
* **callback** — `HostSpeakerInstructionSource`: a per-step
  `jax.experimental.io_callback` into the host speaker, computing tokens
  only for envs whose query *starts* this step (the reference's per-query
  host speaker call, batched over envs) with an unbounded-scene-safe
  memoization cache. This is the designated path for real Matterport scene
  sizes (N≈500+), where no O(N²) bank can be materialized.

`resolve_instruction_source` picks between them from config
(SPEAKER.BANK_MODE auto|bank|callback, SPEAKER.MAX_BANK_NODES).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.experimental  # noqa: F401  (io_callback)
import jax.numpy as jnp
import numpy as np

from avlen_tpu.dialog.instruction_bank import (
    APP_PATH_LEN,
    build_instruction_bank,
    shortest_path_prefix,
)
from avlen_tpu.dialog.speaker.speaker import Speaker
from avlen_tpu.dialog.speaker.vocab import Vocabulary
from avlen_tpu.models.clip_text import CONTEXT_LENGTH, tokenize


def speaker_from_config(cfg, tables_list, rgb_bank=None) -> Speaker:
    """Build the Speaker the trainer's instruction channel uses.

    SPEAKER.BACKEND selects template vs neural (the reference always uses
    the pretrained neural speaker, speaker_pipeline.py:27); a neural
    speaker's weights come from SPEAKER.CKPT_PATH (train_speaker output) and
    optionally consume a panorama feature bank (the ResNet panorama features
    of R2R env.py:356-398) when SPEAKER.USE_PANO_FEATURES.
    """
    sp_cfg = cfg.SPEAKER
    positions = [t.positions for t in tables_list]

    pano = None
    if sp_cfg.USE_PANO_FEATURES:
        if rgb_bank is None:
            raise ValueError(
                "SPEAKER.USE_PANO_FEATURES requires an RGB frame bank to encode"
            )
        from avlen_tpu.dialog.speaker.pano_features import (
            PanoramaEncoder,
            precompute_panorama_features,
        )

        encoder = PanoramaEncoder()
        key = jax.random.key(0)
        params = encoder.init(key, np.zeros((1,) + np.asarray(rgb_bank).shape[3:], np.float32))
        pano = precompute_panorama_features(rgb_bank, params, encoder)

    if sp_cfg.BACKEND == "template":
        return Speaker(positions, backend="template", pano_features=pano)

    vocab = Vocabulary()
    neural_params = None
    hidden = 256
    if sp_cfg.CKPT_PATH:
        if not os.path.exists(sp_cfg.CKPT_PATH):
            raise FileNotFoundError(f"speaker checkpoint not found: {sp_cfg.CKPT_PATH}")
        from avlen_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(sp_cfg.CKPT_PATH)
        raw = ckpt["vocab"]
        if isinstance(raw, dict):  # msgpack round-trips lists as {'0': ...}
            raw = [raw[k] for k in sorted(raw, key=int)]
        vocab = Vocabulary.from_words(
            [w.decode() if isinstance(w, bytes) else str(w) for w in raw]
        )
        neural_params = jax.tree.map(jnp.asarray, ckpt["state_dict"])
        hidden = int(ckpt.get("hidden_size", 256))
        from avlen_tpu.dialog.speaker.speaker import GEOM_DIM, NUM_CATEGORIES

        want_feat = GEOM_DIM + NUM_CATEGORIES + (pano.shape[-1] if pano is not None else 0)
        have_feat = int(ckpt.get("world_feat_dim", want_feat))
        if have_feat != want_feat:
            raise ValueError(
                f"speaker checkpoint world_feat_dim={have_feat} does not match the "
                f"configured feature layout ({want_feat}); check SPEAKER.USE_PANO_FEATURES"
            )
    return Speaker(
        positions, backend="neural", vocab=vocab, neural_params=neural_params,
        hidden_size=hidden, pano_features=pano,
    )


class HostSpeakerInstructionSource:
    """Per-query host speaker via io_callback (reference: on-demand
    Speaker.generate_instr, speaker_pipeline.py:110-124).

    Called once per scan step with the full env batch; only envs whose
    `newly` flag is set are computed (queries are rare — ≤3/episode), and
    every computed (scene, node, rot, goal) is memoized, so steady-state
    host work is near zero. Works inside `lax.scan` and under `shard_map`
    (each shard calls with its local batch).
    """

    def __init__(
        self,
        speaker: Speaker,
        tables_list: Sequence,
        context_length: int = CONTEXT_LENGTH,
    ):
        self.speaker = speaker
        self.tables = list(tables_list)
        self.context_length = context_length
        self._cache = {}
        self._stop_tokens = tokenize(["stop here"])[0].astype(np.int32)
        self.host_calls = 0  # instrumentation (tests/bench)

    # -- host side ------------------------------------------------------
    def _lookup(self, s: int, n: int, r: int, g: int) -> np.ndarray:
        key = (s, n, r, g)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        t = self.tables[s]
        path = shortest_path_prefix(t, n, g, max_len=APP_PATH_LEN + 1)
        if len(path) < 2:
            toks = self._stop_tokens
        else:
            heading = (270 - r * 90) % 360
            text = self.speaker.instruction_text(
                [{"heading": heading, "scene": s, "path": path}]
            )[0]
            toks = tokenize([text], context_length=self.context_length)[0].astype(np.int32)
        self._cache[key] = toks
        return toks

    def _host_tokens(self, scene, node, rot, goal, newly) -> np.ndarray:
        scene, node, rot, goal = (np.asarray(x) for x in (scene, node, rot, goal))
        newly = np.asarray(newly)
        out = np.zeros((newly.shape[0], self.context_length), np.int32)
        idx = np.nonzero(newly)[0]
        if idx.size:
            self.host_calls += 1
            for i in idx:
                out[i] = self._lookup(int(scene[i]), int(node[i]), int(rot[i]), int(goal[i]))
        return out

    # -- device side ----------------------------------------------------
    def __call__(self, env_state, newly: jax.Array) -> jax.Array:
        b = newly.shape[0]
        return jax.experimental.io_callback(
            self._host_tokens,
            jax.ShapeDtypeStruct((b, self.context_length), jnp.int32),
            env_state.scene, env_state.node, env_state.rot, env_state.goal_node,
            newly,
            ordered=False,
        )


class CachedInstrRequest:
    """Marker returned by `resolve_instruction_source` when instructions
    should be served through the chunked prefetch cache
    (dialog/instr_prefetch.py): the caller (a chunk-aware trainer) builds
    the `HostInstrPrefetcher` + `CachedInstrSource` around this speaker and
    its ChunkedCollector drives the cache between chunk scans."""

    def __init__(self, speaker: Speaker):
        self.speaker = speaker


def resolve_instruction_source(
    cfg, tables_list, rgb_bank=None, allow_cached: bool = False
) -> Tuple[Optional[np.ndarray], Optional[object]]:
    """(bank, source) — exactly one is non-None; ``source`` is either a
    `HostSpeakerInstructionSource` (per-query io_callback) or, when
    ``allow_cached``, a `CachedInstrRequest` (chunk-boundary prefetch).

    BANK_MODE auto banks small worlds and falls back to the host-callback
    source when any scene exceeds MAX_BANK_NODES (an O(N²) bank at real
    Matterport sizes would be ~300 MB + ~1M speaker calls per scene). On
    callback-less backends, chunk-aware trainers (``allow_cached=True``)
    get the prefetch-cache source instead — the route that lets full AVLEN
    train at real-Matterport scale on this TPU; BANK_MODE 'cached' forces it
    (tests/CI exercise the path even where callbacks work).
    """
    from avlen_tpu.utils.logging import logger
    from avlen_tpu.utils.platform import host_callbacks_supported

    speaker = speaker_from_config(cfg, tables_list, rgb_bank=rgb_bank)
    mode = cfg.SPEAKER.BANK_MODE
    n_max = max(t.num_nodes for t in tables_list)
    if mode == "cached" and not allow_cached:
        raise RuntimeError(
            "SPEAKER.BANK_MODE 'cached' serves instructions through the "
            "chunked-rollout prefetch cache, which only chunk-aware trainers "
            "on the host-prefetch audio path provide (TPU.HOST_PREFETCH + "
            "savi/ddppo trainers). Use bank/callback/auto here."
        )
    if mode == "auto":
        mode = "bank" if n_max <= cfg.SPEAKER.MAX_BANK_NODES else "callback"
    if mode == "callback" and not host_callbacks_supported():
        # Backends without host send/recv (e.g. tunneled single-chip PJRT)
        # cannot run io_callback; chunk-aware trainers take the prefetch
        # cache, others bank when that is still tractable.
        bank_mb = len(tables_list) * n_max * n_max * 4 * CONTEXT_LENGTH * 4 / 2**20
        if allow_cached and cfg.SPEAKER.BANK_MODE != "callback":
            logger.info(
                "host callbacks unsupported on backend '%s'; serving "
                "instructions through the chunked prefetch cache (N=%d)"
                % (jax.default_backend(), n_max)
            )
            mode = "cached"
        elif cfg.SPEAKER.BANK_MODE == "callback" or n_max > 4 * cfg.SPEAKER.MAX_BANK_NODES:
            raise RuntimeError(
                "SPEAKER instruction source resolved to the host-callback "
                f"speaker, but backend '{jax.default_backend()}' does not "
                "support host callbacks (io_callback). Use SPEAKER.BANK_MODE "
                "bank (feasible up to a few hundred nodes/scene) or run on a "
                f"callback-capable backend. (bank would be ~{bank_mb:.0f} MB "
                f"at N={n_max})"
            )
        else:
            logger.warning(
                "host callbacks unsupported on backend '%s'; banking instructions "
                "instead (N=%d > MAX_BANK_NODES=%d, ~%.0f MB)"
                % (jax.default_backend(), n_max, cfg.SPEAKER.MAX_BANK_NODES, bank_mb)
            )
            mode = "bank"
    if mode == "cached":
        return None, CachedInstrRequest(speaker)
    if mode == "bank":
        return build_instruction_bank(speaker, tables_list), None
    return None, HostSpeakerInstructionSource(speaker, tables_list)


def sub_instr_token_bank(episodes: Sequence, context_length: int = CONTEXT_LENGTH) -> Optional[np.ndarray]:
    """(E, 77) CLIP-token bank of per-episode dataset instructions.

    The reference's dialog pretraining tokenizes each episode's `sub_instr`
    (ppo_trainer.py:354-369); episodes without one fall back to the oracle
    bank at rollout time (marked by an all-zero row here). Returns None when
    no episode carries an instruction.
    """
    texts: List[str] = []
    any_instr = False
    for ep in episodes:
        s = getattr(ep, "sub_instr", None)
        texts.append(s or "")
        any_instr = any_instr or bool(s)
    if not any_instr:
        return None
    out = np.zeros((len(texts), context_length), np.int32)
    for i, s in enumerate(texts):
        if s:
            out[i] = tokenize([s], context_length=context_length)[0]
    return out
