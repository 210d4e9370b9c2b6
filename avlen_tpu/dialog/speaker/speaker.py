"""Speaker service: oracle instruction generation.

Capability match for `Speaker` (ss_baselines/savi/dialog/speaker/tasks/R2R/
speaker_pipeline.py:89-152): `generate_instr(batch)` takes
{heading, scene, path} items and returns {'words': [...]} — invoked by the
trainer only when the agent queries (≤3 times/episode,
savi/ppo/ppo_trainer.py:549-562), so it runs off the hot path.

Two back ends:
* 'template' (default): deterministic path→language synthesis
  (templates.py) — the ground-truth language channel of the synthetic world.
* 'neural': the Flax Seq2SeqSpeaker (model.py) trained to imitate the
  templates (dialog/speaker/train_speaker.py), mirroring the reference's
  pretrained R2R speaker usage.

The MatterSim pose machinery the reference drives for panorama scans
(env.py:132-235) is replaced by the native graph engine
(avlen_tpu/native/graph_engine) + scene tables; no GL needed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from avlen_tpu.dialog.speaker.templates import generate_template_instruction
from avlen_tpu.dialog.speaker.vocab import Vocabulary

MAX_PATH_LEN = 16
GEOM_DIM = 8  # per-step geometry features
NUM_CATEGORIES = 21  # optional goal-category conditioning block


class Speaker:
    def __init__(
        self,
        positions_per_scene: Sequence[np.ndarray],
        backend: str = "template",
        vocab: Optional[Vocabulary] = None,
        neural_params=None,
        hidden_size: int = 256,
        pano_features=None,
        beam_size: int = 1,
    ):
        """``pano_features``: optional (S, N, 4, D) visual feature bank from
        pano_features.precompute_panorama_features — the counterpart of the
        reference's precomputed ResNet-152 panorama features (R2R env.py:
        40-74); when present, world features become geometry ⊕ the
        heading-aligned view feature of each traversed node."""
        self.positions = [np.asarray(p) for p in positions_per_scene]
        self.backend = backend
        self.vocab = vocab or Vocabulary()
        self.neural_params = neural_params
        self.pano = np.asarray(pano_features) if pano_features is not None else None
        # geometry ⊕ goal-category one-hot (zeros when the item carries no
        # category — path-only instructions, the reference's R2R speaker
        # regime) ⊕ optional panorama view features
        self.feat_dim = GEOM_DIM + NUM_CATEGORIES + (
            self.pano.shape[-1] if self.pano is not None else 0
        )
        self.beam_size = int(beam_size)
        self._model = None
        self._rollout_jit = None
        if backend == "neural":
            self._init_neural(hidden_size)

    def _init_neural(self, hidden_size: int) -> None:
        import jax

        from avlen_tpu.dialog.speaker.model import Seq2SeqSpeaker

        self._model = Seq2SeqSpeaker(
            vocab_size=len(self.vocab), hidden_size=hidden_size, world_feat_dim=self.feat_dim
        )
        if self.neural_params is None:
            acts = np.zeros((1, MAX_PATH_LEN), np.int32)
            feats = np.zeros((1, MAX_PATH_LEN, self.feat_dim), np.float32)
            self.neural_params = self._model.init(
                jax.random.key(0), acts, feats, np.ones((1,), np.int32),
                self.vocab.bos_id, self.vocab.eos_id, method=Seq2SeqSpeaker.rollout,
            )
        if self.beam_size > 1:
            self._rollout_jit = jax.jit(
                lambda p, a, f, l: self._model.apply(
                    p, a, f, l, self.vocab.bos_id, self.vocab.eos_id,
                    self.beam_size, method=Seq2SeqSpeaker.beam_rollout,
                )
            )
        else:
            self._rollout_jit = jax.jit(
                lambda p, a, f, l: self._model.apply(
                    p, a, f, l, self.vocab.bos_id, self.vocab.eos_id, method=Seq2SeqSpeaker.rollout
                )
            )

    # ------------------------------------------------------------------
    def path_features(self, scene: int, path: Sequence[int], heading_deg: int,
                      category: Optional[int] = None):
        """Per-step (action ids, world features) for the neural speaker.
        With a panorama bank, each step's feature is geometry ⊕ the view
        feature of the node being left, aligned to the walking direction
        (R2R env heading-aligned feature selection, env.py:155-235).
        ``category``: optional goal category id — conditions the landmark
        phrasing of the template channel ("to reach the <category>"); when
        None the one-hot block stays zero (path-only instructions)."""
        pos = self.positions[scene]
        acts = np.zeros((MAX_PATH_LEN,), np.int32)
        feats = np.zeros((MAX_PATH_LEN, self.feat_dim), np.float32)
        orient = heading_deg % 360
        n = 0
        for a, b in zip(path[:-1], path[1:]):
            if n >= MAX_PATH_LEN:
                break
            p1, p2 = pos[a], pos[b]
            direction = int(np.around(np.rad2deg(np.arctan2(p2[2] - p1[2], p2[0] - p1[0])))) % 360
            delta = (direction - orient) % 360
            acts[n] = {0: 1, 90: 3, 180: 4, 270: 2}.get(delta, 1)  # fwd/left/right/around
            feats[n, :3] = p2 - p1
            feats[n, 3] = np.cos(np.deg2rad(direction))
            feats[n, 4] = np.sin(np.deg2rad(direction))
            feats[n, 5] = n / MAX_PATH_LEN
            if category is not None and 0 <= int(category) < NUM_CATEGORIES:
                feats[n, GEOM_DIM + int(category)] = 1.0
            if self.pano is not None:
                from avlen_tpu.dialog.speaker.pano_features import heading_to_rot_index

                rot = int(heading_to_rot_index(direction))
                feats[n, GEOM_DIM + NUM_CATEGORIES:] = self.pano[scene, a, rot]
            orient = direction
            n += 1
        return acts, feats, max(n, 1)

    def generate_instr(self, batch: List[Dict]) -> List[Dict]:
        """batch items: {'heading': deg, 'scene': int, 'path': [nodes],
        'category': optional int}. Returns [{'words': [...]}] per item
        (shape of speaker_pipeline.generate_instr outputs)."""
        outs: List[Dict] = []
        if self.backend == "template" or self._model is None:
            for item in batch:
                words = generate_template_instruction(
                    self.positions[item["scene"]],
                    item["path"],
                    int(item["heading"]),
                    item.get("category"),
                )
                outs.append({"words": words})
            return outs

        acts = np.zeros((len(batch), MAX_PATH_LEN), np.int32)
        feats = np.zeros((len(batch), MAX_PATH_LEN, self.feat_dim), np.float32)
        lens = np.zeros((len(batch),), np.int32)
        for i, item in enumerate(batch):
            acts[i], feats[i], lens[i] = self.path_features(
                item["scene"], item["path"], int(item["heading"]), item.get("category")
            )
        ids = np.asarray(self._rollout_jit(self.neural_params, acts, feats, lens))
        for i in range(len(batch)):
            outs.append({"words": self.vocab.decode(ids[i])})
        return outs

    def instruction_text(self, batch: List[Dict]) -> List[str]:
        return [" ".join(o["words"]) for o in self.generate_instr(batch)]
