"""Precomputed oracle-instruction token bank.

TPU-native redesign of the reference's online speaker invocation: the
reference calls the frozen R2R speaker + CLIP tokenizer on the host whenever
an agent queries (savi/ppo/ppo_trainer.py:549-562). Since the speaker is a
deterministic function of (scene, node, heading, goal) — the instruction
describes the ≤3-node prefix of the shortest path (ppo_trainer.py:538-548)
from the current pose — the *entire* instruction space of a scene set can be
precomputed into a token tensor

    tokens[scene, node, rot, goal_node] -> (77,) int32

and gathered on device at query time, which keeps the whole AVLEN
interactive rollout inside one `lax.scan` with zero host round-trips. For
scenes too large to bank, the Speaker can still be called per query via
io_callback (speaker.py stays host-capable).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from avlen_tpu.dialog.speaker.speaker import Speaker
from avlen_tpu.models.clip_text import CONTEXT_LENGTH, tokenize
from avlen_tpu.sim.graph import SceneTables

APP_PATH_LEN = 3  # reference keeps the first <=3 unique next nodes


def shortest_path_prefix(tables: SceneTables, node: int, goal: int, max_len: int = APP_PATH_LEN + 1) -> List[int]:
    """Path [node, next, ...] truncated like the reference's gt_app_path
    (ppo_trainer.py:538-548: first element + up to 3 unique successors)."""
    path = [node]
    cur = node
    for _ in range(max_len - 1):
        nxt = int(tables.oracle_next[cur, goal])
        if nxt < 0 or nxt in path:
            break
        path.append(nxt)
        cur = nxt
    return path


def build_instruction_bank(
    speaker: Speaker,
    tables_list: Sequence[SceneTables],
    categories: Optional[np.ndarray] = None,
    context_length: int = CONTEXT_LENGTH,
    speaker_batch: int = 512,
) -> np.ndarray:
    """(S, N_max, 4, N_max, 77) int32 CLIP-token bank.

    ``rot`` indexes rotation_angle//90; heading passed to the speaker is the
    agent orientation in degrees ((270 - rot*90) % 360, simulator.py:595-597).
    Speaker calls are batched (``speaker_batch`` items at a time) so the
    neural backend runs its jitted rollout over large batches rather than
    item-by-item.
    """
    s = len(tables_list)
    n_max = max(t.num_nodes for t in tables_list)
    bank = np.zeros((s, n_max, 4, n_max, context_length), np.int32)
    stop_tokens = tokenize(["stop here"])[0]

    items: List[dict] = []
    slots: List[tuple] = []
    tok_cache: dict = {}  # template texts repeat heavily across (node, goal)

    def flush():
        if not items:
            return
        texts = speaker.instruction_text(items)
        fresh = sorted({t for t in texts if t not in tok_cache})
        if fresh:
            for t, tk in zip(fresh, tokenize(fresh, context_length=context_length)):
                tok_cache[t] = tk
        for (si, node, rot, goal), text in zip(slots, texts):
            bank[si, node, rot, goal] = tok_cache[text]
        items.clear()
        slots.clear()

    for si, t in enumerate(tables_list):
        n = t.num_nodes
        for goal in range(n):
            for node in range(n):
                path = shortest_path_prefix(t, node, goal)
                for rot in range(4):
                    if len(path) < 2:
                        bank[si, node, rot, goal] = stop_tokens
                        continue
                    heading = (270 - rot * 90) % 360
                    items.append({"heading": heading, "scene": si, "path": path})
                    slots.append((si, node, rot, goal))
                    if len(items) >= speaker_batch:
                        flush()
    flush()
    return bank


def build_instruction_bank_fast(
    tables_list: Sequence[SceneTables],
    context_length: int = CONTEXT_LENGTH,
) -> np.ndarray:
    """Template-backend bank without a Speaker object (vectorized-ish)."""
    speaker = Speaker([t.positions for t in tables_list], backend="template")
    return build_instruction_bank(speaker, tables_list, context_length=context_length)
