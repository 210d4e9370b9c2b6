"""Checkpoint save/load.

Parity with the reference checkpoint behavior (ss_baselines/savi/ppo/
ppo_trainer.py:193-275): ``ckpt.{i}.pth`` files holding model state + config
snapshot + extra_state (+ optimizer states, matching the interrupted-state
payload of ddp_utils.py:70-99), folder polling for eval
(common/utils.py:159-186), and resume scanning.

Format: **data-only msgpack** via flax.serialization — arbitrary pytrees
(flax param dicts, optax NamedTuple states) are converted with
``to_state_dict`` and restored as nested dicts; no code execution on load
(unlike torch/pickle checkpoints). The ``.pth`` suffix is kept only for the
reference's folder-layout parity — these files are NOT torch checkpoints and
reference ``.pth`` files cannot be loaded.

Typed states (e.g. optax optimizer states) are restored into a live target
with `restore_into` (flax.serialization.from_state_dict).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    def conv(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return np.asarray(x)
        return x  # str/int/float/bool/None config leaves stay native

    return jax.tree.map(conv, tree)


def save_checkpoint(folder: str, name: str, payload: Dict[str, Any]) -> str:
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, name)
    payload = dict(payload)
    if "config" in payload and not isinstance(payload["config"], (str, bytes)):
        # snapshot the config as JSON: flax's to_state_dict turns lists into
        # {'0': ...} dicts, which corrupts list-valued keys (VIDEO_OPTION,
        # CONTENT_SCENES, HELD_OUT_SOUNDS) on the eval-time config re-merge
        payload["config"] = json.dumps(payload["config"])
    state = serialization.to_state_dict(_to_numpy(payload))
    blob = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: eval folder polling never sees partial files
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    cfg = state.get("config") if isinstance(state, dict) else None
    if isinstance(cfg, (str, bytes)):
        state["config"] = json.loads(cfg if isinstance(cfg, str) else cfg.decode())
    return state


def restore_into(target, state_dict):
    """Restore a msgpack-loaded nested dict into a typed pytree (e.g. an
    optax optimizer state) with the target's structure and leaf types."""
    return serialization.from_state_dict(target, state_dict)


def merge_matching_params(target, source):
    """Partial checkpoint load: copy ``source`` leaves into ``target`` where
    the same nested path exists with the same shape (the reference's
    filtered load_state_dict for cross-stage weight transfer, e.g. SMT
    pretraining → finetune, ss_baselines/savi/ppo/ppo_trainer.py:301-513 —
    stage nets differ in prediction heads / goal wiring). Returns
    (merged, copied_paths, skipped_paths)."""
    copied: List[str] = []
    skipped: List[str] = []

    def rec(t, s, path):
        if isinstance(t, dict) and isinstance(s, dict):
            out = {}
            for k, v in t.items():
                if k in s:
                    out[k] = rec(v, s[k], path + (k,))
                else:
                    skipped.append("/".join(path + (k,)))
                    out[k] = v
            return out
        ts = getattr(t, "shape", None)
        ss = getattr(s, "shape", None)
        if ts == ss:
            copied.append("/".join(path))
            if hasattr(s, "shape") and hasattr(t, "dtype"):
                # preserve the target's compute dtype: loading an f32 ckpt
                # into a bf16 tree (or vice versa) must not silently swap
                # leaf dtypes and force downstream retraces
                return jax.numpy.asarray(s, dtype=t.dtype)
            return jax.numpy.asarray(s) if hasattr(s, "shape") else s
        skipped.append("/".join(path))
        return t

    return rec(target, source, ()), copied, skipped


def poll_checkpoint_folder(folder: str, previous_index: int) -> Optional[str]:
    """Next ``ckpt.{i}.pth`` after previous_index (common/utils.py:159-186)."""
    paths = list_checkpoints(folder)
    ind = previous_index + 1
    if ind < len(paths):
        return paths[ind]
    return None


def list_checkpoints(folder: str) -> List[str]:
    paths = glob.glob(os.path.join(folder, "ckpt.*.pth"))

    def index(p):
        m = re.search(r"ckpt\.(\d+)\.pth", p)
        return int(m.group(1)) if m else -1

    return sorted(paths, key=index)
