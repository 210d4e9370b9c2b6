"""Checkpoint save/load.

Parity with the reference checkpoint behavior (ss_baselines/savi/ppo/
ppo_trainer.py:193-275): ``ckpt.{i}.pth`` files holding model state + config
snapshot + extra_state, folder polling for eval (common/utils.py:159-186),
and resume scanning. Payloads are numpy-ified JAX pytrees via pickle.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(folder: str, name: str, payload: Dict[str, Any]) -> str:
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, name)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(payload), f)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


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
