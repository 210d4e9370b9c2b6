"""Experiment CLI.

Mirrors the reference entry point (ss_baselines/savi/run.py:25-158 and
av_nav/run.py): ``python -m avlen_tpu.run --run-type {train,eval}
--exp-config <yaml> [--model-dir DIR] [KEY VALUE ...]``, trainer selected by
``TRAINER_NAME`` from the registry, eval-best via tensorboard scan.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

# register trainers
import avlen_tpu.rl.trainers  # noqa: F401
from avlen_tpu.config import get_config
from avlen_tpu.core.registry import registry
from avlen_tpu.utils.logging import logger


def find_best_ckpt_idx(event_dir_path: str, scalar: str = "val/spl"):
    """Pick the checkpoint index with the best eval scalar from TB event files
    (run.py:126-154)."""
    from tensorboardX.event_file_writer import EventFileWriter  # noqa: F401  (presence check)
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(event_dir_path)
    acc.Reload()
    if scalar not in acc.Tags().get("scalars", []):
        return None
    events = acc.Scalars(scalar)
    best = max(events, key=lambda e: e.value)
    return best.step


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache shared by every CLI entry (repo-local)."""
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main(argv: Optional[List[str]] = None) -> None:
    _enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--run-type", choices=["train", "eval"], default="train")
    parser.add_argument("--exp-config", type=str, default=None)
    parser.add_argument("--model-dir", type=str, default=None)
    parser.add_argument("--eval-best", action="store_true", default=False)
    parser.add_argument("--overwrite", action="store_true", default=False)
    parser.add_argument("--prev-ckpt-ind", type=int, default=-1)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    config = get_config(
        args.exp_config, args.opts or None, args.model_dir, args.run_type, args.overwrite
    )
    trainer_cls = registry.get_trainer(config.TRAINER_NAME)
    trainer = trainer_cls(config)

    os.makedirs(config.MODEL_DIR, exist_ok=True)
    if config.LOG_FILE:
        os.makedirs(os.path.dirname(config.LOG_FILE) or ".", exist_ok=True)
        logger.add_filehandler(config.LOG_FILE)

    if args.run_type == "train":
        trainer.train()
    else:
        if args.eval_best:
            best = find_best_ckpt_idx(config.TENSORBOARD_DIR)
            if best is not None:
                logger.info(f"best checkpoint index: {best}")
        trainer.eval()


if __name__ == "__main__":
    main()
