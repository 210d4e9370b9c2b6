"""Offline belief-predictor pretraining (label classifier + location regressor).

Capability match for ss_baselines/savi/pretraining/{audiogoal_predictor,
audiogoal_trainer,audiogoal_dataset}.py: supervised training of the goal
descriptor network directly from RIRs + source sounds, with spectrograms
synthesized on the fly (audiogoal_dataset.py:119-160). Here the sampling,
rendering (fused conv+STFT) and the train step are all jitted device work —
one program per batch instead of a CPU DataLoader.

The trained checkpoint is consumed by the SAVi/AVLEN trainers via
RL.PPO.BELIEF_PREDICTOR.pretrained_path.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avlen_tpu.models.belief_predictor import BeliefPredictorNet
from avlen_tpu.ops.audio import render_audiogoal
from avlen_tpu.sim.scene import SceneBank
from avlen_tpu.utils.checkpoint import save_checkpoint
from avlen_tpu.utils.logging import logger


def make_sampler(bank: SceneBank, batch: int, num_categories: int = 21):
    """Jitted sampler: random (scene, receiver, source, rotation, sound) →
    (spectrogram, category target, relative-location target). The bank is a
    pytree jit ARGUMENT (bound via closure at the call wrapper) so its
    tensors never lower as HLO literals (utils/hoist.py rationale)."""
    s = bank.tables["positions"].shape[0]

    def sample_impl(bank, key):
        tables = bank.tables
        ks = jax.random.split(key, 6)
        scene = jax.random.randint(ks[0], (batch,), 0, s)
        n = tables["num_nodes"][scene]
        recv = jax.random.randint(ks[1], (batch,), 0, 10**6) % n
        src = jax.random.randint(ks[2], (batch,), 0, 10**6) % n
        rot = jax.random.randint(ks[3], (batch,), 0, 4)
        sound = jax.random.randint(ks[4], (batch,), 0, bank.sounds_padded.shape[0])

        az = (4 - rot) % 4
        rir = bank.rir.gather(scene, az, recv, src)
        _, spec = render_audiogoal(
            bank.sounds_padded[sound],
            jnp.zeros((batch,), jnp.int32),
            rir,
            jnp.ones((batch,), bool),
            bank.sampling_rate,
        )
        category = sound % num_categories

        # location target in agent base frame (X forward, Y rightward),
        # matching the belief predictor's frame (belief_predictor.py:155-160)
        d = tables["positions"][scene, src] - tables["positions"][scene, recv]
        th = rot.astype(jnp.float32) * (jnp.pi / 2)
        fwd = -d[:, 0] * jnp.sin(th) - d[:, 2] * jnp.cos(th)
        rgt = d[:, 0] * jnp.cos(th) - d[:, 2] * jnp.sin(th)
        loc = jnp.stack([fwd, rgt], axis=1)
        return spec, category, loc

    sample_j = jax.jit(sample_impl)
    sampler = lambda key: sample_j(bank, key)
    sampler.impl = sample_impl  # for embedding in a larger jit with bank as arg
    return sampler


def train_audiogoal_predictor(
    bank: SceneBank,
    num_steps: int = 1000,
    batch: int = 64,
    lr: float = 1e-3,
    num_categories: int = 21,
    checkpoint_dir: Optional[str] = None,
    log_interval: int = 50,
    seed: int = 0,
):
    """Returns (params, final metrics dict)."""
    net = BeliefPredictorNet(num_categories=num_categories)
    sampler = make_sampler(bank, batch, num_categories)
    key = jax.random.key(seed)
    spec, cat, loc = sampler(key)
    params = net.init(key, spec)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def loss_fn(p, spec, cat, loc):
        pred_loc, logits = net.apply(p, spec)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, cat).mean()
        mse = ((pred_loc - loc) ** 2).sum(-1).mean()
        acc = (jnp.argmax(logits, -1) == cat).mean()
        return ce + mse, {"ce": ce, "mse": mse, "acc": acc}

    @jax.jit
    def step(p, o, key, bank_arg):
        spec, cat, loc = sampler.impl(bank_arg, key)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, spec, cat, loc)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, aux

    t0 = time.time()
    aux = {}
    for i in range(num_steps):
        key, sub = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, sub, bank)
        if i % log_interval == 0:
            logger.info(
                f"audiogoal pretrain {i}: ce {float(aux['ce']):.3f} "
                f"mse {float(aux['mse']):.3f} acc {float(aux['acc']):.3f} "
                f"({(i + 1) * batch / (time.time() - t0):.0f} ex/s)"
            )
    metrics = {k: float(v) for k, v in aux.items()}
    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, "label_predictor.pth", {"state_dict": params, "metrics": metrics})
    return params, metrics


def main() -> None:
    import argparse

    from avlen_tpu.sim.synthetic import make_scene_bank

    p = argparse.ArgumentParser()
    p.add_argument("--output", default="data/pretrained_weights")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--side", type=int, default=8)
    args = p.parse_args()

    bank, _ = make_scene_bank(np.random.RandomState(0), num_scenes=args.scenes, side=args.side)
    os.makedirs(args.output, exist_ok=True)
    _, metrics = train_audiogoal_predictor(
        bank, num_steps=args.steps, batch=args.batch, checkpoint_dir=args.output
    )
    logger.info(f"done: {metrics}")


if __name__ == "__main__":
    main()
