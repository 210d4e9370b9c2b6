"""Microbenchmark the RIR-spectra gather → product → partial-irfft chain on
the real TPU, mimicking the rollout's data flow (table gather feeding
binaural_convolve), to A/B layout strategies without a full superstep
compile. Prints per-variant ms/call and the big relayout copies found in the
compiled HLO.

Usage: python scripts/probe_irfft_layout.py [--rows 64] [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def big_copies(compiled_text: str, min_mb: float = 4.0):
    """Relayout copies over `min_mb` in the optimized HLO."""
    out = []
    for m in re.finditer(r"%?\S*copy[\S.]* = (\w+)\[([\d,]+)\]\{([^}]*)\} copy\(", compiled_text):
        dt, dims, layout = m.groups()
        sz = np.prod([int(d) for d in dims.split(",")]) * (2 if dt == "bf16" else 4)
        if sz / 1e6 >= min_mb:
            out.append(f"{dt}[{dims}]{{{layout}}} ({sz/1e6:.0f}MB)")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    from avlen_tpu.ops import audio as A

    B = args.rows
    sr = 16000
    rir_len = 16384
    fft_len = A._conv_fft_len(sr, rir_len)  # 65536
    F = fft_len // 2 + 1
    N = 96  # table entries

    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    table_re = jax.device_put(jax.random.normal(k1, (N, 2, F), jnp.float32))
    table_im = jax.device_put(jax.random.normal(k2, (N, 2, F), jnp.float32))
    seg_re = jax.device_put(jax.random.normal(k3, (N, F), jnp.float32))
    seg_im = jax.device_put(jax.random.normal(k4, (N, F), jnp.float32))
    idx = jax.device_put(jnp.arange(B, dtype=jnp.int32) % N)

    def chain(idx):
        rir_f = jax.lax.complex(table_re[idx], table_im[idx])  # (B,2,F)
        seg_f = jax.lax.complex(seg_re[idx], seg_im[idx])  # (B,F)
        prod = seg_f[:, None, :] * rir_f
        return A._convolve_from_fft(prod, rir_len, sr, fft_len)

    fn = jax.jit(chain)
    lowered = fn.lower(idx)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print("== big relayout copies in HLO:")
    for c in big_copies(txt):
        print("  ", c)

    out = fn(idx)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(args.iters):
        out = fn(idx)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / args.iters * 1e3
    print(f"== chain: {dt:.3f} ms/call  out{out.shape} backend={jax.default_backend()}")




def probe_real_bank(iters: int = 20):
    """Same probe through the REAL ProceduralRIRBank.gather_fft +
    render_audiogoal path (the superstep's audio subgraph), with an HLO dump
    to identify layout-forcing consumers."""
    import jax
    import jax.numpy as jnp

    from avlen_tpu.ops.audio import SpectrogramConfig, render_audiogoal
    from avlen_tpu.sim.synthetic import make_scene_bank

    bank, _ = make_scene_bank(
        np.random.RandomState(0), num_scenes=1, side=5, rir_length=16384,
        sampling_rate=16000, num_sounds=2, with_frames=False,
    )
    bank.rir.ensure_tables()
    B = 64
    n = int(bank.tables["num_nodes"][0])
    cfg = SpectrogramConfig(sampling_rate=bank.sampling_rate)

    def step(node, goal, sound, t):
        az = jnp.zeros((B,), jnp.int32)
        rir_f = bank.rir.gather_fft(jnp.zeros((B,), jnp.int32), az, node, goal)
        seg_f = None
        if bank.sound_fft_bank is not None:
            s_max = bank.sound_fft_bank.shape[1]
            seg_f = bank.sound_fft_bank[sound, jnp.clip(t, 0, s_max - 1)]
        audio, spec = render_audiogoal(
            bank.sounds_padded[sound], t, None, jnp.ones((B,), bool),
            bank.sampling_rate, config=cfg, rir_f=rir_f, seg_f=seg_f,
            rir_len=bank.rir.length,
        )
        return audio, spec

    fn = jax.jit(step)
    key = np.random.RandomState(1)
    node = jax.device_put(jnp.asarray(key.randint(0, n, B), jnp.int32))
    goal = jax.device_put(jnp.asarray(key.randint(0, n, B), jnp.int32))
    sound = jax.device_put(jnp.asarray(key.randint(0, 2, B), jnp.int32))
    t = jax.device_put(jnp.zeros((B,), jnp.int32))
    txt = fn.lower(node, goal, sound, t).compile().as_text()
    print("== big relayout copies in HLO (real-bank path):")
    for c in big_copies(txt):
        print("  ", c)
    # find tiny-slice fusions consuming big arrays
    for m in re.finditer(r"%\S*fusion\S* = \S*\[([\d,]*)\][^\n]*fusion\(([^)]*)\)", txt):
        outdims, ops = m.groups()
        osz = np.prod([int(d) for d in outdims.split(",") if d]) if outdims else 1
        if osz <= 1024 and "32769" in ops:
            print("  tiny-slice consumer:", m.group(0)[:220])

    out = fn(node, goal, sound, t)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(node, goal, sound, t)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"== real-bank render: {dt:.3f} ms/call")
    return txt


if __name__ == "__main__":
    import sys as _s
    if "--real-bank" in _s.argv:
        txt = probe_real_bank()
        open("/tmp/real_bank_hlo.txt", "w").write(txt)
    else:
        main()
