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


if __name__ == "__main__":
    main()
