"""Offline ambisonic → binaural RIR conversion (JAX batch job).

Replaces the reference's prebuilt AmbisonicBinauralizer ELF binary driven per
scene × angle by subprocess (scripts/ambisonic_to_binaural.py:16-47 invoking
`AmbisonicBinauralizer -i <ambi dir> -o <out dir> -a <angle>`): first-order
B-format RIRs (W, Y, Z, X channels) are rotated about the vertical axis for
each head orientation {0, 90, 180, 270}° and decoded to a binaural pair with
opposing virtual cardioids — one fused jit over the whole scene's RIR bank
instead of a process per file.

Usage:
  python scripts/ambisonic_to_binaural.py --input ambi.npy --output out_dir
    [--angles 0 90 180 270]

`ambi.npy` holds (num_rirs, 4, L) float32 B-format RIRs; outputs
`out_dir/<angle>.npy` with (num_rirs, L, 2) binaural RIRs.
"""

from __future__ import annotations

import argparse
import functools
import os

import numpy as np


@functools.partial(__import__("jax").jit, static_argnames=())
def ambisonic_to_binaural(ambi, angle_deg):
    """ambi (B, 4, L) channels (W, Y, Z, X) ACN/FuMa-style first order;
    angle scalar degrees. Returns (B, L, 2)."""
    import jax.numpy as jnp

    w, y, _, x = ambi[:, 0], ambi[:, 1], ambi[:, 2], ambi[:, 3]
    th = jnp.deg2rad(angle_deg)
    # rotate the horizontal sound field by -angle (head turns by +angle)
    x_r = x * jnp.cos(th) + y * jnp.sin(th)
    y_r = -x * jnp.sin(th) + y * jnp.cos(th)
    # virtual cardioids at ±90° (left = +y axis)
    left = 0.5 * (w * jnp.sqrt(2.0) + y_r)
    right = 0.5 * (w * jnp.sqrt(2.0) - y_r)
    del x_r
    return jnp.stack([left, right], axis=-1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="(N, 4, L) float32 .npy of B-format RIRs")
    p.add_argument("--output", required=True)
    p.add_argument("--angles", type=int, nargs="+", default=[0, 90, 180, 270])
    args = p.parse_args()

    import jax.numpy as jnp

    ambi = jnp.asarray(np.load(args.input))
    os.makedirs(args.output, exist_ok=True)
    for angle in args.angles:
        out = np.asarray(ambisonic_to_binaural(ambi, jnp.float32(angle)))
        np.save(os.path.join(args.output, f"{angle}.npy"), out)
        print(f"wrote {args.output}/{angle}.npy {out.shape}")


if __name__ == "__main__":
    main()
