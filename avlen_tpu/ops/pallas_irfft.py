"""Fused Pallas partial inverse rFFT for the TPU audio hot path.

``partial_irfft_pallas(spec, fft_len, out_start, out_len)`` computes
``jnp.fft.irfft(spec, n=fft_len)[..., out_start:out_start+out_len]`` — the
valid window of the RIR⊛source convolution (reference semantics:
soundspaces/simulator.py:659-680, the per-step ``fftconvolve`` it replaces).

Why a kernel and not XLA einsums (ops/audio.py:partial_irfft_matmul): the
einsum formulation leaves XLA free to propagate the stage-1 dot's transposed
operand layout backwards through the hermitian pack chain and the (n2, n1)
reshape to the RIR-spectra table gather, where it materializes as a
(2, B, 2, F) relayout copy tiled T(8,128) over the (B, ch=2) minor dims —
64× tile padding, ~3 ms/env-step, the single largest op in the r4 superstep
trace, surviving every reassociation of the einsums. A pallas_call is a
custom call with pinned (row-major) operand layouts, so the gather side
keeps its natural F-minor layout by construction, and the pack → stage-1 →
twiddle → stage-2 pipeline runs entirely in VMEM, eliminating the ~4 HBM
round trips of ~33 MB the XLA path materializes between those ops.

Structure (same math as partial_irfft_matmul, all tables precomputed):
  * hermitian pack to a half-length complex sequence, split as re/im f32
    planes (TPU c64 is emulated; real arithmetic keeps layouts trivial);
  * radix-√H Cooley-Tukey: stage 1 contracts n2 with the DFT table passed
    PRE-TRANSPOSED (c1ᵀ = Mᵀ @ packed), the twiddle is applied in the
    transposed (m, k1) frame, and stage 2 contracts k1 on the right
    (zᵀ = dᵀ @ e2ᵀ) — so the kernel needs no in-kernel transposes at all;
  * only the j-rows covering [out_start, out_start+out_len) are produced.
The (m, j) → (j, m) fixup, the re/im interleave (y[2t], y[2t+1] = Re/Im z)
and the final slice run in XLA on the small output (≤ a few MB).

The X[H-k] reversal is materialized OUTSIDE the kernel as an XLA ``rev`` on
the minor axis (~0.06 ms/step measured) — Mosaic flips on the lane dim are
not relied upon.

Exactness vs jnp.fft.irfft is pinned by tests/test_partial_irfft.py (same
golden suite as the einsum path, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _pallas_irfft_consts(fft_len: int, out_start: int, out_len: int):
    """Pre-transposed f32 re/im tables (numpy) for the kernel."""
    from avlen_tpu.ops.audio import _ct_factors

    n = fft_len
    h = n // 2
    n1, n2 = _ct_factors(h)
    t0 = out_start // 2
    t1 = (out_start + out_len + 1) // 2
    j0, j1 = t0 // n1, (t1 - 1) // n1 + 1
    jwin = j1 - j0
    jp = _roundup(jwin, 8)

    k = np.arange(h).reshape(n2, n1)
    pack = np.exp(2j * np.pi * k / n)  # (n2, n1)
    # stage 1 table, pre-transposed: Mt[m, k2] = e^{2πi k2 m / n2}
    mt = np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n2)
    # twiddle in the transposed (m, k1) frame: twt[m, k1] = e^{2πi k1 m / h}
    twt = np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / h)
    # stage 2 table, pre-transposed + 1/h folded + j-padded:
    # e2t[k1, j] = e^{2πi j k1 / n2} / h for j in [j0, j1), zeros beyond
    e2t = np.zeros((n1, jp), np.complex128)
    e2t[:, :jwin] = (
        np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(j0, j1)) / n2) / h
    )

    def ri(z):
        return (
            np.ascontiguousarray(z.real, np.float32),
            np.ascontiguousarray(z.imag, np.float32),
        )

    return dict(
        n1=n1, n2=n2, j0=j0, jwin=jwin, jp=jp,
        pack=ri(pack), mt=ri(mt), twt=ri(twt), e2t=ri(e2t),
    )


def _irfft_kernel(
    sre_ref, sim_ref, rre_ref, rim_ref,
    pc_ref, ps_ref, mtr_ref, mti_ref, twr_ref, twi_ref, e2r_ref, e2i_ref,
    zre_ref, zim_ref,
    *, rb: int, n1: int, n2: int,
):
    h = n1 * n2
    f32 = jnp.float32

    def cdot(a_re, a_im, a_sum, b_re, b_im, b_sum):
        """Karatsuba complex matmul: 3 MXU dots instead of 4.
        (a_re+i·a_im)@(b_re+i·b_im); *_sum = re+im (consts precomputed)."""
        p1 = jnp.dot(a_re, b_re, preferred_element_type=f32)
        p2 = jnp.dot(a_im, b_im, preferred_element_type=f32)
        p3 = jnp.dot(a_sum, b_sum, preferred_element_type=f32)
        return p1 - p2, p3 - p1 - p2

    mtr, mti = mtr_ref[:], mti_ref[:]
    mts = mtr + mti
    e2r, e2i = e2r_ref[:], e2i_ref[:]
    e2s = e2r + e2i
    pc, ps = pc_ref[:], ps_ref[:]  # (n2, n1)
    twr, twi = twr_ref[:], twi_ref[:]  # (n1, n1) == (m, k1)

    # The hermitian pack runs PER ROW inside the loop: full-block pack
    # temporaries (six (rb, n2, n1) f32 arrays) put the rb=8 / fft_len=2^16
    # configuration 620 KB over the 16 MB scoped-VMEM limit; per-row they
    # are (n2, n1) — under 1 MB live.
    for r in range(rb):
        # xk = X[k], k in [0, h); Q = conj(X[H-k]) (reversal done outside)
        xk_re = sre_ref[r, :h].reshape(n2, n1)
        xk_im = sim_ref[r, :h].reshape(n2, n1)
        q_re = rre_ref[r, :h].reshape(n2, n1)
        q_im = rim_ref[r, :h].reshape(n2, n1)  # conj folded into signs below
        d_re = xk_re - q_re
        d_im = xk_im + q_im
        # packed = 0.5*(xk + Q) + 0.5i * pack * (xk - Q)
        pr = 0.5 * ((xk_re + q_re) - pc * d_im - ps * d_re)
        pi = 0.5 * ((xk_im - q_im) + pc * d_re - ps * d_im)
        # stage 1 (transposed): c1t[m, k1] = Σ_k2 Mt[m, k2] · packed[k2, k1]
        # — Mt on the LEFT so the variable operand needs no transpose
        c1_re, c1_im = cdot(mtr, mti, mts, pr, pi, pr + pi)
        # twiddle in the (m, k1) frame
        d2_re = twr * c1_re - twi * c1_im
        d2_im = twr * c1_im + twi * c1_re
        # stage 2 (transposed): zt[m, j] = Σ_k1 d[m, k1] · e2t[k1, j]
        z_re, z_im = cdot(d2_re, d2_im, d2_re + d2_im, e2r, e2i, e2s)
        zre_ref[r] = z_re
        zim_ref[r] = z_im


def supported(fft_len: int) -> bool:
    """Tile-clean sizes: n1 a lane multiple, n2 a sublane multiple."""
    if fft_len < 16384 or fft_len & (fft_len - 1):
        return False
    from avlen_tpu.ops.audio import _ct_factors

    n1, n2 = _ct_factors(fft_len // 2)
    return n1 % 128 == 0 and n2 % 8 == 0


@functools.partial(
    jax.jit, static_argnames=("fft_len", "out_start", "out_len", "interpret")
)
def partial_irfft_pallas(
    spec: jax.Array,
    fft_len: int,
    out_start: int,
    out_len: int,
    interpret: bool = False,
) -> jax.Array:
    """jnp.fft.irfft(spec, n=fft_len)[..., out_start:out_start+out_len] on
    the MXU via one fused Pallas kernel. spec: (..., fft_len//2 + 1) c64."""
    c = _pallas_irfft_consts(fft_len, out_start, out_len)
    n1, n2, j0, jwin, jp = c["n1"], c["n2"], c["j0"], c["jwin"], c["jp"]
    h = n1 * n2

    lead = spec.shape[:-1]
    r = int(np.prod(lead)) if lead else 1
    # Mosaic requires the block sublane dim be a multiple of 8 or equal to
    # the array dim. rb=8 + per-row pack temporaries fits the 16 MB
    # scoped-VMEM limit at every fft_len this framework uses (full-block
    # pack temps overflowed it by 620 KB at fft_len 2^16).
    rb = 8 if r % 8 == 0 else r
    spec2 = spec.reshape(r, spec.shape[-1])
    s_re, s_im = jnp.real(spec2), jnp.imag(spec2)
    # X[H-k] source: reverse the FULL (h+1)-length axis outside the kernel
    # (minor-axis XLA rev) — rev_full[k] = X[h-k], and the kernel's (rb, h)
    # block reads exactly cols [0, h). Deliberately NOT the equivalent
    # spec[:, 1:h+1][:, ::-1]: an odd-offset h-slice makes XLA partition
    # every producer of the spectrum into [0,16384)+[16384,32768)+{32768}
    # pieces, and it materialized the 1-element Nyquist piece by relayouting
    # the whole 33 MB gather to F-major — the 921 ms copy, still present in
    # the r4d trace. Full-length rev keeps every consumer full-width.
    r_re = s_re[:, ::-1]
    r_im = s_im[:, ::-1]

    def cst(pair):
        return (jnp.asarray(pair[0]), jnp.asarray(pair[1]))

    pc, ps = cst(c["pack"])
    mtr, mti = cst(c["mt"])
    twr, twi = cst(c["twt"])
    e2r, e2i = cst(c["e2t"])

    row_block = pl.BlockSpec((rb, h), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    grid = (r // rb,)
    zre, zim = pl.pallas_call(
        functools.partial(_irfft_kernel, rb=rb, n1=n1, n2=n2),
        grid=grid,
        in_specs=[
            row_block, row_block,  # spec re/im: block reads cols [0, h)
            row_block, row_block,  # reversed planes (r, h)
            const_spec((n2, n1)), const_spec((n2, n1)),
            const_spec((n1, n2)), const_spec((n1, n2)),
            const_spec((n1, n1)), const_spec((n1, n1)),
            const_spec((n1, jp)), const_spec((n1, jp)),
        ],
        out_specs=[
            pl.BlockSpec((rb, n1, jp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n1, jp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, n1, jp), jnp.float32),
            jax.ShapeDtypeStruct((r, n1, jp), jnp.float32),
        ],
        interpret=interpret,
    )(s_re, s_im, r_re, r_im, pc, ps, mtr, mti, twr, twi, e2r, e2i)

    # (r, m, j) → (r, j, m), interleave re/im (y[2t], y[2t+1] = Re/Im z[t]),
    # slice the requested window — all on ≤ a few MB in XLA.
    zre_t = jnp.swapaxes(zre[:, :, :jwin], -1, -2)
    zim_t = jnp.swapaxes(zim[:, :, :jwin], -1, -2)
    y = jnp.stack([zre_t, zim_t], axis=-1).reshape(r, jwin * n1 * 2)
    off = out_start - 2 * j0 * n1
    y = jax.lax.slice_in_dim(y, off, off + out_len, axis=-1)
    return y.reshape(*lead, out_len)
