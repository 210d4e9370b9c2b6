"""Fused Scene-Memory-Transformer encode as one Pallas TPU kernel.

The SMT encode (models/smt.py — capability match for
ss_baselines/savi/models/smt_state_encoder.py:23-281) is the hot model-side
op of every rollout step: each of the three interactive policies runs
fusion MLP → 1-layer encoder over the ~151-entry ring memory → 1-layer
decoder, i.e. ~10 small (L·D × D·D) matmuls with softmax/LayerNorm stitches.
Under plain XLA each matmul round-trips its (B, L, D) intermediate through
HBM; at rollout shapes that traffic — not FLOPs — bounds the step. This
kernel keeps the whole encode resident in VMEM: one read of the fused
entries + weights, one (B, D) write.

Layout notes (TPU):
* the batch is tiled over the Pallas grid (B_TILE rows per program) and the
  linear layers run on the (B_TILE·L, D) flattening so the MXU sees one
  big matmul instead of B small ones;
* attention runs per batch-row per head on 2-D (L, dh) slices — statically
  unrolled (B_TILE × nhead small MXU ops), masked with the same -1e9
  additive convention as the module;
* the decoder's single-query self-attention is algebraically collapsed:
  softmax over one key is exactly 1, so attn(tgt,tgt,tgt) = out(v(tgt));
* L is padded to a sublane multiple; padded rows carry valid=0 so they are
  masked out of every softmax, and the current-step row index (the
  decoder's no-goal query) is the static unpadded L-1.

Gradients: `smt_encode` is a custom_vjp whose forward is the kernel and
whose backward recomputes through `smt_encode_ref` (a pure-JAX mirror of
models/smt.py math on the raw param tree) — the PPO update differentiates
exactly; only the forward ride the fused path.

Parity: numerics are tested bit-close against `SMTStateEncoder.apply`
(tests/test_pallas_smt.py); the reference cost beaten is the 3-forwards-
per-step hot loop (ss_baselines/savi/ppo/ppo_trainer.py:323-897,
smt_state_encoder.py:109-188).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LN_EPS = 1e-6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# pure-JAX reference on the raw param tree (the module's math, verbatim) —
# the custom-vjp backward recomputes through this, and tests compare both
# paths against SMTStateEncoder.apply.
# ---------------------------------------------------------------------------


def _ln(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * p["scale"] + p["bias"]


def _mha_ref(p, q, k, v, key_valid):
    """models/smt.py MultiHeadAttention on raw params: q (B, Lq, D),
    k/v (B, Lk, D); DenseGeneral kernels are (D, H, dh) / out (H, dh, D)."""
    qh = jnp.einsum("bld,dhe->blhe", q, p["q"]["kernel"]) + p["q"]["bias"]
    kh = jnp.einsum("bld,dhe->blhe", k, p["k"]["kernel"]) + p["k"]["bias"]
    vh = jnp.einsum("bld,dhe->blhe", v, p["v"]["kernel"]) + p["v"]["bias"]
    dh = qh.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(dh).astype(qh.dtype)
    if key_valid is not None:
        logits = logits + jnp.where(key_valid[:, None, None, :], 0.0, NEG_INF).astype(logits.dtype)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
    return jnp.einsum("bqhd,hde->bqe", out, p["out"]["kernel"]) + p["out"]["bias"]


def _enc_layer_ref(p, src, valid):
    a = _mha_ref(p["MultiHeadAttention_0"], src, src, src, valid)
    src = _ln(src + a, p["LayerNorm_0"])
    f = src @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
    f = jax.nn.relu(f) @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]
    return _ln(src + f, p["LayerNorm_1"])


def _dec_layer_ref(p, tgt, mem, valid):
    a = _mha_ref(p["self_attn"], tgt, tgt, tgt, None)
    tgt = _ln(tgt + a, p["LayerNorm_0"])
    a = _mha_ref(p["cross_attn"], tgt, mem, mem, valid)
    tgt = _ln(tgt + a, p["LayerNorm_1"])
    f = tgt @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
    f = jax.nn.relu(f) @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]
    return _ln(tgt + f, p["LayerNorm_2"])


def smt_encode_ref(
    params,
    entries: jnp.ndarray,  # (B, L, F) fused memory entries + current step
    valid: jnp.ndarray,  # (B, L) 1 = attendable
    goal: Optional[jnp.ndarray],  # (B, D) decoder query, or None
    *,
    num_encoder_layers: int = 1,
    num_decoder_layers: int = 1,
) -> jnp.ndarray:
    h = entries @ params["fusion0"]["kernel"] + params["fusion0"]["bias"]
    h = jax.nn.relu(h) @ params["fusion1"]["kernel"] + params["fusion1"]["bias"]
    for i in range(num_encoder_layers):
        h = _enc_layer_ref(params[f"enc{i}"], h, valid)
    tgt = goal[:, None, :] if goal is not None else h[:, -1:, :]
    for i in range(num_decoder_layers):
        tgt = _dec_layer_ref(params[f"dec{i}"], tgt, h, valid)
    return tgt[:, 0, :].astype(jnp.float32)


# ---------------------------------------------------------------------------
# the fused kernel
# ---------------------------------------------------------------------------


def _flat_w(p):
    """DenseGeneral (D, H, dh) → (D, D) and (H, dh, D) → (D, D) etc., so the
    kernel sees plain 2-D matmuls; head slicing is static column slicing."""
    d = p["q"]["kernel"].shape[0]
    return dict(
        q_k=p["q"]["kernel"].reshape(d, -1), q_b=p["q"]["bias"].reshape(-1),
        k_k=p["k"]["kernel"].reshape(d, -1), k_b=p["k"]["bias"].reshape(-1),
        v_k=p["v"]["kernel"].reshape(d, -1), v_b=p["v"]["bias"].reshape(-1),
        o_k=p["out"]["kernel"].reshape(-1, d), o_b=p["out"]["bias"],
    )


def _kernel(
    entries_ref, valid_ref, goal_ref,  # (Bt, Lp, F), (Bt, Lp), (Bt, D)
    *refs,
    b_tile: int, l_pad: int, l_real: int, nhead: int, d_model: int,
    has_goal: bool, out_ref=None,
):
    """One grid program: the full SMT encode for b_tile batch rows."""
    (
        f0_k, f0_b, f1_k, f1_b,
        eq_k, eq_b, ek_k, ek_b, ev_k, ev_b, eo_k, eo_b,
        eln0_s, eln0_b, ef0_k, ef0_b, ef1_k, ef1_b, eln1_s, eln1_b,
        dsv_k, dsv_b, dso_k, dso_b,
        dq_k, dq_b, dk_k, dk_b, dv_k, dv_b, do_k, do_b,
        dln0_s, dln0_b, dln1_s, dln1_b,
        df0_k, df0_b, df1_k, df1_b, dln2_s, dln2_b,
    ) = refs[:-1]
    out_ref = refs[-1]
    dh = d_model // nhead
    scale = 1.0 / np.sqrt(dh).astype(np.float32)

    def ln(x, s_ref, b_ref):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * s_ref[:] + b_ref[:]

    # fusion MLP on the (Bt*Lp, F) flattening — one big MXU matmul
    e2 = entries_ref[:].reshape(b_tile * l_pad, -1)
    h = jnp.dot(e2, f0_k[:], preferred_element_type=jnp.float32) + f0_b[:]
    h = jnp.dot(jax.nn.relu(h), f1_k[:], preferred_element_type=jnp.float32) + f1_b[:]

    # ---- encoder layer ----
    q = jnp.dot(h, eq_k[:], preferred_element_type=jnp.float32) + eq_b[:]
    k = jnp.dot(h, ek_k[:], preferred_element_type=jnp.float32) + ek_b[:]
    v = jnp.dot(h, ev_k[:], preferred_element_type=jnp.float32) + ev_b[:]
    neg = jnp.where(valid_ref[:] > 0, 0.0, NEG_INF)  # (Bt, Lp)
    ctx_rows = []
    for b in range(b_tile):
        qb = q[b * l_pad : (b + 1) * l_pad]
        kb = k[b * l_pad : (b + 1) * l_pad]
        vb = v[b * l_pad : (b + 1) * l_pad]
        mask_b = neg[b][None, :]  # (1, Lp)
        heads = []
        for hd in range(nhead):
            qh = qb[:, hd * dh : (hd + 1) * dh]
            kh = kb[:, hd * dh : (hd + 1) * dh]
            vh = vb[:, hd * dh : (hd + 1) * dh]
            logits = (
                jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + mask_b
            )
            p = jax.nn.softmax(logits, axis=-1)
            heads.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
        ctx_rows.append(jnp.concatenate(heads, axis=-1))
    ctx = jnp.concatenate(ctx_rows, axis=0)  # (Bt*Lp, D)
    a = jnp.dot(ctx, eo_k[:], preferred_element_type=jnp.float32) + eo_b[:]
    h = ln(h + a, eln0_s, eln0_b)
    f = jnp.dot(h, ef0_k[:], preferred_element_type=jnp.float32) + ef0_b[:]
    f = jnp.dot(jax.nn.relu(f), ef1_k[:], preferred_element_type=jnp.float32) + ef1_b[:]
    h = ln(h + f, eln1_s, eln1_b)  # (Bt*Lp, D) — encoder output

    # ---- decoder layer (single query) ----
    if has_goal:
        tgt = goal_ref[:]  # (Bt, D)
    else:
        # current-step row (unpadded last index) of each batch element
        tgt = jnp.concatenate(
            [h[b * l_pad + (l_real - 1)][None, :] for b in range(b_tile)], axis=0
        )
    # single-query self-attn collapses to out(v(tgt)) — softmax over 1 key
    sv = jnp.dot(tgt, dsv_k[:], preferred_element_type=jnp.float32) + dsv_b[:]
    a = jnp.dot(sv, dso_k[:], preferred_element_type=jnp.float32) + dso_b[:]
    t1 = ln(tgt + a, dln0_s, dln0_b)
    # cross-attention: 1 query row per batch element over the Lp memory keys
    qd = jnp.dot(t1, dq_k[:], preferred_element_type=jnp.float32) + dq_b[:]
    kd = jnp.dot(h, dk_k[:], preferred_element_type=jnp.float32) + dk_b[:]
    vd = jnp.dot(h, dv_k[:], preferred_element_type=jnp.float32) + dv_b[:]
    rows = []
    for b in range(b_tile):
        kb = kd[b * l_pad : (b + 1) * l_pad]
        vb = vd[b * l_pad : (b + 1) * l_pad]
        mask_b = neg[b][None, :]
        heads = []
        for hd in range(nhead):
            qh = qd[b : b + 1, hd * dh : (hd + 1) * dh]  # (1, dh)
            kh = kb[:, hd * dh : (hd + 1) * dh]
            vh = vb[:, hd * dh : (hd + 1) * dh]
            logits = (
                jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + mask_b
            )
            p = jax.nn.softmax(logits, axis=-1)
            heads.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
        rows.append(jnp.concatenate(heads, axis=-1))
    ca = jnp.concatenate(rows, axis=0)  # (Bt, D)
    ca = jnp.dot(ca, do_k[:], preferred_element_type=jnp.float32) + do_b[:]
    t2 = ln(t1 + ca, dln1_s, dln1_b)
    f = jnp.dot(t2, df0_k[:], preferred_element_type=jnp.float32) + df0_b[:]
    f = jnp.dot(jax.nn.relu(f), df1_k[:], preferred_element_type=jnp.float32) + df1_b[:]
    out_ref[:] = ln(t2 + f, dln2_s, dln2_b)


def _fused_forward(params, entries, valid, goal, *, nhead, b_tile, interpret):
    b, l, feat = entries.shape
    d = params["fusion0"]["kernel"].shape[1]
    l_pad = _round_up(l, 8)
    # Mosaic requires a block's second-to-last dim be a multiple of 8 (sublane)
    # unless it spans the whole array — and b_tile is the leading dim of the
    # 2-D (b_tile, l_pad) valid block and the (b_tile, d) goal/out blocks.
    b_tile = _round_up(b_tile, 8)
    b_pad = _round_up(b, b_tile)
    entries = jnp.pad(entries.astype(jnp.float32), ((0, b_pad - b), (0, l_pad - l), (0, 0)))
    valid_f = jnp.pad(valid.astype(jnp.float32), ((0, b_pad - b), (0, l_pad - l)))
    has_goal = goal is not None
    goal_in = (
        jnp.pad(goal.astype(jnp.float32), ((0, b_pad - b), (0, 0)))
        if has_goal
        else jnp.zeros((b_pad, d), jnp.float32)
    )

    enc, dec = params["enc0"], params["dec0"]
    em = _flat_w(enc["MultiHeadAttention_0"])
    ds = _flat_w(dec["self_attn"])
    dc = _flat_w(dec["cross_attn"])
    weights = [
        params["fusion0"]["kernel"], params["fusion0"]["bias"],
        params["fusion1"]["kernel"], params["fusion1"]["bias"],
        em["q_k"], em["q_b"], em["k_k"], em["k_b"], em["v_k"], em["v_b"],
        em["o_k"], em["o_b"],
        enc["LayerNorm_0"]["scale"], enc["LayerNorm_0"]["bias"],
        enc["Dense_0"]["kernel"], enc["Dense_0"]["bias"],
        enc["Dense_1"]["kernel"], enc["Dense_1"]["bias"],
        enc["LayerNorm_1"]["scale"], enc["LayerNorm_1"]["bias"],
        ds["v_k"], ds["v_b"], ds["o_k"], ds["o_b"],
        dc["q_k"], dc["q_b"], dc["k_k"], dc["k_b"], dc["v_k"], dc["v_b"],
        dc["o_k"], dc["o_b"],
        dec["LayerNorm_0"]["scale"], dec["LayerNorm_0"]["bias"],
        dec["LayerNorm_1"]["scale"], dec["LayerNorm_1"]["bias"],
        dec["Dense_0"]["kernel"], dec["Dense_0"]["bias"],
        dec["Dense_1"]["kernel"], dec["Dense_1"]["bias"],
        dec["LayerNorm_2"]["scale"], dec["LayerNorm_2"]["bias"],
    ]
    weights = [w.astype(jnp.float32) for w in weights]

    grid = (b_pad // b_tile,)
    tile_specs = [
        pl.BlockSpec((b_tile, l_pad, feat), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b_tile, l_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    w_specs = [
        pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM)
        for w in weights
    ]
    kern = functools.partial(
        _kernel,
        b_tile=b_tile, l_pad=l_pad, l_real=l, nhead=nhead, d_model=d,
        has_goal=has_goal,
    )
    flops = 2 * b_pad * (l_pad * (feat * d + 9 * d * d) + 6 * d * d)
    out = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
        in_specs=tile_specs + w_specs,
        out_specs=pl.BlockSpec((b_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=entries.size * 4, transcendentals=b_pad * l_pad * 16
        ),
        interpret=interpret,
    )(entries, valid_f, goal_in, *weights)
    return out[:b]


# ---------------------------------------------------------------------------
# public API: custom-vjp fused encode (backward recomputes through the ref)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def smt_encode(params, entries, valid, goal, nhead, b_tile=8, interpret=False):
    return _fused_forward(
        params, entries, valid, goal, nhead=nhead, b_tile=b_tile, interpret=interpret
    )


def _fwd(params, entries, valid, goal, nhead, b_tile, interpret):
    out = _fused_forward(
        params, entries, valid, goal, nhead=nhead, b_tile=b_tile, interpret=interpret
    )
    return out, (params, entries, valid, goal)


def _bwd(nhead, b_tile, interpret, res, g):
    params, entries, valid, goal = res
    if goal is None:
        ref = lambda p, e: smt_encode_ref(p, e, valid, None)
        _, vjp = jax.vjp(ref, params, entries)
        dp, de = vjp(g)
        return dp, de, None, None
    ref = lambda p, e, gl: smt_encode_ref(p, e, valid, gl)
    _, vjp = jax.vjp(ref, params, entries, goal)
    dp, de, dg = vjp(g)
    return dp, de, None, dg


smt_encode.defvjp(_fwd, _bwd)
