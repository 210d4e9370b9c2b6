"""Scene asset bank: stacked device tables + frames + sounds + RIR providers.

Replaces the reference's per-process asset loading (frame-cache pickles,
per-pair RIR wav files, librosa-loaded sounds — soundspaces/simulator.py:
187-196, 372-388, 609-637) with one device-resident bank shared by every env
slot. RIRs come from a pluggable provider:

* ``DenseRIRBank`` — full (S, 4, N, N, L, 2) tensor for small scenes/tests.
* ``ProceduralRIRBank`` — RIRs synthesized on device per lookup from the
  scene geometry (direct path with distance attenuation + ILD/ITD binaural
  cues + exponentially decaying reverb tail, deterministic per
  (scene, azimuth, receiver, source)). Zero HBM footprint; the default for
  benchmarks and large synthetic worlds.
* ``HostRIRStore`` hook (measured datasets) arrives with the data pipeline:
  gathers (B, L, 2) slices from a host memory-mapped bank via io_callback.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

SPEED_OF_SOUND = 343.0


class DenseRIRBank:
    """Device tensor of binaural RIRs indexed (scene, azimuth, receiver, source)."""

    def __init__(self, rirs):
        if not isinstance(rirs, jax.core.Tracer):
            rirs = jnp.asarray(rirs)
            assert rirs.ndim == 6 and rirs.shape[1] == 4 and rirs.shape[-1] == 2
        self.rirs = rirs

    @property
    def length(self) -> int:
        return self.rirs.shape[4]

    def gather(self, scene, az_idx, recv, src):
        return self.rirs[scene, az_idx, recv, src]


@dataclasses.dataclass
class ProceduralRIRBank:
    """Deterministic on-device RIR synthesis from scene geometry.

    An RIR is direct-path impulses (distance delay + ILD/ITD binaural cues)
    plus one of ``num_tails`` precomputed exponentially-decaying noise tails,
    circularly shifted to the direct-path delay and scaled by a per-pair
    deterministic jitter. Because the tail bank stores both the time-domain
    tails (``tail_noise``) and their rFFTs at the convolution length
    (``tail_fft``), the provider serves BOTH representations:

    * ``gather``     → (B, L, 2) time-domain RIRs (dense-bank interface), and
    * ``gather_fft`` → (B, 2, F) channel-major complex spectra, *exactly* equal to
      ``rfft(gather(...), n=fft_len)`` but with no per-step FFT: the delay
      shift is an analytic phase ramp and the tail spectrum is a table
      lookup. The per-step audio path (ops/audio.binaural_convolve) then
      skips the length-2^n rFFT of the RIR entirely — the TPU counterpart of
      the reference's per-step scipy fftconvolve cost
      (soundspaces/simulator.py:644-699).

    Tail support is truncated to ``length - delay_cap`` samples so the delay
    shift always stays inside the (B, L, 2) time-domain window — this is what
    makes the two representations bit-equivalent (up to float roundoff).

    The spectral tables are stored as float32 (re, im) stacks, NOT complex64
    arrays: the axon TPU transport cannot transfer complex64 between host
    and device (UNIMPLEMENTED), and closure-captured tables get embedded as
    HLO constants via a device→host copy. Complex values are only ever
    formed *inside* traced code (``lax.complex`` in ``gather_fft``).
    """

    positions: jax.Array  # (S, N, 3)
    length: int
    sampling_rate: int
    seed: int = 0
    tail_scale: float = 0.05
    tail_tau_s: float = 0.15
    num_tails: int = 64
    tail_noise: Optional[jax.Array] = None  # (P, L, 2) envelope-weighted tails
    tail_fft: Optional[jax.Array] = None  # (4, P, F) f32 planes re_l/re_r/im_l/im_r at fft_len
    itd_phase: Optional[jax.Array] = None  # (2, itd_cap+1, F) f32 re/im phase ramps

    @property
    def delay_cap(self) -> int:
        return min(self.length // 4, 4096)

    @property
    def itd_cap(self) -> int:
        return int(0.0008 * self.sampling_rate) + 1

    @property
    def fft_len(self) -> int:
        from avlen_tpu.ops.audio import _conv_fft_len

        return _conv_fft_len(self.sampling_rate, self.length)

    def ensure_tables(self) -> "ProceduralRIRBank":
        """Populate the tail/phase tables (idempotent; call OUTSIDE jit)."""
        if self.tail_fft is not None:
            return self
        n = self.fft_len
        support = self.length - self.delay_cap
        tau = self.tail_tau_s * self.sampling_rate

        @jax.jit
        def build():
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.key(self.seed), i)
            )(jnp.arange(self.num_tails))
            noise = jax.vmap(lambda kk: jax.random.normal(kk, (self.length, 2)))(keys)
            j = jnp.arange(self.length)[None, :, None].astype(jnp.float32)
            env = jnp.exp(-j / tau) * (j < support)
            tails = noise * env  # (P, L, 2)
            # stored as FOUR (P, F) planes [re_l, re_r, im_l, im_r]: every
            # per-step gather is then plane[k, tail_id] — ONE offset dim,
            # the same pattern as the itd_phase gathers. The previous
            # (2, P, 2ch, F) packing (two offset dims: ch and F) made
            # XLA:TPU relayout the whole constant table to F-major INSIDE
            # the rollout scan body — a 33 MB tile-degenerate copy every
            # env step (~3 ms/step, the largest op in the r4 traces, still
            # present after the irfft became a pinned-layout Pallas call).
            tfft = jnp.fft.rfft(tails.swapaxes(1, 2), n=n, axis=-1)  # (P, 2, F)
            re, im = jnp.real(tfft), jnp.imag(tfft)
            tfft = jnp.stack(
                [re[:, 0], re[:, 1], im[:, 0], im[:, 1]]
            ).astype(jnp.float32)  # (4, P, F)
            offs = jnp.arange(self.itd_cap + 1)[:, None]
            f = jnp.arange(n // 2 + 1)[None, :]
            ang = -2.0 * jnp.pi * ((offs * f) % n).astype(jnp.float32) / n
            iph = jnp.stack([jnp.cos(ang), jnp.sin(ang)])
            return tails, tfft, iph

        self.tail_noise, self.tail_fft, self.itd_phase = build()
        return self

    def _geometry(self, scene, az_idx, recv, src):
        """Shared per-pair acoustics: gains, amplitude, delays, tail id/jitter."""
        pos = self.positions
        p_r = pos[scene, recv]  # (B, 3)
        p_s = pos[scene, src]
        d = p_s - p_r
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-6)

        # agent heading from azimuth index: rotation = (4 - az) % 4 * 90 deg
        rot = ((4 - az_idx) % 4).astype(jnp.float32) * (jnp.pi / 2)
        fwd_x, fwd_z = -jnp.sin(rot), -jnp.cos(rot)
        inv = 1.0 / jnp.maximum(dist, 1e-3)
        cos_rel = (fwd_x * d[:, 0] + fwd_z * d[:, 2]) * inv
        sin_rel = (fwd_x * d[:, 2] - fwd_z * d[:, 0]) * inv

        # interaural level + time differences
        g_l = 0.6 + 0.35 * sin_rel + 0.05 * cos_rel
        g_r = 0.6 - 0.35 * sin_rel + 0.05 * cos_rel
        amp = 1.0 / jnp.maximum(dist, 0.3)
        delay = jnp.clip(
            (dist / SPEED_OF_SOUND * self.sampling_rate).astype(jnp.int32), 0, self.delay_cap
        )
        itd = jnp.clip(
            (sin_rel * 0.0008 * self.sampling_rate).astype(jnp.int32),
            -self.itd_cap, self.itd_cap,
        )  # ±~0.8 ms

        pair_id = (scene.astype(jnp.uint32) * jnp.uint32(1_000_003)
                   + recv.astype(jnp.uint32) * jnp.uint32(1009)
                   + src.astype(jnp.uint32))
        tail_id = (pair_id % jnp.uint32(self.num_tails)).astype(jnp.int32)
        h = pair_id * jnp.uint32(2654435761)
        jitter = 0.75 + 0.5 * (h.astype(jnp.float32) / jnp.float32(2**32))
        return g_l, g_r, amp, delay, itd, tail_id, jitter

    def gather(self, scene, az_idx, recv, src):
        """(B,) indices → (B, L, 2) time-domain RIRs."""
        assert self.tail_noise is not None, "call ensure_tables() after construction"
        g_l, g_r, amp, delay, itd, tail_id, jitter = self._geometry(scene, az_idx, recv, src)

        k = jnp.arange(self.length)[None, :]  # (1, L)
        direct_l = (k == (delay + jnp.maximum(-itd, 0))[:, None]).astype(jnp.float32)
        direct_r = (k == (delay + jnp.maximum(itd, 0))[:, None]).astype(jnp.float32)

        base = self.tail_noise[tail_id]  # (B, L, 2)
        j = k - delay[:, None]  # (B, L)
        shifted = jnp.take_along_axis(
            base, jnp.clip(j, 0, self.length - 1)[..., None], axis=1
        ) * (j >= 0)[..., None]
        tail = shifted * (jitter * self.tail_scale * amp)[:, None, None]

        rir = tail
        rir = rir.at[:, :, 0].add(direct_l * (amp * g_l)[:, None])
        rir = rir.at[:, :, 1].add(direct_r * (amp * g_r)[:, None])
        return rir

    def gather_fft(self, scene, az_idx, recv, src):
        """(B,) indices → (B, 2, F) complex64 == rfft(gather(...), fft_len)
        per channel, channel-major so the downstream irfft runs along the
        minor axis (a non-minor FFT axis forces XLA:TPU to insert a full
        layout copy of the (B, fft_len, 2) time-domain output — ~13% of the
        non-banked superstep's device time in the r4 profile).

        Complex values exist only inside the traced program (lax.complex on
        the f32 re/im tables) — see the class docstring's axon note."""
        assert self.tail_fft is not None, "call ensure_tables() after construction"
        g_l, g_r, amp, delay, itd, tail_id, jitter = self._geometry(scene, az_idx, recv, src)
        n = self.fft_len
        f = jnp.arange(n // 2 + 1, dtype=jnp.int32)[None, :]  # (1, F)
        # exact int phase index: delay ≤ delay_cap ≤ 4096 keeps f*delay < 2^31
        ang = -2.0 * jnp.pi * ((delay[:, None] * f) % n).astype(jnp.float32) / n
        ph = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))  # (B, F) e^{-iω·delay}
        itd_l = jnp.maximum(-itd, 0)
        itd_r = jnp.maximum(itd, 0)
        ph_l = ph * jax.lax.complex(self.itd_phase[0, itd_l], self.itd_phase[1, itd_l])
        ph_r = ph * jax.lax.complex(self.itd_phase[0, itd_r], self.itd_phase[1, itd_r])
        # per-channel (B, F) planes, stacked only at the very end: each
        # table gather has ONE offset dim (see ensure_tables' layout note)
        tf = self.tail_fft  # (4, P, F) re_l / re_r / im_l / im_r
        t_l = jax.lax.complex(tf[0, tail_id], tf[2, tail_id])  # (B, F)
        t_r = jax.lax.complex(tf[1, tail_id], tf[3, tail_id])
        mod = ph * (jitter * self.tail_scale * amp)[:, None]  # (B, F)
        rir_l = t_l * mod + (amp * g_l)[:, None] * ph_l
        rir_r = t_r * mod + (amp * g_r)[:, None] * ph_r
        return jnp.stack([rir_l, rir_r], axis=1)  # (B, 2, F)


@dataclasses.dataclass
class SceneBank:
    """All device-resident assets for a set of scenes."""

    tables: Dict[str, jax.Array]  # positions/fwd_next/hops/oracle_next/num_nodes
    sounds_padded: jax.Array  # (K, L-1 + S_max) with L-1 leading zeros
    sound_secs: jax.Array  # (K,)
    rir: object  # provider with .gather/.length
    rgb: Optional[jax.Array] = None  # (S, N, 4, H, W, 3) uint8
    depth: Optional[jax.Array] = None  # (S, N, 4, H, W, 1) f32
    # pixelwise instance-id frames + per-scene instance→mpcat40 remap for the
    # SemanticObjectSensor channel (soundspaces/tasks/nav.py:570-698)
    semantic: Optional[jax.Array] = None  # (S, N, 4, H, W) int32 instance ids
    semantic_instance_to_mp3d: Optional[jax.Array] = None  # (S, I) int32
    grid_size: float = 1.0
    sampling_rate: int = 16000
    num_categories: int = 21
    # optional precomputed per-(sound, second) segment rFFTs (K, S_secs, F)
    # complex64: the source-side half of the per-step FFT convolution is a
    # pure function of (sound id, second index) — windows are second-aligned
    # (simulator.py:666-680) — so it is rendered once and gathered, saving
    # one length-2^n rFFT per env per step on the non-banked audio path.
    sound_fft_bank: Optional[jax.Array] = None
    # optional precomputed spectrogram bank (S, K, 4, N, N, F', T', 2) bf16:
    # the device-resident equivalent of the reference's per-(src, recv,
    # azimuth) `_spectrogram_cache` (soundspaces/simulator.py:701-734,
    # flushed per sound — here all sounds banked), valid for 1-second
    # (everlasting) sounds with no distractor. Built by
    # precompute_spectrogram_bank; the audio observation becomes ONE gather.
    spec_bank: Optional[jax.Array] = None

    @property
    def num_scenes(self) -> int:
        return self.tables["positions"].shape[0]

    @property
    def max_nodes(self) -> int:
        return self.tables["positions"].shape[1]


def precompute_spectrogram_bank(
    bank: SceneBank,
    batch: int = 256,
    dtype=jnp.bfloat16,
    max_bytes: int = 4 << 30,
) -> Optional[jax.Array]:
    """Render every (scene, sound, azimuth, receiver, source) spectrogram once.

    Returns the (S, K, 4, N, N, F', T', 2) bank or None when the sounds are
    not all 1-second or the bank would exceed ``max_bytes``. Rendering uses
    the same golden-tested pipeline as the per-step path, so training
    observations are bit-identical up to the bank dtype.
    """
    from avlen_tpu.ops.audio import SpectrogramConfig, render_audiogoal

    secs = np.asarray(bank.sound_secs)
    if not (secs == 1).all():
        return None
    s = bank.num_scenes
    n = bank.max_nodes
    k = int(bank.sounds_padded.shape[0])
    cfg = SpectrogramConfig(sampling_rate=bank.sampling_rate)
    f, t, _ = cfg.out_shape
    total = s * k * 4 * n * n * f * t * 2 * np.dtype(dtype).itemsize
    if total > max_bytes:
        return None

    use_fft = getattr(bank.rir, "tail_fft", None) is not None

    @jax.jit
    def render(scene, sound, az, recv, src):
        kw = {}
        if use_fft:  # same analytic path the live env takes (sim/env.py)
            kw = dict(rir_f=bank.rir.gather_fft(scene, az, recv, src),
                      rir_len=bank.rir.length)
            rir = None
        else:
            rir = bank.rir.gather(scene, az, recv, src)
        _, spec = render_audiogoal(
            bank.sounds_padded[sound],
            jnp.zeros_like(sound),
            rir,
            jnp.ones(sound.shape, bool),
            bank.sampling_rate,
            config=cfg,
            **kw,
        )
        return spec.astype(dtype)

    # enumerate all combos in host order, render in device batches
    idx = np.stack(
        np.meshgrid(
            np.arange(s), np.arange(k), np.arange(4), np.arange(n), np.arange(n), indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 5)
    chunks = []
    for i in range(0, idx.shape[0], batch):
        part = idx[i : i + batch]
        pad = batch - part.shape[0]
        if pad:
            part = np.concatenate([part, np.repeat(part[-1:], pad, 0)], 0)
        spec = render(*(jnp.asarray(part[:, j]) for j in range(5)))
        chunks.append(spec[: batch - pad] if pad else spec)
    return jnp.concatenate(chunks, axis=0).reshape(s, k, 4, n, n, f, t, 2)


# ---------------------------------------------------------------------------
# pytree registrations: SceneBank and the RIR providers cross jit boundaries
# as ARGUMENTS (utils/hoist.py) — never as HLO literal constants. Auxiliary
# scalars (rates, lengths, seeds) are static; device tensors are children.
# ---------------------------------------------------------------------------
def _register_pytrees() -> None:
    def _dense_unflatten(aux, ch):
        # Bypass __init__ validation: unflatten must accept arbitrary leaves
        # (PartitionSpecs, Nones, tracers) so jax.tree.map over a bound
        # SceneBank — e.g. the sharding-spec map in parallel/ddppo.py — works.
        bank = object.__new__(DenseRIRBank)
        bank.rirs = ch[0]
        return bank

    jax.tree_util.register_pytree_node(
        DenseRIRBank,
        lambda b: ((b.rirs,), None),
        _dense_unflatten,
    )

    def _proc_flatten(b: ProceduralRIRBank):
        aux = (b.length, b.sampling_rate, b.seed, b.tail_scale, b.tail_tau_s, b.num_tails)
        return (b.positions, b.tail_noise, b.tail_fft, b.itd_phase), aux

    def _proc_unflatten(aux, ch):
        length, sr, seed, ts, tt, nt = aux
        bank = object.__new__(ProceduralRIRBank)
        bank.positions, bank.tail_noise, bank.tail_fft, bank.itd_phase = ch
        bank.length, bank.sampling_rate, bank.seed = length, sr, seed
        bank.tail_scale, bank.tail_tau_s, bank.num_tails = ts, tt, nt
        return bank

    jax.tree_util.register_pytree_node(ProceduralRIRBank, _proc_flatten, _proc_unflatten)

    _BANK_CHILDREN = (
        "tables", "sounds_padded", "sound_secs", "rir", "rgb", "depth",
        "semantic", "semantic_instance_to_mp3d", "sound_fft_bank", "spec_bank",
    )
    _BANK_AUX = ("grid_size", "sampling_rate", "num_categories")

    def _bank_flatten(b: SceneBank):
        return tuple(getattr(b, f) for f in _BANK_CHILDREN), tuple(
            getattr(b, f) for f in _BANK_AUX
        )

    def _bank_unflatten(aux, ch):
        kw = dict(zip(_BANK_CHILDREN, ch))
        kw.update(zip(_BANK_AUX, aux))
        return SceneBank(**kw)

    jax.tree_util.register_pytree_node(SceneBank, _bank_flatten, _bank_unflatten)


_register_pytrees()


def precompute_sound_fft_bank(bank: SceneBank) -> jax.Array:
    """(K, S_max, F) complex64 rFFTs of every (sound, second) convolution
    segment, using the exact segment gather + rFFT the per-step path
    (ops/audio.binaural_convolve) performs — results are bit-identical."""
    from avlen_tpu.ops.audio import _conv_fft_len

    sr = bank.sampling_rate
    l = bank.rir.length
    seg_len = sr + l - 1
    fft_len = _conv_fft_len(sr, l)
    k = int(bank.sounds_padded.shape[0])
    s_max = int(np.asarray(bank.sound_secs).max())

    @jax.jit
    def render():
        starts = (jnp.arange(s_max) * sr)[None, :, None]  # (1, S, 1)
        idx = starts + jnp.arange(seg_len)[None, None, :]  # (1, S, seg)
        idx = jnp.clip(idx, 0, bank.sounds_padded.shape[-1] - 1)
        segs = jnp.take_along_axis(
            bank.sounds_padded[:, None, :], jnp.broadcast_to(idx, (k, s_max, seg_len)), axis=-1
        )
        return jnp.fft.rfft(segs.astype(jnp.float32), n=fft_len, axis=-1)

    return render()


def pad_sounds(sounds: "list[np.ndarray]", rir_length: int, sampling_rate: int) -> "tuple[np.ndarray, np.ndarray]":
    """Pad mono sounds with rir_length-1 leading zeros to a common length."""
    secs = np.array([max(1, s.shape[0] // sampling_rate) for s in sounds], np.int32)
    s_max = int(max(s.shape[0] for s in sounds))
    out = np.zeros((len(sounds), rir_length - 1 + s_max), np.float32)
    for i, s in enumerate(sounds):
        out[i, rir_length - 1 : rir_length - 1 + s.shape[0]] = s
    return out, secs
