"""Runtime capability probes for the active JAX backend.

Some PJRT plugins (notably tunneled single-chip TPU backends) do not
implement host send/recv, so `jax.experimental.io_callback` /
`pure_callback` raise UNIMPLEMENTED at *run* time — after tracing has
already succeeded. Paths that rely on host callbacks (the per-query
host-speaker instruction source, the mmap `HostRIRStore`) must therefore
probe support once up front and fall back to bankable alternatives, instead
of crashing the first superstep.
"""

from __future__ import annotations

import functools

import jax
import jax.experimental  # noqa: F401  (io_callback)
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def host_callbacks_supported(platform: str | None = None) -> bool:
    """True iff a jitted `io_callback` actually executes on this backend.

    The probe is one scalar round trip, compiled once and cached per
    platform string (None = default backend). A failing probe is the
    expected state under PJRT plugins without host send/recv support.
    """
    if platform is None:
        platform = jax.default_backend()

    def _echo(v):
        return np.asarray(v, np.int32)

    def _probe(x):
        return jax.experimental.io_callback(
            _echo, jax.ShapeDtypeStruct((), jnp.int32), x, ordered=False
        )

    try:
        device = jax.devices(platform)[0]
        with jax.default_device(device):
            out = jax.jit(_probe)(jnp.int32(7))
            return int(out) == 7
    except Exception:
        return False


def pallas_smt_enabled(mode: str) -> bool:
    """Resolve TPU.PALLAS_SMT: "auto" = the Mosaic kernel on TPU backends
    only (off-TPU the kernel would run interpreted — test-only), "on"/"off"
    force it (ops/pallas_smt.py)."""
    if mode == "on":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu"
