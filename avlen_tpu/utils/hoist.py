"""Constant hoisting for jitted programs.

JAX lowers arrays captured by closure into the HLO module as literal
constants. For this framework's device-resident asset banks (spectrogram
banks, frame banks, RIR tensors, episode tables — hundreds of MB) that is
catastrophic: compile payloads balloon (the axon remote-compile tunnel
rejects them outright), compiles take minutes, and every retrace re-ships
the data. The reference never hits this because torch has no tracing
compiler; the TPU-native answer is to pass the banks through the jit
boundary as runtime ARGUMENTS.

``ConstBinder`` keeps all existing call signatures intact: jitted entry
points take one extra ``consts`` pytree argument and bind it for the
duration of tracing; any code underneath (env steps, rollout collectors,
policy towers) reads the bound tracers through ``binder.get(name)`` — or
transparently, via objects like ``BatchedAudioNavEnv`` that consult the
binder in their accessors. At runtime the compiled executable receives the
arrays as ordinary buffer parameters (zero copies, aliased through scans).

Usage:
    binder = ConstBinder()
    binder.add("bank", bank_pytree)

    def step(train_state, carry, key, consts):
        with binder.bind(consts):
            ...  # existing body; binder.get("bank") yields tracers
    step_j = jax.jit(step)
    step_j(ts, carry, key, binder.arrays)
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional


class ConstBinder:
    def __init__(self):
        self.arrays: Dict[str, Any] = {}
        self._bound: Optional[Dict[str, Any]] = None

    def add(self, name: str, value: Any) -> str:
        """Register a pytree of device arrays under ``name``."""
        self.arrays[name] = value
        return name

    def get(self, name: str) -> Any:
        """The bound (traced) value inside a `bind` context, else the
        concrete registered value."""
        if self._bound is not None and name in self._bound:
            return self._bound[name]
        return self.arrays[name]

    @property
    def is_bound(self) -> bool:
        return self._bound is not None

    @contextlib.contextmanager
    def bind(self, consts: Dict[str, Any]):
        prev = self._bound
        self._bound = consts
        try:
            yield
        finally:
            self._bound = prev
