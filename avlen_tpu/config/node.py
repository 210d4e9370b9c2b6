"""A minimal yacs-compatible config node.

The reference drives every component through a two-level yacs config tree with
yaml merges plus trailing ``KEY VALUE`` CLI overrides
(ss_baselines/savi/config/default.py:298-369). This is a dependency-free
re-implementation of the subset of yacs semantics the framework needs:
attribute access, ``merge_from_file`` / ``merge_from_other_cfg`` /
``merge_from_list``, ``freeze`` / ``defrost``, ``clone``, and yaml dump.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml

_VALID_SCALARS = (int, float, bool, str, type(None))


class ConfigNode(dict):
    """Dict with attribute access, freezing, and yacs-style merge semantics."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        super().__init__()
        self.__dict__[ConfigNode.IMMUTABLE] = False
        if init_dict:
            for k, v in init_dict.items():
                if isinstance(v, dict) and not isinstance(v, ConfigNode):
                    v = ConfigNode(v)
                self[k] = v

    # -- attribute protocol ---------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config has no key {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(ConfigNode.IMMUTABLE, False):
            raise AttributeError(f"Config is frozen; cannot set {name!r}")
        if isinstance(value, dict) and not isinstance(value, ConfigNode):
            value = ConfigNode(value)
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        if self.__dict__.get(ConfigNode.IMMUTABLE, False):
            raise AttributeError(f"Config is frozen; cannot set {name!r}")
        super().__setitem__(name, value)

    # -- freeze discipline ----------------------------------------------
    def freeze(self) -> "ConfigNode":
        self._set_immutable(True)
        return self

    def defrost(self) -> "ConfigNode":
        self._set_immutable(False)
        return self

    def is_frozen(self) -> bool:
        return self.__dict__[ConfigNode.IMMUTABLE]

    def _set_immutable(self, value: bool) -> None:
        self.__dict__[ConfigNode.IMMUTABLE] = value
        for v in self.values():
            if isinstance(v, ConfigNode):
                v._set_immutable(value)

    # -- merging ---------------------------------------------------------
    def clone(self) -> "ConfigNode":
        frozen = self.is_frozen()
        self._set_immutable(False)
        out = copy.deepcopy(self)
        self._set_immutable(frozen)
        out._set_immutable(False)
        return out

    def merge_from_other_cfg(self, other: "ConfigNode") -> None:
        _merge_into(other, self)

    def merge_from_file(self, path: str) -> None:
        with open(path, "r") as f:
            loaded = yaml.safe_load(f) or {}
        _merge_into(ConfigNode(loaded), self, allow_new=False)

    def merge_from_list(self, opts: List[Any]) -> None:
        if len(opts) % 2 != 0:
            raise ValueError(f"Override list must have even length, got {opts}")
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Non-existent config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            node[leaf] = _coerce(value, node[leaf])

    # -- io ---------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else copy.deepcopy(v)
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False, sort_keys=False)

    def __repr__(self) -> str:  # pragma: no cover
        return self.dump()


CN = ConfigNode


def _merge_into(src: ConfigNode, dst: ConfigNode, allow_new: bool = True) -> None:
    for k, v in src.items():
        if isinstance(v, ConfigNode) and isinstance(dst.get(k), ConfigNode):
            _merge_into(v, dst[k], allow_new=allow_new)
        else:
            if not allow_new and k not in dst:
                raise KeyError(f"Unknown config key in yaml: {k}")
            if isinstance(v, ConfigNode):
                dst[k] = v.clone()
            else:
                existing = dst.get(k)
                dst[k] = _coerce(v, existing) if k in dst else copy.deepcopy(v)


def _coerce(value: Any, reference: Any) -> Any:
    """Coerce a yaml/CLI value toward the type of the existing default."""
    if isinstance(value, str) and not isinstance(reference, str):
        try:
            value = yaml.safe_load(value)
        except yaml.YAMLError:
            pass
        if isinstance(value, str) and isinstance(reference, (int, float)):
            # yaml 1.1 does not parse exponents without a dot ("1e-4")
            try:
                value = float(value)
            except ValueError:
                pass
    if isinstance(reference, bool) and isinstance(value, (int, str)):
        if isinstance(value, str):
            lowered = value.lower()
            if lowered in ("true", "1", "yes"):
                return True
            if lowered in ("false", "0", "no"):
                return False
        return bool(value)
    if isinstance(reference, float) and isinstance(value, int):
        return float(value)
    if (
        reference is not None
        and value is not None
        and not isinstance(value, type(reference))
        and not isinstance(reference, type(value))
        and not (isinstance(reference, (list, tuple)) and isinstance(value, (list, tuple)))
    ):
        raise TypeError(
            f"Type mismatch merging {value!r} ({type(value).__name__}) over "
            f"{reference!r} ({type(reference).__name__})"
        )
    return value
