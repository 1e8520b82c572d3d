"""Typed parameter access over parsed HIT blocks.

Plays the role of MOOSE's InputParameters/validParams machinery for object
construction (reference objects declare params in ``validParams()``; here each
object reads them through this accessor with defaults).  Includes GlobalParams
fallback, the MOOSE convention used by reference decks
(e.g. test/tests/solvers/diagonal.i `[GlobalParams]`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from .hit import HitNode


class ParamError(Exception):
    pass


_BOOL_TRUE = {"true", "1", "yes", "on"}
_BOOL_FALSE = {"false", "0", "no", "off"}


class Params:
    def __init__(self, node: Optional[HitNode], global_params: Optional[Dict[str, str]] = None):
        self.node = node
        self.global_params = global_params or {}
        self.name = node.name if node is not None else ""

    def _raw(self, key: str) -> Optional[str]:
        if self.node is not None and key in self.node.params:
            mark_accessed(self.node, key)
            return self.node.params[key]
        if key in self.global_params:
            return self.global_params[key]
        return None

    def has(self, key: str) -> bool:
        return self._raw(key) is not None

    def error(self, key: str, msg: str):
        where = self.node.path() if self.node is not None else "<none>"
        raise ParamError(f"[{where}] parameter '{key}': {msg}")

    # -- scalar getters ----------------------------------------------------
    def get_str(self, key: str, default: Optional[str] = None, required: bool = False) -> str:
        v = self._raw(key)
        if v is None:
            if required:
                self.error(key, "is required")
            return default
        return v

    def get_float(self, key: str, default: Optional[float] = None, required: bool = False) -> float:
        v = self._raw(key)
        if v is None:
            if required:
                self.error(key, "is required")
            return default
        try:
            return float(v)
        except ValueError:
            self.error(key, f"cannot parse '{v}' as a number")

    def get_int(self, key: str, default: Optional[int] = None, required: bool = False) -> int:
        v = self._raw(key)
        if v is None:
            if required:
                self.error(key, "is required")
            return default
        try:
            f = float(v)
        except ValueError:
            self.error(key, f"cannot parse '{v}' as an integer")
        if not f.is_integer():
            # MOOSE rejects non-integer int params; silent truncation
            # (num_steps = 2.7 -> 2) hides deck typos
            self.error(key, f"'{v}' is not an integer")
        return int(f)

    def get_bool(self, key: str, default: bool = False) -> bool:
        v = self._raw(key)
        if v is None:
            return default
        lv = v.strip().lower()
        if lv in _BOOL_TRUE:
            return True
        if lv in _BOOL_FALSE:
            return False
        self.error(key, f"cannot parse '{v}' as a boolean")

    def get_enum(self, key: str, options: Sequence[str], default: Optional[str] = None) -> str:
        v = self._raw(key)
        if v is None:
            return default
        vu = v.strip()
        for opt in options:
            if vu.upper() == opt.upper():
                return opt
        self.error(key, f"'{v}' is not one of {list(options)}")

    # -- vector getters ----------------------------------------------------
    def get_str_vector(self, key: str, default: Optional[List[str]] = None, required: bool = False) -> List[str]:
        v = self._raw(key)
        if v is None:
            if required:
                self.error(key, "is required")
            return list(default) if default is not None else []
        return v.split()

    def get_float_vector(self, key: str, default: Optional[List[float]] = None, required: bool = False) -> List[float]:
        return [
            self._parse_float(key, x)
            for x in self.get_str_vector(
                key,
                default=None if default is None else [str(d) for d in default],
                required=required,
            )
        ]

    def get_int_vector(self, key: str, default: Optional[List[int]] = None, required: bool = False) -> List[int]:
        out = []
        for x in self.get_float_vector(
            key, default=None if default is None else [float(d) for d in default], required=required
        ):
            if not float(x).is_integer():
                self.error(key, f"'{x}' is not an integer")
            out.append(int(x))
        return out

    def _parse_float(self, key, x):
        try:
            return float(x)
        except ValueError:
            self.error(key, f"cannot parse '{x}' as a number")

    def blocks(self) -> List[HitNode]:
        return self.node.blocks() if self.node is not None else []


# ---------------------------------------------------------------------------
# unused-parameter detection (MOOSE rejects unknown parameters at parse time
# via validParams; here every Params access is recorded on the node and the
# deck is audited after the problem is fully built — a typo'd or unsupported
# key is reported instead of silently ignored)
# ---------------------------------------------------------------------------

#: parameters that are legal in reference decks but deliberately inert here
#: (device assignment collapses to JAX's platform; jit is always on; MOOSE
#: harness-only knobs)
INERT_PARAMS = {
    "device_names", "device_weights", "gpu_aware_mpi",
    "enable_jit", "mesh_mode", "parallel_partitioner",
    "torch_num_threads", "allow_renumbering",
    # output cadence control — outputs run INITIAL + TIMESTEP_END, the only
    # cadences the reference decks use
    "execute_on",
    # REAL_SPACE halos are periodic-only (README divergences)
    "periodic_directions",
    # declared by the reference but its wiring is commented out
    # (reference src/tensor_buffers/TensorBufferBase.C:53)
    "map_from_aux_variable",
}

#: structural keys consumed by the HIT layer itself
_STRUCTURAL = {"active", "inactive", "type"}


def mark_accessed(node: HitNode, key: str):
    if not hasattr(node, "_accessed"):
        node._accessed = set()
    node._accessed.add(key)


def find_unused(root: HitNode) -> List[str]:
    """All `path/key` deck parameters that no object ever read."""
    out: List[str] = []

    def walk(node: HitNode, is_root: bool):
        if node.name == "GlobalParams":
            return  # fallback pool: unused entries are legal
        if not is_root:  # root-level keys are ${...} brace variables
            accessed = getattr(node, "_accessed", set())
            for key in node.params:
                if key in _STRUCTURAL or key in INERT_PARAMS:
                    continue
                if key not in accessed:
                    out.append(f"{node.path()}/{key}")
        # blocks() honors active/inactive: disabled blocks are never built,
        # so their params are legitimately unread
        for child in node.blocks():
            walk(child, False)

    walk(root, True)
    return out


def check_unused(root: HitNode, strict: bool = False):
    """Warn (or raise, strict mode) about parameters nothing consumed —
    the unknown-parameter rejection MOOSE performs via validParams."""
    unused = find_unused(root)
    if not unused:
        return
    msg = "Unused (unknown?) input parameters: " + ", ".join(sorted(unused))
    if strict:
        raise ParamError(msg)
    import sys

    sys.stderr.write(f"[marlin_tpu] WARNING: {msg}\n")
