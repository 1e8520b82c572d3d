"""Checkpoint / resume of the full state pytree.

The reference inherits MOOSE checkpointing but never serializes the tensor
buffers themselves (SURVEY §5.4 — restartable data exists only in the
timestepper).  Here the complete solver state (buffers, history stacks,
advance counters, solver internals) plus the time-loop position is saved, so
a run can resume bit-exactly — a strict superset of the reference.

Format: a single .npz (portable, no framework state), complex supported.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import numpy as np


def _flatten(state: Dict, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            if not v:
                # an EMPTY dict (e.g. state['old'] on history-free decks)
                # must survive the round-trip or resume loses the key
                out[key + "/__empty__"] = np.zeros(0, dtype=np.uint8)
            else:
                out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(arrays: Dict[str, np.ndarray]) -> Dict:
    root: Dict = {}
    for key, arr in arrays.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        if parts[-1] == "__empty__":
            continue  # marker: the parent dict exists but is empty
        d[parts[-1]] = jax.numpy.asarray(arr)
    return root


def save(path: str, state: Dict, time: float, step: int, dt: float,
         pp_values=None, aux_cache=None):
    payload = _flatten(state)
    meta = {"time": time, "step": step, "dt": dt, "pp_values": pp_values or {}}
    # host-side INITIAL-only aux-kernel samples (aux.AuxSystem._initial_cache):
    # they cannot be reconstructed after resume (the t=0 state is gone), so
    # they ride the checkpoint under a reserved prefix
    for var, arr in (aux_cache or {}).items():
        payload[f"__aux__/{var}"] = np.asarray(arr)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ).copy()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **payload)


def load(path: str) -> Tuple[Dict, Dict]:
    """Returns (state, meta); meta['aux_cache'] holds the INITIAL-only aux
    samples as numpy arrays (empty dict for checkpoints written without)."""
    with np.load(path if path.endswith(".npz") else path + ".npz") as f:
        arrays = {k: f[k] for k in f.files
                  if k != "__meta__" and not k.startswith("__aux__/")}
        aux = {k[len("__aux__/"):]: f[k] for k in f.files
               if k.startswith("__aux__/")}
        meta = json.loads(bytes(f["__meta__"]).decode())
    meta["aux_cache"] = aux
    return _unflatten(arrays), meta
