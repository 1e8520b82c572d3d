"""NEML2-equivalent constitutive-model path.

The reference wraps the NEML2 constitutive-model library: a NEML2 HIT input
file declares [Models], and NEML2TensorCompute maps marlin buffers onto the
model's input/output variables (reference
src/tensor_computes/NEML2TensorCompute.C:1-120, test/tests/neml2/).

marlin_tpu implements the same deck surface with a pure-JAX model registry —
a documented SUBSET of NEML2's model zoo covering the shipped test decks and
the common algebra models.  Each model is a pure function over named
variables (`forces/A`, `state/C`, ...), evaluated on-device inside the
jitted compute graph.  Unknown model types raise a clear error naming the
divergence."""

from __future__ import annotations

import os
from typing import Dict, List

import jax.numpy as jnp

from ..params import Params
from ..registry import computes
from .base import ComputeError, TensorCompute


class NEML2Error(Exception):
    pass


class _NEML2Model:
    def __init__(self, name: str, params: Params):
        self.name = name

    def forward(self, env: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError


class ScalarMultiplication(_NEML2Model):
    """to_var = coefficient * Π from_var (NEML2 ScalarMultiplication;
    `reciprocal` flags invert individual factors)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.from_var = params.get_str_vector("from_var", required=True)
        self.to_var = params.get_str("to_var", required=True)
        self.coefficient = params.get_float("coefficient", 1.0)
        from ..params import _BOOL_FALSE, _BOOL_TRUE

        recip = params.get_str_vector("reciprocal", [])
        for r in recip:
            if r.lower() not in _BOOL_TRUE | _BOOL_FALSE:
                params.error("reciprocal", f"cannot parse '{r}' as a bool")
        self.reciprocal = [r.lower() in _BOOL_TRUE for r in recip] or [
            False
        ] * len(self.from_var)
        if len(self.reciprocal) != len(self.from_var):
            params.error("reciprocal", "one flag per from_var")

    def forward(self, env):
        out = jnp.asarray(self.coefficient)
        for v, rec in zip(self.from_var, self.reciprocal):
            out = out / env[v] if rec else out * env[v]
        return {self.to_var: out}


class ScalarLinearCombination(_NEML2Model):
    """to_var = Σ coefficient_i * from_var_i (NEML2 ScalarLinearCombination)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.from_var = params.get_str_vector("from_var", required=True)
        self.to_var = params.get_str("to_var", required=True)
        self.coefficients = params.get_float_vector(
            "coefficients", [1.0] * len(self.from_var)
        )
        if len(self.coefficients) != len(self.from_var):
            params.error("coefficients", "one coefficient per from_var")

    def forward(self, env):
        out = None
        for c, v in zip(self.coefficients, self.from_var):
            term = c * env[v]
            out = term if out is None else out + term
        return {self.to_var: out}


class ScalarParameterToState(_NEML2Model):
    """to_var = value (NEML2 ScalarParameterToState: constant parameter)."""

    def __init__(self, name, params):
        super().__init__(name, params)
        self.to_var = params.get_str("to_var", required=True)
        self.value = params.get_float("value", required=True)

    def forward(self, env):
        return {self.to_var: jnp.asarray(self.value)}


_MODEL_TYPES = {
    "ScalarMultiplication": ScalarMultiplication,
    "ScalarLinearCombination": ScalarLinearCombination,
    "ScalarParameterToState": ScalarParameterToState,
}


def load_neml2_model(path: str, model_name: str, cli_args: List[str] = ()):
    """Parse a NEML2 HIT input file and instantiate the named model.

    Supported subset: the algebra models in _MODEL_TYPES.  NEML2's
    [Settings] block is accepted (precision handled by the Domain)."""
    from .. import hit

    root = hit.load(path, list(cli_args))
    models = root.children.get("Models")
    if models is None:
        raise NEML2Error(f"No [Models] block in NEML2 input '{path}'")
    node = models.children.get(model_name)
    if node is None:
        raise NEML2Error(
            f"Model '{model_name}' not found in '{path}' "
            f"(available: {sorted(models.children)})"
        )
    p = Params(node)
    mtype = p.get_str("type", required=True)
    if mtype not in _MODEL_TYPES:
        raise NEML2Error(
            f"NEML2 model type '{mtype}' is not in marlin_tpu's supported "
            f"subset {sorted(_MODEL_TYPES)} (reference wraps the full NEML2 "
            "library; see computes/neml2.py)"
        )
    return _MODEL_TYPES[mtype](model_name, p)


@computes.register("NEML2TensorCompute")
class NEML2TensorCompute(TensorCompute):
    """Deck surface of reference NEML2TensorCompute.C: map marlin buffers to
    NEML2 variables, run the model, map outputs back."""

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.marlin_inputs = params.get_str_vector("marlin_inputs", [])
        self.neml2_inputs = params.get_str_vector("neml2_inputs", [])
        self.neml2_outputs = params.get_str_vector("neml2_outputs", [])
        self.marlin_outputs = params.get_str_vector("marlin_outputs", [])
        if len(self.marlin_inputs) != len(self.neml2_inputs):
            params.error("neml2_inputs", "one NEML2 variable per marlin input")
        if len(self.marlin_outputs) != len(self.neml2_outputs):
            params.error("marlin_outputs", "one marlin buffer per NEML2 output")

        fname = params.get_str("neml2_input_file", required=True)
        from .nn import resolve_data_file

        # same resolution rules as every other data file (deck-relative,
        # cwd, registered data roots)
        fname = resolve_data_file(fname, getattr(problem, "deck_dir", None))
        self.model = load_neml2_model(
            fname,
            params.get_str("neml2_model", required=True),
            params.get_str_vector("cli_args", []),
        )
        # every model input must be mapped, or forward() would die with a
        # bare KeyError from inside the jitted step
        needed = set(getattr(self.model, "from_var", []) or [])
        missing = needed - set(self.neml2_inputs)
        if missing:
            raise ComputeError(
                f"NEML2TensorCompute '{name}': model variables "
                f"{sorted(missing)} are not mapped by neml2_inputs "
                f"(mapped: {self.neml2_inputs})"
            )

        for b in self.marlin_inputs:
            if b not in self.inputs:
                self.inputs.append(b)
        self.outputs = list(self.marlin_outputs)

    def apply(self, state, ctx):
        env = {
            nv: state[mb] for mb, nv in zip(self.marlin_inputs, self.neml2_inputs)
        }
        result = self.model.forward(env)
        out = {}
        for nv, mb in zip(self.neml2_outputs, self.marlin_outputs):
            if nv not in result:
                raise ComputeError(
                    f"NEML2 model '{self.model.name}' did not produce '{nv}'"
                )
            arr = result[nv]
            out[mb] = jnp.broadcast_to(arr, self.domain.shape).astype(
                self.domain.dtype
            )
        return out
