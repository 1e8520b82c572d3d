"""Tensor predictors: initial-guess extrapolation for iterative solvers.

Re-design of reference TensorPredictor / LinearTensorPredictor
(src/tensor_predictor/LinearTensorPredictor.C:15-29): u += scale·(u_old0 −
u_old1) when two old states exist.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..registry import predictors


class TensorPredictor:
    def __init__(self, name: str, params: Params, problem):
        self.name = name
        self.params = params
        self.problem = problem
        self.buffer = params.get_str("buffer", required=True)
        self.history_size = params.get_int("history_size", 1)

    def history_requests(self):
        return {self.buffer: self.history_size}

    def apply(self, state):
        raise NotImplementedError


@predictors.register("LinearTensorPredictor")
class LinearTensorPredictor(TensorPredictor):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.history_size = 2
        self.scale = params.get_float("scale", 1.0)

    def apply(self, state):
        old = state["old"][self.buffer]
        n_old = jnp.minimum(state["n_advances"], old.shape[0])
        buffers = dict(state["buffers"])
        u = buffers[self.buffer]
        # only active once two old states exist (reference :19-21)
        diff = jnp.where(n_old > 1, (old[0] - old[1]) * self.scale, 0.0)
        buffers[self.buffer] = u + diff.astype(u.dtype)
        return {**state, "buffers": buffers}
