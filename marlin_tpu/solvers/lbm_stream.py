"""LBM streaming solver.

Re-design of reference LBMStream (src/tensor_solver/LBMStream.C:51-80):
per-direction periodic roll of the old post-collision distribution, with
solid masking.  The q rolls are static-shift jnp.roll calls XLA fuses into
one gather."""

from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..registry import solvers
from .base import TensorSolver


@solvers.register("LBMStream")
class LBMStream(TensorSolver):
    is_lbm_stream = True

    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.buffers_ = params.get_str_vector("buffer")
        self.f_old = params.get_str_vector("f_old")
        if len(self.buffers_) != len(self.f_old):
            params.error("buffer", "Must have the same number of entries as 'f_old'")

    def history_requests(self):
        return {n: 1 for n in self.f_old}

    def output_buffers(self):
        return super().output_buffers() + list(self.buffers_)

    def extra_input_buffers(self):
        return super().extra_input_buffers() + list(self.f_old)

    def stream(self, state):
        stencil = self.problem.lbm_stencil()
        buffers = dict(state["buffers"])
        for out, old_name in zip(self.buffers_, self.f_old):
            fold = state["old"][old_name][0]
            comps = [
                jnp.roll(
                    fold[..., i],
                    (int(stencil.ex[i]), int(stencil.ey[i]), int(stencil.ez[i])),
                    (0, 1, 2),
                )
                for i in range(stencil.q)
            ]
            u = jnp.stack(comps, -1)
            mask = self.problem.lbm_solid_mask()
            if mask is not None:
                u = jnp.where(jnp.asarray(mask)[..., None], 0.0, u)
            buffers[out] = u
        return {**state, "buffers": buffers}
