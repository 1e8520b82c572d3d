"""Neural-network constitutive models.

LibtorchGibbsEnergy (reference src/tensor_computes/LibtorchGibbsEnergy.C:
28-115): a TorchScript Gibbs-energy surrogate G(eta..., c...) whose autograd
jacobian supplies chemical potentials and Allen-Cahn driving forces.

TPU-native design: the TorchScript module is loaded once with torch (CPU) and
exposed to the traced compute graph through `jax.pure_callback` that returns
the full jacobian (computed with torch.autograd on the host).  This keeps
arbitrary TorchScript models working inside the jitted solve; simple analytic
surrogates can alternatively be expressed as ParsedCompute expressions for a
fully on-device path.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..registry import computes
from .base import ComputeError, TensorCompute

#: search roots for MOOSE-style `app:relative/path` data files
DATA_ROOTS = ["/root/reference/data"]


def resolve_data_file(path: str, deck_dir=None) -> str:
    if ":" in path and not os.path.isabs(path):
        _app, rel = path.split(":", 1)
        for root in DATA_ROOTS:
            candidate = os.path.join(root, rel)
            if os.path.exists(candidate):
                return candidate
        raise ComputeError(f"Data file '{path}' not found under {DATA_ROOTS}")
    if os.path.isabs(path):
        return path
    for base in filter(None, [deck_dir, "."] + DATA_ROOTS):
        candidate = os.path.join(base, path)
        if os.path.exists(candidate):
            return candidate
    raise ComputeError(f"Data file '{path}' not found")


@computes.register("LibtorchGibbsEnergy")
class LibtorchGibbsEnergy(TensorCompute):
    def __init__(self, name, params: Params, problem):
        super().__init__(name, params, problem)
        self.phase_fractions = params.get_str_vector("phase_fractions", required=True)
        self.concentrations = params.get_str_vector("concentrations", required=True)
        self.domega_detas = params.get_str_vector("domega_detas", required=True)
        self.chem_pots = params.get_str_vector("chem_pots", required=True)
        if len(self.phase_fractions) != len(self.domega_detas):
            params.error(
                "domega_detas", "Number of phases must match number of domega_deta buffers."
            )
        if len(self.concentrations) != len(self.chem_pots):
            params.error(
                "chem_pots",
                "Number of concentrations must match number of chemical potential buffers.",
            )
        for n in self.phase_fractions + self.concentrations:
            if n not in self.inputs:
                self.inputs.append(n)
        self.G_buffer = self.out  # the `buffer` param names the Gibbs buffer
        self.outputs = [self.G_buffer] + self.domega_detas + self.chem_pots

        import torch

        model_path = resolve_data_file(
            params.get_str("libtorch_model_file", required=True),
            getattr(problem, "deck_dir", None),
        )
        self._torch = torch
        self._model = torch.jit.load(model_path, map_location="cpu")
        self._model.eval()

    def _host_eval(self, X_flat: np.ndarray):
        """Host-side: G and dG/dX via torch autograd
        (the reference's forward + torch::autograd::grad)."""
        torch = self._torch
        x = torch.tensor(np.asarray(X_flat, dtype=np.float64), requires_grad=True)
        G = self._model(x).squeeze()
        (jac,) = torch.autograd.grad(G.sum(), x)
        return (
            G.detach().numpy().astype(X_flat.dtype),
            jac.detach().numpy().astype(X_flat.dtype),
        )

    def apply(self, state, ctx):
        names = self.phase_fractions + self.concentrations
        X = jnp.stack([state[n] for n in names], axis=-1)
        batch_shape = X.shape[:-1]
        n_in = X.shape[-1]
        X_flat = X.reshape(-1, n_in)
        flat = X_flat.shape[0]
        dtype = X_flat.dtype

        G_flat, jac_flat = jax.pure_callback(
            self._host_eval,
            (
                jax.ShapeDtypeStruct((flat,), dtype),
                jax.ShapeDtypeStruct((flat, n_in), dtype),
            ),
            X_flat,
            vmap_method="sequential",
        )
        out = {self.G_buffer: G_flat.reshape(batch_shape)}
        k = 0
        for name in self.domega_detas:
            out[name] = jac_flat[:, k].reshape(batch_shape)
            k += 1
        for name in self.chem_pots:
            out[name] = jac_flat[:, k].reshape(batch_shape)
            k += 1
        return out
