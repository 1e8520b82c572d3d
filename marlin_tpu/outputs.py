"""Tensor field outputs (XDMF/HDF5).  Placeholder registry for round-1;
the XDMF writer lands with the output milestone."""

from __future__ import annotations

from .params import Params


def build_tensor_outputs(node, problem, output_dir=".", default_file_base=None):
    outs = []
    for b in node.blocks():
        p = Params(b, problem.global_params)
        t = p.get_str("type")
        if t == "XDMFTensorOutput":
            from .xdmf import XDMFTensorOutput

            outs.append(
                XDMFTensorOutput(
                    b.name, p, problem, output_dir,
                    default_file_base=default_file_base,
                )
            )
        # unknown output types are skipped for now
    return outs
