"""[TensorOutputs] registry (reference AddTensorOutputAction +
src/tensor_outputs/)."""

from __future__ import annotations

from .params import Params


class OutputError(Exception):
    pass


def build_tensor_outputs(node, problem, output_dir=".", default_file_base=None):
    outs = []
    for b in node.blocks():  # blocks() honors `active =` / `inactive =`
        p = Params(b, problem.global_params)
        t = p.get_str("type", required=True)
        if t == "XDMFTensorOutput":
            from .xdmf import XDMFTensorOutput

            outs.append(
                XDMFTensorOutput(
                    b.name, p, problem, output_dir,
                    default_file_base=default_file_base,
                )
            )
        else:
            # the reference errors on unregistered output types; silent
            # skips would make a mistyped deck write nothing
            raise OutputError(f"Unknown [TensorOutputs] type '{t}' (block '{b.name}')")
    return outs
