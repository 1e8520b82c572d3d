"""Generate docs/syntax.md from the live registries: every deck-facing type
with its class docstring (which carries reference-file citations) and a
parameter table extracted from the constructor's typed Params accesses
(name, type, default, required) — the analog of MOOSE's validParams docs
(reference doc/content/).  Run:

    python docs/generate_syntax.py
"""

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# typed accessor -> human type name
_GETTERS = {
    "get_str": "string", "get_bool": "bool", "get_int": "int",
    "get_float": "float", "get_enum": "enum", "get_str_vector": "string[]",
    "get_float_vector": "float[]", "get_int_vector": "int[]",
}
_CALL_RE = re.compile(
    r"""(?:params|p)\.(get_\w+)\(\s*["']([^"']+)["']\s*(?:,\s*([^)\n]*))?\)""")
_CONST_RE = re.compile(
    r"""self\.constant\(\s*["']([^"']+)["']\s*(?:,\s*([^)\n]*))?\)""")
_INBUF_RE = re.compile(r"""self\.input_buffer\(\s*["']([^"']+)["']""")


def param_table(cls):
    """Best-effort static scan of a type's (and its bases') constructors for
    typed parameter reads.  Returns [(name, type, default, required)]."""
    rows, seen = [], set()
    for klass in cls.__mro__:
        if klass.__module__.split(".")[0] != "marlin_tpu":
            continue
        try:
            src = inspect.getsource(klass)
        except (OSError, TypeError):
            continue
        for m in _CALL_RE.finditer(src):
            getter, name, rest = m.group(1), m.group(2), m.group(3) or ""
            if getter not in _GETTERS or name in seen:
                continue
            seen.add(name)
            required = "required=True" in rest.replace(" ", "")
            default = ""
            if not required and rest:
                default = rest.split(",")[0].strip()
                if default.startswith("required"):
                    default = ""
                default = re.sub(r"^default\s*=\s*", "", default)
            if getter == "get_enum":
                # get_enum(key, choices, default)
                mm = re.match(r"\[([^\]]*)\]\s*,\s*(.*)", rest)
                if mm:
                    default = mm.group(2).split(",")[0].strip()
            rows.append((name, _GETTERS[getter], default, required))
        for m in _CONST_RE.finditer(src):
            name, rest = m.group(1), m.group(2) or ""
            if name in seen:
                continue
            seen.add(name)
            required = "required=True" in rest.replace(" ", "")
            default = "" if required else rest.split(",")[0].strip()
            rows.append((name, "float (deck constant)", default, required))
        for m in _INBUF_RE.finditer(src):
            name = m.group(1)
            if name not in seen:
                seen.add(name)
                rows.append((name, "buffer name", "", True))
    return rows


# Types documented inside a FAMILY prose page rather than a file of their
# own name (e.g. the three linear factors share ReciprocalLaplacianFactor.md).
# Every registered type must resolve to a prose page through either its own
# <Name>.md or an entry here — test_docs_complete enforces it.
GROUP_PAGES = {
    "BroydenSolver": "SecantSolver.md",
    "ComputeDisplacements": "FFTMechanics.md",
    "ComputeVonMisesStress": "FFTMechanics.md",
    "ComputeGroupExecutionCount": "Postprocessors.md",
    "ComputeReynoldsNumber": "Postprocessors.md",
    "ConstantReciprocalTensor": "ConstantTensor.md",
    "ElementAverageValue": "AuxPostprocessors.md",
    "ElementExtremeValue": "AuxPostprocessors.md",
    "ElementIntegralVariablePostprocessor": "AuxPostprocessors.md",
    "FunctionElementIntegral": "AuxPostprocessors.md",
    "NodalExtremeValue": "AuxPostprocessors.md",
    "ParsedPostprocessor": "AuxPostprocessors.md",
    "IterationPostprocessor": "AuxPostprocessors.md",
    "TensorSolverIterations": "AuxPostprocessors.md",
    "FFTGradientSquare": "FFTGradient.md",
    "GradientTensor": "FFTGradient.md",
    "InverseFFT": "ForwardFFT.md",
    "LBMApplyForces": "LBMComputeVelocity.md",
    "LBMComputeDensity": "LBMComputeVelocity.md",
    "LBMComputeForces": "LBMComputeVelocity.md",
    "LBMComputeVelocityMagnitude": "LBMComputeVelocity.md",
    "LBMComputeResidual": "LBMStream.md",
    "LBMComputeChemicalPotential": "LBMPhaseEquilibrium.md",
    "LBMIsotropicGradient": "LBMPhaseEquilibrium.md",
    "LBMIsotropicLaplacian": "LBMPhaseEquilibrium.md",
    "LBMConstantTensor": "LBMTensorUnitConverter.md",
    "LBMStackTensors": "LBMTensorUnitConverter.md",
    "LBMD3Q19": "LBMD2Q9.md",
    "LBMD3Q27": "LBMD2Q9.md",
    "LBMFixedZerothOrderBC": "LBMFixedFirstOrderBC.md",
    "LBMMRTCollision": "LBMBGKCollision.md",
    "LBMSmagorinskyCollision": "LBMBGKCollision.md",
    "LBMSmagorinskyMRTCollision": "LBMBGKCollision.md",
    "LBMNeumannBC": "LBMDirichletBC.md",
    "MacroscopicShearTensor": "RankTwoIdentity.md",
    "PhaseMechanicsTest": "RankTwoIdentity.md",
    "ParsedTensor": "ParsedCompute.md",
    "RealSpaceForwardEuler": "ForwardEulerSolver.md",
    "ReciprocalIntegral": "Postprocessors.md",
    "ReciprocalLaplacianSquareFactor": "ReciprocalLaplacianFactor.md",
    "SwiftHohenbergLinear": "ReciprocalLaplacianFactor.md",
    "ReciprocalMatDiffusion": "ReciprocalAllenCahn.md",
    "SemiImplicitCriticalTimeStep": "Postprocessors.md",
    "SemiImplicitSolver": "AdamsBashforthMoulton.md",
    "TensorAveragePostprocessor": "Postprocessors.md",
    "TensorExtremeValuePostprocessor": "Postprocessors.md",
    "TensorHistogram": "Postprocessors.md",
    "TensorIntegralChangePostprocessor": "Postprocessors.md",
    "TensorIntegralPostprocessor": "Postprocessors.md",
    "TensorInterfaceVelocityPostprocessor": "Postprocessors.md",
}


def main():
    from marlin_tpu import registry
    import marlin_tpu.computes  # noqa: F401
    import marlin_tpu.solvers  # noqa: F401
    import marlin_tpu.postprocessors  # noqa: F401
    import marlin_tpu.xdmf  # noqa: F401  (registers XDMFTensorOutput)
    import marlin_tpu.outputs  # noqa: F401

    sections = [
        ("TensorComputes (Initialize / Solve / Postprocess / Boundary)", registry.computes),
        ("TensorSolver", registry.solvers),
        ("Postprocessors / VectorPostprocessors", registry.postprocessors),
        ("TensorSolver/Predictors", registry.predictors),
        ("Stencil", registry.stencils),
        ("TensorOutputs", registry.outputs),
    ]
    # executioner-wired types (no registry): link their prose pages
    structural_pages = [
        ("Terminator", "[UserObjects] watchdog"),
        ("TensorSolveIterationAdaptiveDT",
         "[Executioner]/[TimeStepper] adaptive dt"),
    ]
    out = [
        "# marlin_tpu deck syntax reference",
        "",
        "Generated by `python docs/generate_syntax.py` from the live type",
        "registries — every name here is constructible from a deck block.",
        "Docstrings cite the reference implementation they reproduce.",
        "",
        "Structural blocks: `[Domain]` (dim/nx/ny/nz/min/max, parallel_mode =",
        "NONE|FFT_SLAB|FFT_PENCIL|REAL_SPACE, floating_precision), `[Mesh]`",
        "(UniformTensorMesh / GeneratedMeshGenerator), `[TensorBuffers]`",
        "(PlainTensorBuffer, LBMTensorBuffer via buffer_type = df|mv|ms,",
        "VectorTensor, SR2Tensor; map_to_aux_variable, value_dimensions,",
        "reciprocal), `[AuxVariables]`/`[AuxKernels]` (ProjectTensorAux,",
        "ProjectVectorTensorAux), `[Postprocessors]`, `[Functions]`,",
        "`[UserObjects]` (Terminator), `[Executioner]` (Transient +",
        "TimeStepper IterationAdaptiveDT / TensorSolveIterationAdaptiveDT),",
        "`[TensorOutputs]` (XDMFTensorOutput), `[Outputs]` (csv, exodus,",
        "perf_graph, file_base), `[Problem]` (TensorProblem /",
        "LatticeBoltzmannProblem, scalar_constant_names/values,",
        "spectral_solve_substeps, strict_params), `[GlobalParams]`.",
        "",
        "Per-class prose pages (usage, math, TPU-specific behavior) for the",
        "most-used types live in [docs/types/](types/README.md); a type",
        "below links there when a page exists.",
        "",
    ]
    for title, reg in sections:
        out.append(f"## {title}\n")
        by_cls = {}
        for name, cls in sorted(reg._classes.items()):
            by_cls.setdefault(cls, []).append(name)
        for cls, names in sorted(by_cls.items(), key=lambda kv: kv[1][0]):
            doc = inspect.getdoc(cls) or ""
            doc = doc.split("\n\n")[0].replace("\n", " ")
            alias = f" (alias: {', '.join(names[1:])})" if len(names) > 1 else ""
            out.append(f"### {names[0]}{alias}\n")
            # a type's OWN page (under any of its names) outranks a
            # family page routed via GROUP_PAGES (r05 review)
            page_file = None
            for n in names:
                if os.path.exists(os.path.join(
                        os.path.dirname(__file__), "types", f"{n}.md")):
                    page_file = f"{n}.md"
                    break
            if page_file is None:
                for n in names:
                    if n in GROUP_PAGES:
                        page_file = GROUP_PAGES[n]
                        break
            if page_file is not None:
                doc += f"  [Prose page →](types/{page_file})"
            out.append(doc)
            rows = param_table(cls)
            if rows:
                out.append("")
                out.append("| parameter | type | default | required |")
                out.append("|---|---|---|---|")
                for name, typ, default, required in sorted(rows):
                    out.append(
                        f"| `{name}` | {typ} | {default or '—'} | "
                        f"{'yes' if required else ''} |")
            out.append("")
    out.append("## Executioner-wired types\n")
    for name, where in structural_pages:
        page = os.path.join(os.path.dirname(__file__), "types", f"{name}.md")
        link = (f" [Prose page →](types/{name}.md)"
                if os.path.exists(page) else "")
        out.append(f"- **{name}** — {where}.{link}")
    out.append("")
    path = os.path.join(os.path.dirname(__file__), "syntax.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(out)} lines)")


if __name__ == "__main__":
    main()
