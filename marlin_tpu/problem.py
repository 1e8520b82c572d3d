"""TensorProblem: owns buffers, computes, solver, postprocessors.

Re-design of reference TensorProblem (src/problems/TensorProblem.C, 850 LoC)
as a builder that turns a parsed deck into pure jitted step functions over a
state pytree:

    state = {"buffers": {...}, "old": {...}, "n_advances": i32, "old_dt": f[],
             "solver": {...}}

One MOOSE timestep (including all solver substeps) is a single jit region —
the reference's per-substep C++ dispatch (TensorProblem::execute →
TensorSolver::computeBuffer, :154-197) plus its torch-JIT graph execution
collapse into one XLA program.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from . import computes as _computes_pkg  # noqa: F401  (registers compute types)
from . import solvers as _solvers_pkg  # noqa: F401  (registers solver types)
from .computes.base import ComputeError, ComputeGroup, TensorCompute
from .domain import Domain, ParallelMode, Precision
from .expression import CompiledExpression
from .hit import HitNode
from .params import ParamError, Params
from .postprocessors import Postprocessor
from .registry import computes as compute_registry
from .registry import postprocessors as pp_registry
from .registry import predictors as predictor_registry
from .registry import solvers as solver_registry


class ProblemError(Exception):
    pass


def _is_backend_rejection(e) -> bool:
    """True only for a backend/compiler rejection of a jitted program (the
    signatures the axon backend emits when it refuses the fused step+pp
    program).  A genuine first-step failure — user expression error, NaN
    guard, shape mismatch — must propagate instead of being misreported as
    'backend rejected the fused program' and silently re-run through the
    split path (r03 advisor finding)."""
    if type(e).__name__ not in (
        "XlaRuntimeError", "JaxRuntimeError", "RuntimeError", "OSError"
    ):
        return False
    msg = str(e)
    return any(s in msg for s in (
        "UNIMPLEMENTED", "FAILED_PRECONDITION", "INTERNAL", "UNAVAILABLE",
        "ABORTED", "RESOURCE_EXHAUSTED", "compil"))


_zeros_programs = {}


def host_zeros(shape, dtype):
    """Allocate zeros safely on any backend.

    The axon TPU backend rejects several eager host->device paths (complex
    transfers, dtype-converting device_puts) with UNIMPLEMENTED errors that
    can poison downstream ops, so on non-CPU backends ALL zeros are produced
    ON DEVICE by a tiny compiled program — zero host transfers.  CPU keeps
    the cheap numpy route."""
    import numpy as np

    shape = tuple(int(x) for x in shape)
    if jax.default_backend() == "cpu":
        return jnp.asarray(np.zeros(shape, dtype=np.dtype(jnp.dtype(dtype))))
    key = (shape, jnp.dtype(dtype).name)
    if key not in _zeros_programs:
        _zeros_programs[key] = jax.jit(lambda: jnp.zeros(shape, dtype))
    return _zeros_programs[key]()


def build_domain(node: Optional[HitNode], mesh=None, mesh_node: Optional[HitNode] = None) -> Domain:
    if node is None:
        if mesh_node is not None and mesh_node.get("type") == "UniformTensorMesh":
            # [Mesh] type = UniformTensorMesh (reference
            # src/mesh/UniformTensorMesh.C:19-70): the grid IS the mesh
            p = Params(mesh_node)
            dim = p.get_int("dim", required=True)
            return Domain(
                dim=dim,
                n=[p.get_int("nx", 1), p.get_int("ny", 1), p.get_int("nz", 1)],
                mins=[0.0, 0.0, 0.0],
                maxs=[p.get_float("xmax", 1.0), p.get_float("ymax", 1.0), p.get_float("zmax", 1.0)],
                mesh=mesh,
            )
        if mesh_node is not None:
            # MOOSE-FEM-only decks ([Mesh] GeneratedMeshGenerator, e.g.
            # reference test/tests/misc/shiftedfunction.i): build an
            # equivalent uniform grid for function sampling/integration
            for b in mesh_node.blocks():
                p = Params(b)
                if p.get_str("type") == "GeneratedMeshGenerator":
                    dim = p.get_int("dim", 1)
                    return Domain(
                        dim=dim,
                        n=[p.get_int("nx", 1), p.get_int("ny", 1), p.get_int("nz", 1)],
                        mins=[p.get_float("xmin", 0.0), p.get_float("ymin", 0.0), p.get_float("zmin", 0.0)],
                        maxs=[p.get_float("xmax", 1.0), p.get_float("ymax", 1.0), p.get_float("zmax", 1.0)],
                    )
        raise ProblemError("Missing [Domain] block")
    p = Params(node)
    dim = p.get_int("dim", required=True)
    n = [p.get_int("nx", 1), p.get_int("ny", 1), p.get_int("nz", 1)]
    mins = [p.get_float("xmin", 0.0), p.get_float("ymin", 0.0), p.get_float("zmin", 0.0)]
    maxs = [p.get_float("xmax", 1.0), p.get_float("ymax", 1.0), p.get_float("zmax", 1.0)]
    mode = ParallelMode(p.get_enum(
        "parallel_mode", [m.value for m in ParallelMode], "NONE"))
    precision = Precision(p.get_enum(
        "floating_precision", [x.value for x in Precision], "DEVICE_DEFAULT"))
    from .domain import FFTBackend

    backend = FFTBackend(p.get_enum(
        "fft_backend", [b.value for b in FFTBackend], "DEFAULT"))
    return Domain(
        dim=dim, n=n, mins=mins, maxs=maxs, parallel_mode=mode,
        floating_precision=precision, mesh=mesh, fft_backend=backend,
        debug=p.get_bool("debug", False),
    )


class TensorProblem:
    def __init__(self, root: HitNode, mesh=None, deck_dir: Optional[str] = None):
        self.root = root
        self.deck_dir = deck_dir
        gp = root.children.get("GlobalParams")
        self.global_params = dict(gp.params) if gp is not None else {}

        self.domain = build_domain(
            root.children.get("Domain"), mesh=mesh,
            mesh_node=root.children.get("Mesh"),
        )
        self.max_ghost_layers = 0

        # -- problem-level constants (reference TensorProblem.C:38-39,57-60)
        self.constants: Dict[str, float] = {}
        prob = root.children.get("Problem")
        self.problem_params = Params(prob, self.global_params)
        names = self.problem_params.get_str_vector("scalar_constant_names")
        values = self.problem_params.get_float_vector("scalar_constant_values")
        if len(names) != len(values):
            raise ProblemError("scalar_constant_names/values length mismatch")
        self.constants.update(dict(zip(names, values)))
        self._fetched_constants: List[str] = []
        self.spectral_solve_substeps = self.problem_params.get_int(
            "spectral_solve_substeps", 1
        )
        self.print_debug_output = self.problem_params.get_bool(
            "print_debug_output", False
        )
        # opt-in batching of independent same-shape FFT computes (and the
        # solver's per-variable inverse transforms) into single batched
        # transforms — marlin_tpu perf extension for multi-variable decks
        # on small grids (e.g. benchmark 2a), where per-transform fixed
        # cost dominates.  Serial mode only; distributed decks keep the
        # per-variable transforms.
        self.batch_fft = self.problem_params.get_bool("batch_fft", False)
        self.is_lbm = (
            self.problem_params.get_str("type", "TensorProblem")
            == "LatticeBoltzmannProblem"
        )
        # LBM problem options (reference LatticeBoltzmannProblem.C:14-33)
        self.lbm_substeps = self.problem_params.get_int("substeps", 1)
        self.lbm_tolerance = self.problem_params.get_float("tolerance", 1.0e-15)
        self.lbm_binary_media = self.problem_params.get_str("binary_media", None)
        # opt-in fused stream+collide Pallas kernel (marlin_tpu extension;
        # pallas_lbm.py — the hot path for production LBM on TPU)
        self.lbm_backend = self.problem_params.get_enum(
            "lbm_backend", ["JNP", "PALLAS"], "JNP"
        )
        self._lbm_fused_plan = None
        self._lbm_solid_mask = None
        self._lbm_binary_np = None

        # -- functions ------------------------------------------------------
        self.functions: Dict[str, CompiledExpression] = {}
        fns = root.children.get("Functions")
        if fns is not None:
            for b in fns.blocks():
                p = Params(b, self.global_params)
                ftype = p.get_str("type", "ParsedFunction")
                if ftype == "ShiftedFunction":
                    # resolved after all functions are built
                    continue
                expr = p.get_str("expression", p.get_str("value", "0"))
                consts = {"pi": math.pi, "e": math.e}
                # MOOSE ParsedFunction constants (symbol_names/values or the
                # legacy vars/vals spelling); non-numeric values reference
                # other functions (composition, used by reference
                # test/tests/tensor_compute/rotating_grain*.i)
                syms = p.get_str_vector("symbol_names", p.get_str_vector("vars"))
                vals = p.get_str_vector("symbol_values", p.get_str_vector("vals"))
                fn_symbols = []
                for sname, sval in zip(syms, vals):
                    try:
                        consts[sname] = float(sval)
                    except ValueError:
                        fn_symbols.append((sname, sval))
                ce = CompiledExpression(
                    expr,
                    ["x", "y", "z", "t"] + [n for n, _ in fn_symbols],
                    constants=consts,
                )
                if fn_symbols:

                    def make(ce, fn_symbols):
                        def call(env):
                            scope = dict(env)
                            for sname, fname in fn_symbols:
                                scope[sname] = self.functions[fname](env)
                            return ce(scope)

                        return call

                    self.functions[b.name] = make(ce, fn_symbols)
                else:
                    self.functions[b.name] = ce
            # ShiftedFunction: wrap another function with a time/space offset
            # (reference src/functions/ShiftedFunction.C)
            for b in fns.blocks():
                p = Params(b, self.global_params)
                if p.get_str("type") != "ShiftedFunction":
                    continue
                inner = self.functions[p.get_str("function", required=True)]
                shift = p.get_float_vector("shift", [0.0, 0.0, 0.0])
                while len(shift) < 3:
                    shift.append(0.0)
                tshift = p.get_float("delta_t", 0.0)

                def make(inner, shift, tshift):
                    def call(env):
                        shifted = {
                            "x": env["x"] + shift[0],
                            "y": env["y"] + shift[1],
                            "z": env["z"] + shift[2],
                            "t": env["t"] + tshift,
                        }
                        return inner(shifted)

                    return call

                self.functions[b.name] = make(inner, shift, tshift)

        # -- explicit buffers ----------------------------------------------
        self.buffer_specs: Dict[str, Params] = {}
        tb = root.children.get("TensorBuffers")
        if tb is not None:
            for b in tb.blocks():
                self.buffer_specs[b.name] = Params(b, self.global_params)

        # -- stencils (LBM) -------------------------------------------------
        self.stencils = {}
        st = root.children.get("Stencil")
        if st is not None:
            from .registry import stencils as stencil_registry

            for b in st.blocks():
                p = Params(b, self.global_params)
                self.stencils[b.name] = stencil_registry.create(
                    p.get_str("type", required=True), b.name, p, self
                )

        # -- computes -------------------------------------------------------
        tc = root.children.get("TensorComputes")
        ic_nodes = tc.children.get("Initialize") if tc else None
        solve_nodes = tc.children.get("Solve") if tc else None
        pp_nodes = tc.children.get("Postprocess") if tc else None
        bc_nodes = tc.children.get("Boundary") if tc else None

        self.ic_computes = self._build_group("_initialize", ic_nodes)
        self.solve_computes = (
            [self._build_compute(b) for b in solve_nodes.blocks()]
            if solve_nodes is not None
            else []
        )
        self.pp_computes = self._build_group("_postprocess", pp_nodes)
        self.bc_computes = (
            [self._build_compute(b) for b in bc_nodes.blocks()]
            if bc_nodes is not None
            else []
        )

        # -- aux-variable coupling surface (reference mapBuffersToAux /
        # ProjectTensorAux, src/problems/TensorProblem.C:250-379) ------------
        from .aux import AuxSystem

        self.aux = AuxSystem(self, root)

        # -- solver ---------------------------------------------------------
        self.solver = None
        self._solverless_group = None  # batch_fft-fused per-step computes
        self._build_solver(root)

        # -- postprocessors --------------------------------------------------
        self.postprocessors: List[Postprocessor] = []
        pps = root.children.get("Postprocessors")
        if pps is not None:
            for b in pps.blocks():
                p = Params(b, self.global_params)
                self.postprocessors.append(
                    pp_registry.create(p.get_str("type", required=True), b.name, p, self)
                )
        for pp in self.postprocessors:
            # cross-pp validation after ALL are built (forward references
            # between pps are legal in MOOSE decks)
            pp.check(self)

        self._step_fns = {}
        self._pp_fns = {}
        self._initialized = False
        self.compute_count = 0

        # vector postprocessors ([VectorPostprocessors])
        self.vector_postprocessors = []
        vpps = root.children.get("VectorPostprocessors")
        if vpps is not None:
            for b in vpps.blocks():
                p = Params(b, self.global_params)
                self.vector_postprocessors.append(
                    pp_registry.create(p.get_str("type", required=True), b.name, p, self)
                )

    # ------------------------------------------------------------------
    def _build_compute(self, node: HitNode) -> TensorCompute:
        params = Params(node, self.global_params)
        tname = params.get_str("type")
        children = node.blocks()
        if tname is None or tname == "ComputeGroup":
            members = [self._build_compute(b) for b in children]
            return ComputeGroup(node.name, params, self, members)
        cls = compute_registry.get(tname)
        return cls(node.name, params, self)

    def _build_group(self, name: str, node: Optional[HitNode]) -> ComputeGroup:
        members = [self._build_compute(b) for b in node.blocks()] if node is not None else []
        return ComputeGroup(name, Params(None, self.global_params), self, members)

    def _build_solver(self, root: HitNode):
        ts = root.children.get("TensorSolver")
        tti = root.children.get("TensorTimeIntegrators")
        if ts is not None:
            params = Params(ts, self.global_params)
            cls = solver_registry.get(params.get_str("type", required=True))
            self.solver = cls(ts.name, params, self)
            root_name = params.get_str("root_compute")
            # predictors sub-block
            preds = ts.children.get("Predictors")
            if preds is not None:
                for b in preds.blocks():
                    p = Params(b, self.global_params)
                    pred = predictor_registry.create(
                        p.get_str("type", required=True), b.name, p, self
                    )
                    getattr(self.solver, "predictors", []).append(pred)
        elif tti is not None:
            # legacy [TensorTimeIntegrators] FFTSemiImplicit blocks
            # (reference benchmarks/01_spinodal_decomposition/1a.i:114-121;
            # the block maps exactly onto an AdamsBashforthMoulton solver of
            # predictor order history_size+1 with substeps from the Problem's
            # spectral_solve_substeps — see src/tensor_timeintegrators/
            # FFTSemiImplicit.C:42-63 whose order-2 update equals AB2)
            buffers, rbufs, lins, nonlins = [], [], [], []
            history = 1
            for b in tti.blocks():
                p = Params(b, self.global_params)
                if p.get_str("type") != "FFTSemiImplicit":
                    raise ProblemError(
                        f"Unsupported TensorTimeIntegrator type {p.get_str('type')}"
                    )
                buffers.append(p.get_str("buffer", required=True))
                rbufs.append(p.get_str("reciprocal_buffer", required=True))
                lins.append(p.get_str("linear_reciprocal", "0"))
                nonlins.append(p.get_str("nonlinear_reciprocal", required=True))
                history = max(history, p.get_int("history_size", 1))
            synth = HitNode("_fft_semi_implicit")
            synth.set_param("buffer", " ".join(buffers))
            synth.set_param("reciprocal_buffer", " ".join(rbufs))
            synth.set_param("linear_reciprocal", " ".join(lins))
            synth.set_param("nonlinear_reciprocal", " ".join(nonlins))
            synth.set_param("predictor_order", str(history + 1))
            synth.set_param("corrector_steps", "0")
            synth.set_param("substeps", str(self.spectral_solve_substeps))
            # marlin_tpu perf extensions forwarded from [Problem] (legacy
            # decks have no [TensorSolver] block to carry them):
            # `Problem/carry_reciprocal=true Problem/fused_spectral=true`
            for extra in ("carry_reciprocal", "fused_spectral"):
                v = self.problem_params.get_str(extra, None)
                if v is not None:
                    synth.set_param(extra, v)
            cls = solver_registry.get("AdamsBashforthMoulton")
            self.solver = cls(synth.name, Params(synth, self.global_params), self)
            root_name = None
        else:
            # no solver block: batch_fft must still validate (and fuse) —
            # the TOP-LEVEL per-step computes run in DECLARED order
            # (reference TensorProblem::execute else-branch,
            # TensorProblem.C:186-188), so the wrapper group is fused
            # unsorted; NESTED groups are dependency-sorted everywhere in
            # the reference, so sort them first or fuse_ffts would freeze
            # their declared order (silently different execution order vs
            # the unbatched path)
            if self.batch_fft:
                group = ComputeGroup(
                    "_solve_root",
                    Params(None, self.global_params),
                    self,
                    self.solve_computes,
                )
                for m in group.members:
                    if isinstance(m, ComputeGroup):
                        m.sort()
                self._apply_batch_fft(group)
                self._solverless_group = group
            return

        # resolve root compute (reference CreateTensorSolverAction.C:30-60:
        # auto ComputeGroup encompassing all solve computes if unspecified)
        if root_name is not None:
            named = {c.name: c for c in self.solve_computes}
            if root_name not in named:
                raise ProblemError(f"root_compute '{root_name}' not found")
            root_compute = named[root_name]
        else:
            root_compute = ComputeGroup(
                "_solve_root", Params(None, self.global_params), self, self.solve_computes
            )
        if isinstance(root_compute, ComputeGroup):
            root_compute.sort()
        self.solver.bind(root_compute)
        if getattr(self.solver, "carry_reciprocal", False):
            self.solver.prune_reciprocal_ffts()
        if self.batch_fft:
            self._apply_batch_fft(root_compute)

    def _apply_batch_fft(self, group):
        """Validate `[Problem] batch_fft = true` (serial-only, spectral
        problems only) and fuse a group's FFT runs — shared by the solver
        root group and the solverless per-step group, so the documented
        rejections fire for both deck shapes."""
        from .domain import ParallelMode

        if self.is_lbm:
            # the LBM substep loop builds its own compute groups
            # (_lbm_step_impl) and no reference LBM chain contains spectral
            # transforms — reject rather than silently ignore the knob
            raise ProblemError(
                "[Problem] batch_fft = true does not apply to "
                "LatticeBoltzmannProblem (LBM solve chains contain no "
                "spectral transforms); remove it"
            )
        if self.domain.parallel_mode != ParallelMode.NONE:
            raise ProblemError(
                "[Problem] batch_fft = true is serial-only (the "
                "distributed transforms shard per field); remove it "
                "for parallel_mode != NONE decks"
            )
        if isinstance(group, ComputeGroup):
            group.fuse_ffts()

    # -- services used by computes ------------------------------------------
    def lbm_stencil(self):
        if len(self.stencils) != 1:
            raise ProblemError(
                "LatticeBoltzmannProblem requires exactly one [Stencil] block"
            )
        return next(iter(self.stencils.values()))

    def lbm_solid_mask(self):
        """Static solid mask (binary_media == 0), numpy bool or None
        (reference maskedFillSolids is a no-op without binary media)."""
        return self._lbm_solid_mask

    def lbm_binary_media_np(self):
        return self._lbm_binary_np

    def get_compute(self, name: str) -> TensorCompute:
        """Find a compute by name anywhere in the solve/IC/postprocess trees
        (reference TensorProblem::getComputes + getCompute<T>)."""

        def search(members):
            for m in members:
                if m.name == name:
                    return m
                if isinstance(m, ComputeGroup):
                    found = search(m.members)
                    if found is not None:
                        return found
            return None

        for pool in (
            self.solve_computes,
            [self.ic_computes, self.pp_computes],
            self.bc_computes,
        ):
            found = search(pool)
            if found is not None:
                return found
        raise ProblemError(f"Compute '{name}' not found.")

    def get_constant(self, name: str) -> float:
        """Fetch a named constant.  Fetch-before-declare is recorded and
        reported at init, matching the reference's deferred error
        (TensorProblem::execute EXEC_INITIAL check, TensorProblem.C:156-166)."""
        if name not in self.constants:
            try:
                return float(name)
            except ValueError:
                if name not in self._fetched_constants:
                    self._fetched_constants.append(name)
                return 0.0
        return self.constants[name]

    def declare_constant(self, name: str, value: float):
        self.constants[name] = value

    def get_function(self, name: str) -> CompiledExpression:
        if name not in self.functions:
            raise ProblemError(f"Function '{name}' not found")
        return self.functions[name]

    def get_stencil(self, name: str):
        if name not in self.stencils:
            raise ProblemError(f"Stencil '{name}' not found")
        return self.stencils[name]

    def request_ghost_layers(self, g: int):
        self.max_ghost_layers = max(self.max_ghost_layers, g)

    def local_tensor_shape(self, extra_dims=()):
        return self.domain.shape + tuple(extra_dims)

    def declared_buffer_shape(self, name: str):
        """Full declared shape of an explicitly declared buffer, or None
        (implicit buffers take the compute's natural output shape)."""
        spec = self.buffer_specs.get(name)
        if spec is None:
            return None
        btype = spec.get_str("type", "PlainTensorBuffer")
        if btype == "LBMTensorBuffer" or spec.has("buffer_type"):
            return self._lbm_buffer_shape(spec)
        vdims = spec.get_int_vector("value_dimensions", [])
        # NEML2 primitive-typed buffers (reference
        # src/tensor_buffers/NEML2TensorBuffer.C maps neml2::Vector/SR2/R2/
        # SSR4/Rot onto trailing value dims):
        if btype == "VectorTensor":
            vdims = vdims or [3]
        elif btype == "SR2Tensor":
            vdims = vdims or [6]  # Mandel symmetric rank-2
        elif btype == "R2Tensor":
            vdims = vdims or [3, 3]
        elif btype == "SSR4Tensor":
            vdims = vdims or [6, 6]  # Mandel symmetric rank-4
        elif btype == "RotTensor":
            vdims = vdims or [3]  # modified Rodrigues parameters
        if spec.get_bool("reciprocal", False):
            return self.domain.reciprocal_value_shape(vdims)
        return self.domain.value_shape(vdims)

    def _lbm_buffer_shape(self, spec: Params):
        dom = self.domain
        btype = spec.get_str("buffer_type", required=True)
        shape = list(dom.shape)
        while len(shape) < 3:
            shape.append(1)
        if btype == "df":
            shape.append(self.lbm_stencil().q)
        elif btype == "mv":
            shape.append(dom.dim)
        elif btype == "ms":
            pass
        else:
            raise ProblemError(f"Buffer type {btype} is not recognized")
        return tuple(shape)

    def _init_lbm_buffer(self, spec: Params):
        """LBM buffer: df -> trailing q, mv -> trailing dim, ms -> scalar;
        always 3 spatial dims (reference LBMTensorBuffer::init :96-125)."""
        dom = self.domain
        shape = list(self._lbm_buffer_shape(spec))
        is_integer = spec.get_bool("is_integer", False)
        dtype = jnp.int64 if is_integer else dom.dtype
        if spec.has("file"):
            import numpy as np

            data = self._read_lbm_h5(spec.get_str("file"))
            # cast on the HOST: dtype-converting device_puts are flaky on
            # the axon TPU backend
            np_data = np.asarray(data, dtype=np.dtype(jnp.dtype(dtype)))
            if np_data.ndim < 3:
                np_data = np_data.reshape(np_data.shape + (1,) * (3 - np_data.ndim))
            return jnp.asarray(np_data)
        return host_zeros(shape, dtype)

    def _capture_lbm_media(self, state):
        if not self.is_lbm or self.lbm_binary_media is None:
            return
        import numpy as np

        media = np.asarray(state["buffers"][self.lbm_binary_media])
        if media.ndim < 3:
            media = media.reshape(media.shape + (1,) * (3 - media.ndim))
        self._lbm_binary_np = media
        self._lbm_solid_mask = media == 0

    def _read_lbm_h5(self, path: str):
        """Read the dataset named like the file stem
        (reference LBMTensorBuffer::readTensorFromHdf5 :159-233)."""
        import os

        import h5py

        if not os.path.isabs(path):
            base = getattr(self, "deck_dir", None) or "."
            path = os.path.join(base, path)
        dataset = os.path.splitext(os.path.basename(path))[0]
        with h5py.File(path, "r") as f:
            return f[dataset][...]

    # ------------------------------------------------------------------
    def history_requests(self) -> Dict[str, int]:
        req: Dict[str, int] = {}

        def merge(d):
            for k, v in d.items():
                req[k] = max(req.get(k, 0), v)

        if self.solver is not None:
            merge(self.solver.history_requests())
            for p in getattr(self.solver, "predictors", []):
                merge(p.history_requests())
        for pp in self.postprocessors:
            merge(pp.history_requests())

        def walk(members):
            for m in members:
                if isinstance(m, ComputeGroup):
                    walk(m.members)
                elif hasattr(m, "history_requests"):
                    merge(m.history_requests())

        walk(self.solve_computes)
        walk(self.bc_computes)
        walk([self.pp_computes, self.ic_computes])
        return req

    def newton_diag_keys(self):
        """Pseudo-buffer keys of Newton-convergence flags (FFTMechanics)
        anywhere in the solve/IC/postprocess chains."""
        if getattr(self, "_newton_diag_keys", None) is not None:
            return self._newton_diag_keys
        keys = []

        def walk(members):
            for m in members:
                if isinstance(m, ComputeGroup):
                    walk(m.members)
                elif getattr(m, "converged_key", None):
                    keys.append(m.converged_key)

        walk(self.solve_computes)
        walk([self.pp_computes, self.ic_computes])
        self._newton_diag_keys = keys
        return keys

    def check_newton_diags(self, values):
        """Raise if a Newton solve exhausted nl_max_its this step (the
        reference's FFTMechanics.C hard error).  ``values`` maps pseudo-key
        -> host float (0.0 = not converged)."""
        from .computes.mechanics import newton_exhausted_message

        for key, ok in values.items():
            if not ok:
                name = key[len("__converged_"):-2]
                raise RuntimeError(newton_exhausted_message(name))

    def check_constants(self):
        missing = [n for n in self._fetched_constants if n not in self.constants]
        if len(missing) == 1:
            raise ProblemError(
                f"Constant {missing[0]} was requested but never declared."
            )
        if missing:
            raise ProblemError(
                f"Constants {', '.join(missing)} were requested but never declared."
            )

    def init_state(self) -> Dict:
        """Build the initial state: zero buffers, run ICs eagerly, infer
        shapes of derived buffers, allocate history stacks.

        Mirrors reference TensorProblem::init (TensorProblem.C:74-151) +
        executeTensorInitialConditions (:199-215)."""
        self.check_constants()
        dom = self.domain
        buffers: Dict[str, jnp.ndarray] = {}

        # declared buffers: zeros at value shape (reference PlainTensorBuffer
        # :30-37); `reciprocal = true` buffers get the complex k-shape;
        # LBMTensorBuffer gets (nx, ny, nz>=1[, q|dim]) with optional HDF5
        # load (reference LBMTensorBuffer.C:96-233)
        for name, spec in self.buffer_specs.items():
            btype = spec.get_str("type", "PlainTensorBuffer")
            if btype == "LBMTensorBuffer" or (self.is_lbm and spec.has("buffer_type")):
                buffers[name] = self._init_lbm_buffer(spec)
                continue
            shape = self.declared_buffer_shape(name)
            dtype = dom.cdtype if spec.get_bool("reciprocal", False) else dom.dtype
            buffers[name] = host_zeros(shape, dtype)

        state = {
            "buffers": buffers,
            "old": {},
            "n_advances": jnp.zeros((), jnp.int32),
            "old_dt": jnp.zeros((0,), dom.dtype),
        }

        # LBM binary media is available before ICs (file-loaded buffers,
        # reference LatticeBoltzmannProblem::init :60-68) so IC computes mask
        # solids correctly; re-captured after ICs in case an IC updates it
        self._capture_lbm_media(state)

        # run initial conditions in dependency order.  Jittable ICs execute
        # as ONE compiled program per consecutive run (instead of one tiny
        # program per op — important on remote-compile TPU backends);
        # non-traceable ICs (torch RNG, function sampling) run host-side.
        self.ic_computes.sort()
        ctx = {"t": jnp.zeros((), dom.dtype)}
        ic_outputs = set()

        def run_segment(segment):
            if not segment:
                return

            def seg_fn(buffers):
                scope = dict(buffers)
                updates = {}
                for m in segment:
                    out = m.apply(scope, ctx)
                    scope.update(out)
                    updates.update(out)
                return updates

            updates = jax.jit(seg_fn)(state["buffers"])
            for out, arr in updates.items():
                state["buffers"][out] = arr
                ic_outputs.add(out)

        segment = []
        for c in self.ic_computes.sorted_members:
            if getattr(c, "jittable", True) and not isinstance(c, ComputeGroup):
                segment.append(c)
                continue
            run_segment(segment)
            segment = []
            for out, arr in self._apply_with_missing(c, state["buffers"], ctx).items():
                state["buffers"][out] = arr
                ic_outputs.add(out)
        run_segment(segment)

        # LBM: normalize buffers back to their declared (nx,ny,nz[,k]) shapes
        # — ICs written with 2-D computes (e.g. ParsedCompute) land at the
        # bare grid shape, which the reference fixes up with in-place
        # unsqueezes (LBMEquilibrium.C `if (_rho.dim() < 3) unsqueeze_`);
        # here the canonical shape must hold before entering the jit loop
        if self.is_lbm:
            for name, spec in self.buffer_specs.items():
                if spec.get_str("type", "") != "LBMTensorBuffer" and not spec.has(
                    "buffer_type"
                ):
                    continue
                want = self._lbm_buffer_shape(spec)
                cur = state["buffers"].get(name)
                if cur is not None and tuple(cur.shape) != want and cur.size == math.prod(want):
                    state["buffers"][name] = cur.reshape(want)

        # LBM: re-capture binary media / solid mask after ICs
        # (reference LatticeBoltzmannProblem::execute EXEC_INITIAL re-read)
        self._capture_lbm_media(state)

        # shape-complete: derived buffers produced by solve/pp/bc computes
        # start as zeros with the shapes one evaluation would produce.  The
        # reference zero-inits every declared buffer at the REAL shape and
        # lets the first write replace it (PlainTensorBuffer.C:30-37); under
        # jit the state pytree must carry final shapes from the start, so
        # declared-but-derived buffers are reshaped here (values stay zero).
        solve_all = ComputeGroup(
            "_all_solve", Params(None, self.global_params), self, self.solve_computes
        ).sort()
        # boundary computes only rewrite existing distribution buffers and
        # need old-state context; they are excluded from shape inference
        groups = [solve_all, self.pp_computes]
        for g in groups:
            if isinstance(g, ComputeGroup):
                g.sort()
        for g in groups:
            for m in g.members if isinstance(g, ComputeGroup) else [g]:
                m.check()
        scope = dict(state["buffers"])
        shape_ctx = dict(ctx)
        shape_ctx["old"] = {
            name: host_zeros((1,) + arr.shape, arr.dtype)
            for name, arr in state["buffers"].items()
        }
        shape_ctx["n_advances"] = state["n_advances"]
        for g in groups:
            self._shape_complete(g, state["buffers"], scope, ic_outputs, shape_ctx)

        # solver-referenced buffers must exist (implicitly created if needed,
        # matching the reference's getOutputBufferByName auto-creation)
        if self.solver is not None:
            for b in self.solver.extra_input_buffers() + self.solver.output_buffers():
                if b not in state["buffers"]:
                    state["buffers"][b] = host_zeros(
                        self.domain.shape, self.domain.dtype
                    )

        # Newton-convergence diagnostics (FFTMechanics): pre-seed the
        # pseudo-buffers True so the substep-loop carry structure is stable
        # from the first step; checked at the per-step host sync
        # (step_with_pps) — the reference hard-errors on exhausted nl_max_its
        for key in self.newton_diag_keys():
            state["buffers"][key] = jnp.asarray(True)

        # history stacks
        old_max = 0
        for name, n_states in self.history_requests().items():
            if name not in state["buffers"]:
                raise ProblemError(f"History requested for unknown buffer '{name}'")
            cur = state["buffers"][name]
            state["old"][name] = host_zeros((n_states,) + cur.shape, cur.dtype)
            old_max = max(old_max, n_states)
        state["old_dt"] = jnp.zeros((old_max,), dom.dtype)

        # solver state (jitted: Broyden's M is a complex eye/broadcast, which
        # must not run as eager ops on the axon TPU backend)
        if self.solver is not None and hasattr(self.solver, "init_solver_state"):
            state["solver"] = jax.jit(self.solver.init_solver_state)()
        else:
            state["solver"] = {}
        if self.is_lbm:
            # convergence residual starts at 1 (reference
            # LatticeBoltzmannProblem _convergence_residual initial value)
            state["solver"]["residual"] = jnp.ones((), dom.dtype)

        # debug introspection: compute execution order with in/out buffers
        # (reference TensorProblem.C:117-130 print_debug_output)
        if self.print_debug_output or self.domain.debug:
            def dump(tag, group):
                members = group.sorted_members or group.members
                print(f"[marlin_tpu] {tag} execution order:")
                for m in members:
                    if isinstance(m, ComputeGroup):
                        dump(f"{tag}/{m.name}", m)
                    else:
                        print(f"  {m.name}: {m.inputs} -> {m.outputs}")

            dump("Initialize", self.ic_computes)
            if self.solver is not None and isinstance(self.solver.compute, ComputeGroup):
                dump("Solve", self.solver.compute)
            dump("Postprocess", self.pp_computes)
            if self.domain.debug:
                # reference Domain/debug=true also reports the JIT plan and
                # decomposition (ComputeGroup.C:146-153, halo traffic
                # TensorProblem.C:721-735); here: one program per step +
                # the mesh/sharding layout
                print(f"[marlin_tpu] domain: {self.domain!r}")
                print(f"[marlin_tpu] fft_backend: {self.domain.fft_backend.name}; "
                      f"one XLA program per timestep ({self.spectral_solve_substeps} substeps fused)")
                if self.domain.mesh is not None:
                    from . import parallel as _par
                    print(f"[marlin_tpu] mesh: {self.domain.mesh}; real spec "
                          f"{_par.real_spec(self.domain, self.domain.dim)}; reciprocal spec "
                          f"{_par.reciprocal_spec(self.domain, self.domain.dim)}")

        # distribute the state over the mesh
        if self.domain.mesh is not None:
            from . import parallel

            state = parallel.shard_state(self.domain, state)

        self._initialized = True
        return state

    def _apply_with_missing(self, compute, buffers, ctx):
        members = (
            compute.sorted_members if isinstance(compute, ComputeGroup) else [compute]
        )
        updates = {}
        scope = dict(buffers)
        for m in members:
            if isinstance(m, ComputeGroup):
                out = self._apply_with_missing(m, scope, ctx)
            else:
                out = m.apply(scope, ctx)
            scope.update(out)
            updates.update(out)
        return updates

    def _shape_complete(self, compute, buffers, scope, ic_outputs, ctx):
        """Evaluate a compute chain once to learn output shapes; fill missing
        or mis-shaped (declared-but-derived) buffers with zeros of those
        shapes (values discarded — EXEC_INITIAL output shows zeros for
        un-computed buffers, as in the reference).  ``scope`` carries shapes
        across the whole solve/postprocess/boundary chain."""
        members = (
            compute.sorted_members if isinstance(compute, ComputeGroup) else [compute]
        )
        for m in members:
            if isinstance(m, ComputeGroup):
                self._shape_complete(m, buffers, scope, ic_outputs, ctx)
                continue
            missing_inputs = [b for b in m.inputs if b not in scope]
            for b in missing_inputs:
                # implicit buffer creation: the reference auto-creates a
                # zeros PlainTensorBuffer for any requested name
                # (TensorProblem::getBuffer / addTensorBuffer implicit path)
                arr = host_zeros(self.domain.shape, self.domain.dtype)
                scope[b] = arr
                buffers.setdefault(b, arr)
            # abstract evaluation: learn shapes without running the compute
            # (some computes, e.g. FFTMechanics, run full nonlinear solves)
            out_struct = jax.eval_shape(lambda s, c: m.apply(s, c), scope, ctx)
            out = {
                name: host_zeros(sd.shape, sd.dtype)
                for name, sd in out_struct.items()
                if not name.startswith("__")
            }
            for name, arr in out.items():
                scope[name] = arr
                # host_zeros, NOT eager jnp.zeros_like: eager complex ops are
                # UNIMPLEMENTED on the axon TPU backend and poison the queue
                if name not in buffers:
                    buffers[name] = host_zeros(arr.shape, arr.dtype)
                elif name not in ic_outputs and (
                    buffers[name].shape != arr.shape
                    or buffers[name].dtype != arr.dtype
                ):
                    buffers[name] = host_zeros(arr.shape, arr.dtype)
                elif name in ic_outputs and buffers[name].shape != arr.shape:
                    raise ProblemError(
                        f"Compute '{m.name}' produces shape {arr.shape} for "
                        f"buffer '{name}' but its IC produced "
                        f"{buffers[name].shape}."
                    )

    # ------------------------------------------------------------------
    def step(self, state, t, dt, dt_old, first_step: bool):
        """Advance one full timestep.  `first_step` is traced, so one
        compiled program serves all timesteps."""
        if "step" not in self._step_fns:
            self._step_fns["step"] = jax.jit(self._step_impl)
        return self._step_fns["step"](
            state, t, dt, dt_old, jnp.asarray(first_step, bool)
        )

    def _step_impl(self, state, t, dt, dt_old, first_step):
        from .solvers.base import advance_state

        first_step = jnp.asarray(first_step, bool)
        if self.is_lbm:
            return self._lbm_step_impl(state, t, dt, first_step)
        state = jax.lax.cond(
            first_step, lambda s: s, lambda s: advance_state(s, dt), state
        )
        if self.solver is not None:
            state = self.solver.step(state, t, dt, dt_old, first_step)
        else:
            # no solver: run all solve computes once per step (reference
            # TensorProblem::execute else-branch, :185-188)
            buffers = dict(state["buffers"])
            ctx = {"t": t, "old": state["old"],
                   "n_advances": state["n_advances"]}
            if self._solverless_group is not None:  # batch_fft fusion
                buffers.update(self._solverless_group.apply(buffers, ctx))
            else:
                for c in self.solve_computes:
                    buffers.update(c.apply(buffers, ctx))
            state = {**state, "buffers": buffers}
        return state

    def _lbm_step_impl(self, state, t, dt, first_step: bool):
        """One MOOSE timestep of the LBM problem: `lbm_substeps` iterations of
        advance -> stream -> BCs -> computes (reference
        LatticeBoltzmannProblem::execute :103-131; substeps only run from
        MOOSE step 2 on, reference `timeStep() > 1`)."""
        from .solvers.base import advance_state

        sorted_solves = ComputeGroup(
            "_lbm_solve", Params(None, self.global_params), self, self.solve_computes
        ).sort()
        sorted_bcs = ComputeGroup(
            "_lbm_bc", Params(None, self.global_params), self, self.bc_computes
        ).sort()

        def substep(i, st):
            st = advance_state(st, dt)
            if self.solver is not None and hasattr(self.solver, "stream"):
                st = self.solver.stream(st)
            ctx = {"t": t, "old": st["old"], "n_advances": st["n_advances"]}
            buffers = dict(st["buffers"])
            for bc in sorted_bcs.sorted_members:
                buffers.update(bc.apply(buffers, ctx))
            updates = {}
            scope = dict(buffers)
            for c in sorted_solves.sorted_members:
                out = c.apply(scope, ctx)
                scope.update(out)
                updates.update(out)
            buffers.update(updates)
            solver_state = dict(st["solver"])
            if "__residual__" in buffers:
                solver_state["residual"] = buffers.pop("__residual__")
            return {**st, "buffers": buffers, "solver": solver_state}

        def run(state):
            state = advance_state(state, dt)  # MOOSE-level advance
            if self.lbm_backend == "PALLAS" and self.lbm_substeps > 1:
                state = self._lbm_fused_substeps(state, dt)
                # the LAST substep runs the regular jnp chain so every deck
                # buffer (f, density, velocity, feq, speed) and the old-state
                # ring are exactly as the unfused path leaves them
                return substep(self.lbm_substeps - 1, state)
            return jax.lax.fori_loop(0, self.lbm_substeps, substep, state)

        # reference: substeps only run from MOOSE step 2 (`timeStep() > 1`)
        return jax.lax.cond(first_step, lambda s: s, run, state)

    def _lbm_fused_substeps(self, state, dt):
        """Run substeps 0..n-2 through the fused Pallas kernel
        (pallas_lbm.py), carrying only fpc (q-major) and speed."""
        from . import pallas_lbm

        if self._lbm_fused_plan is None:
            self._lbm_fused_plan = pallas_lbm.match_chain(self)
        plan = self._lbm_fused_plan
        cfg = plan.config
        n_fused = self.lbm_substeps - 1

        # the trailing jnp substep refreshes slot 0 of every depth-1 ring,
        # so skipping the fused substeps' pushes is invisible; deeper rings
        # would retain skipped history and are rejected
        if state["old_dt"].shape[0] > 1:
            raise pallas_lbm.FusedChainError(
                "lbm_backend = PALLAS supports dt-history depth <= 1"
            )
        for name, stack in state["old"].items():
            if stack.shape[0] != 1:
                raise pallas_lbm.FusedChainError(
                    f"lbm_backend = PALLAS supports history depth 1 (got "
                    f"{stack.shape[0]} for '{name}')"
                )
        # buffers other than the carried set go stale during the fused
        # substeps, so history on them (e.g. a TensorIntegralChange
        # postprocessor on density) would record whole-step differences
        allowed_old = {plan.fpc, plan.fpc2, plan.speed}
        extra_old = set(state["old"]) - allowed_old
        if extra_old:
            raise pallas_lbm.FusedChainError(
                f"lbm_backend = PALLAS supports old-state history on "
                f"{sorted(n for n in allowed_old if n)} only "
                f"(got {sorted(extra_old)})"
            )

        # Only fpc and speed cross the fused substeps: the trailing jnp
        # substep recomputes every other buffer, its advance_state refreshes
        # the depth-1 old rings from the carried values, and its residual
        # compute overwrites the solver residual — so no history, residual,
        # or prev-value bookkeeping is carried here.

        # 2-D decks squeeze the trailing nz = 1 axis around the kernel
        sq = (lambda a: a[..., 0]) if cfg.two_d else (lambda a: a)
        tail = (cfg.ny,) if cfg.two_d else (cfg.ny, cfg.nz)
        # GLOBAL trailing dims (cfg.ny is the local extent on 2-D meshes)
        ny_g = cfg.ny_global if cfg.shard_y else cfg.ny
        gtail = (ny_g,) if cfg.two_d else (ny_g, cfg.nz)
        fpc_qm = sq(jnp.transpose(state["buffers"][plan.fpc], (3, 0, 1, 2)))
        gpc_qm = None
        if cfg.two_lattice:
            gpc_qm = sq(jnp.transpose(state["buffers"][plan.fpc2],
                                      (3, 0, 1, 2)))
        if plan.speed is not None:
            speed = sq(state["buffers"][plan.speed])
        else:
            speed = jnp.zeros((cfg.nx_global,) + gtail,
                              state["buffers"][plan.fpc].dtype)

        media = None
        if plan.media is not None:
            media = sq(state["buffers"][plan.media]).astype(fpc_qm.dtype)

        if cfg.sharded:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            mesh = self.domain.mesh
            sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            names = (mesh.axis_names[0],
                     mesh.axis_names[1] if cfg.shard_y else None)
            axis_sizes = (int(sizes[names[0]]),
                          int(sizes[names[1]]) if cfg.shard_y else 1)

            def run_shard(fpc_l, gpc_l, sp_l, media_l):
                # media is loop-invariant: exchange its halo planes ONCE
                media_ext = pallas_lbm.exchange_media_halo(
                    media_l, cfg, names, axis_sizes
                )

                def sub(_i, carry):
                    cur, gcur, _spc = carry
                    out = pallas_lbm.fused_substep_sharded(
                        cur, media_l, media_ext, cfg, names, axis_sizes,
                        gpc_qm=gcur,
                    )
                    if cfg.two_lattice:
                        return out
                    return out[0], gcur, out[1]

                return jax.lax.fori_loop(0, n_fused, sub,
                                         (fpc_l, gpc_l, sp_l))

            yax = names[1]  # None on 1-D meshes → unsharded y
            fspec = P(None, names[0], yax, *([None] * (len(tail) - 1)))
            sspec = P(names[0], yax, *([None] * (len(tail) - 1)))
            if media is None:
                media = jnp.ones((cfg.nx_global,) + gtail, fpc_qm.dtype)
            if gpc_qm is None:
                # 1-lattice: a zero-size dummy keeps the shard_map arity
                # static (never touched inside)
                gpc_qm = jnp.zeros_like(fpc_qm[:1])
            cur, g_cur, sp_cur = shard_map(
                run_shard, mesh=mesh,
                in_specs=(fspec, fspec, sspec, sspec),
                out_specs=(fspec, fspec, sspec),
                # pallas_call outputs carry no varying-mesh-axes metadata
                check_vma=False,
            )(fpc_qm, gpc_qm, speed, media)
        else:
            def sub(_i, carry):
                cur, gcur, _sp_cur = carry
                out = pallas_lbm.fused_substep(cur, media, cfg, gpc_qm=gcur)
                if cfg.two_lattice:
                    return out
                return out[0], gcur, out[1]

            if gpc_qm is None:
                gpc_qm = jnp.zeros_like(fpc_qm[:1])
            cur, g_cur, sp_cur = jax.lax.fori_loop(
                0, n_fused, sub, (fpc_qm, gpc_qm, speed))

        unsq = (lambda a: a[..., None]) if cfg.two_d else (lambda a: a)
        from_qm = lambda a: jnp.transpose(unsq(a), (1, 2, 3, 0))
        buffers = dict(state["buffers"])
        buffers[plan.fpc] = from_qm(cur)
        if cfg.two_lattice:
            buffers[plan.fpc2] = from_qm(g_cur)
        if plan.speed is not None:
            buffers[plan.speed] = unsq(sp_cur)
        return {
            **state,
            "buffers": buffers,
            "n_advances": state["n_advances"] + n_fused,
        }

    #: fuse the timestep and postprocessors into one XLA program (fastest);
    #: set False to run them as two programs.  If a backend rejects the
    #: fused program at compile time (observed on the axon remote-TPU
    #: backend), step_with_pps catches the rejection on the FIRST call,
    #: warns once, and recompiles split automatically — decks with
    #: postprocessors run out of the box either way.
    fuse_pps = True

    def step_with_pps(self, state, t, dt, dt_old, first_step: bool):
        """One program: timestep + TIMESTEP_END postprocessors.  Halves the
        number of compiled programs and device round-trips per step."""
        if not self.fuse_pps:
            state = self.step(state, t, dt, dt_old, first_step)
            if self.solver is not None:
                self.compute_count += self.solver.group_evals_per_step()
            self._fetch_group_evals(state)
            vals = self.execute_postprocessors(state, "TIMESTEP_END", t + dt, dt)
            # solve-chain flags live in the stepped state; pp-chain flags
            # were checked (and stripped) inside execute_postprocessors
            self.check_newton_diags({
                k: float(state["buffers"][k]) for k in self.newton_diag_keys()
                if k in state["buffers"]
            })
            return state, vals
        active = [
            pp
            for pp in self.postprocessors
            if "TIMESTEP_END" in pp.execute_on
            and not getattr(pp, "depends_on_pps", False)
        ]
        if "step_pp" not in self._step_fns:

            def fn(state, t, dt, dt_old, first_step):
                state = self._step_impl(state, t, dt, dt_old, first_step)
                ctx = {"t": t + dt, "dt": dt}
                buffers = dict(state["buffers"])
                buffers.update(self.pp_computes.apply(buffers, ctx))
                st = {**state, "buffers": buffers}
                vals = {pp.name: pp.compute(st, ctx) for pp in active}
                # ride the LBM convergence residual on the existing pp sync
                # so the executioner's early-out check costs no extra device
                # round-trip (VERDICT r01 item 10; ~30 ms/step on axon)
                if self.is_lbm and "residual" in state.get("solver", {}):
                    vals = {**vals, "_lbm_residual": state["solver"]["residual"]}
                # Newton-convergence flags ride the same sync (no extra
                # device round-trip; ~30 ms each on axon).  Read from
                # ``buffers`` (post-pp), not ``state``: an FFTMechanics in
                # the postprocess chain writes its flag only there.
                for key in self.newton_diag_keys():
                    vals = {**vals, key: buffers[key]}
                return state, vals

            self._step_fns["step_pp"] = jax.jit(fn)
        try:
            state, vals = self._step_fns["step_pp"](
                state, t, dt, dt_old, jnp.asarray(first_step, bool)
            )
            self._step_pp_verified = True
        except Exception as e:
            if getattr(self, "_step_pp_verified", False):
                raise  # the fused program worked before: a real error
            if not _is_backend_rejection(e):
                raise  # user/tracing error — not a fused-program rejection
            # compile-time rejection of the fused step+pp program (some
            # backends refuse it): warn once, recompile split, and serve
            # the whole run unfused — never surface the rejection to a
            # deck that is otherwise valid.
            import warnings

            warnings.warn(
                "backend rejected the fused step+postprocessor program "
                f"({type(e).__name__}: {str(e)[:200]}); falling back to "
                "split step/pp programs (fuse_pps = False)",
                RuntimeWarning,
            )
            self._step_fns.pop("step_pp", None)
            self.fuse_pps = False
            return self.step_with_pps(state, t, dt, dt_old, first_step)
        if self.solver is not None:
            self.compute_count += self.solver.group_evals_per_step()
        self._fetch_group_evals(state)
        host_vals = {k: float(v) for k, v in vals.items()}
        self.check_newton_diags({
            k: host_vals.pop(k) for k in self.newton_diag_keys()
        })
        for pp in self.postprocessors:
            if "TIMESTEP_END" in pp.execute_on and getattr(pp, "depends_on_pps", False):
                host_vals[pp.name] = float(pp.compute_host(host_vals, float(t) + float(dt)))
        return state, host_vals

    def _fetch_group_evals(self, state):
        """Sync the iterative solvers' on-device eval accumulator — only
        when a ComputeGroupExecutionCount pp exists (an extra scalar fetch
        per step otherwise)."""
        if not any(getattr(pp, "wants_group_evals", False)
                   for pp in self.postprocessors):
            return
        ge = state.get("solver", {}).get("group_evals")
        if ge is not None:
            self.device_group_evals = int(ge)

    # ------------------------------------------------------------------
    def execute_postprocessors(self, state, flag: str, t, dt) -> Dict[str, float]:
        """Run PP computes + postprocessors for an execute flag; returns
        host floats (one device sync per output point)."""
        active = [pp for pp in self.postprocessors if flag in pp.execute_on]
        if not active:
            return {}
        tensor_pps = [p for p in active if not getattr(p, "depends_on_pps", False)]
        host_pps = [p for p in active if getattr(p, "depends_on_pps", False)]
        result: Dict[str, float] = {}
        if tensor_pps:
            key = (flag, tuple(pp.name for pp in tensor_pps))
            if key not in self._pp_fns:

                def fn(state, t, dt):
                    ctx = {"t": t, "dt": dt}
                    buffers = dict(state["buffers"])
                    buffers.update(self.pp_computes.apply(buffers, ctx))
                    st = {**state, "buffers": buffers}
                    out = {pp.name: pp.compute(st, ctx) for pp in tensor_pps}
                    # pp-chain Newton flags (FFTMechanics in [Postprocess])
                    # ride this sync — they exist only in the local buffers
                    for k in self.newton_diag_keys():
                        if k in buffers:
                            out[k] = buffers[k]
                    return out

                self._pp_fns[key] = jax.jit(fn)
            out = self._pp_fns[key](state, t, dt)
            host = {k: float(v) for k, v in out.items()}
            self.check_newton_diags({
                k: host.pop(k) for k in self.newton_diag_keys() if k in host
            })
            result.update(host)
        for pp in host_pps:
            result[pp.name] = float(pp.compute_host(result, float(t)))
        return result

    def run_postprocess_computes(self, state, t):
        """Materialize postprocess-group buffers into the state (used before
        field outputs).

        Jitted (one compiled program, cached): beyond speed, this is a
        CORRECTNESS requirement on the axon remote-TPU backend, where eager
        complex ops (e.g. ComputeDisplacements' fft) fail UNIMPLEMENTED.
        Chains containing non-traceable members fall back to eager."""
        buffers = dict(state["buffers"])

        def _all_jittable(group):
            for m in getattr(group, "members", []):
                if isinstance(m, ComputeGroup):
                    if not _all_jittable(m):
                        return False
                elif not getattr(m, "jittable", True):
                    return False
            return True

        jittable = _all_jittable(self.pp_computes)
        if jittable:
            if "pp_chain" not in self._step_fns:
                self._step_fns["pp_chain"] = jax.jit(
                    lambda bufs, tt: self.pp_computes.apply(
                        dict(bufs), {"t": tt}))
            updates = self._step_fns["pp_chain"](
                buffers, jnp.asarray(t, self.domain.dtype))
        else:
            updates = self.pp_computes.apply(buffers, {"t": t})
        buffers.update(updates)
        # a pp-chain FFTMechanics must hard-error on nl_max_its exhaustion
        # here too (this is the only pp execution on pp-less unfused decks)
        self.check_newton_diags({
            k: float(updates[k]) for k in self.newton_diag_keys()
            if k in updates
        })
        return {**state, "buffers": buffers}
