"""Benchmark driver.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...extras}

Headline metric: reference benchmark 1a (2D spinodal decomposition,
200x200 Cahn-Hilliard, spectral_solve_substeps=1000, adaptive dt with a
Terminator to t~=1e4).  Reference baseline: 45 s wall / 277 MB on an
NVIDIA L4 at 99% util (reference:
benchmarks/01_spinodal_decomposition/README.md:1-7).  vs_baseline > 1
means faster than the reference's published number.

Extras: the BASELINE.json north star — 3-D Cahn-Hilliard cell-updates/s
at 256^3 and 512^3 with the empirical FFT-roofline fraction (see PERF.md
for the model).

Axon-TPU hardening (both r01 artifacts failed on this):
 - NEVER use AOT `.lower().compile()` — it raises UNIMPLEMENTED /
   libtpu-version-mismatch on the axon backend and poisons the process
   (subsequent unrelated ops then fail).  Compile via a warmup call.
 - Each benchmark runs in a fresh SUBPROCESS; a poisoned/flaky child is
   retried without taking down the parent.
 - All initial state is built on-device by compiled programs
   (marlin_tpu.problem.host_zeros routes every non-CPU alloc through jit).
"""

import json
import math
import os
import subprocess
import sys
import time

BASELINE_SECONDS = 45.0  # reference wall time on NVIDIA L4

_HERE = os.path.dirname(os.path.abspath(__file__))

# Persistent XLA compilation cache, default ON (r04 measurement: the axon
# backend now deserializes cached executables correctly — a cold 32^3
# Newton+CG compile drops 38.6 s -> 3.8 s across processes with bit-equal
# results; the r02 "cannot deserialize" finding no longer reproduces).  The
# cache directory ships IN THE REPO, pre-warmed by a full bench run, so the
# driver-run suite compiles warm: the dominant r03 artifact-killer (150-570 s
# remote compiles per program inside a ~30 min driver window) becomes a few
# seconds per program.  Opt out / redirect with MARLIN_TPU_COMPILE_CACHE
# (empty or "0" disables).  Must be set via env BEFORE any jax import so
# every child subprocess inherits it.
_cache = os.environ.get("MARLIN_TPU_COMPILE_CACHE",
                        os.path.join(_HERE, ".jax_cache"))


def _enable_compile_cache():
    """Turn the persistent cache ON via jax.config — NOT env vars.

    Measured r04: `JAX_COMPILATION_CACHE_DIR` is silently IGNORED by this
    jax version (`optional_string_state(default=None)` never consults the
    environment), so every bench child ran with the cache disabled — the
    jit_f probe logged 'Not writing persistent cache entry ... since cache
    is disabled/not initialized' while the env var was set.  Only
    jax.config.update actually enables it (marlin_tpu/main.py already does
    this for deck runs; bench children must too)."""
    if not _cache or _cache == "0":
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache)
    # Cache EVERY program, including sub-0.5 s ones (r05 measurement: the
    # axon remote queue turns each tiny-program cache miss into an
    # unpredictable multi-second-to-minutes round trip — a trivial 512^2
    # matmul compile was observed at 532 s under queue contention, and the
    # "compile_s" a child reports is mostly the SUM of those waits, not
    # XLA compile time.  The 0.5 s default threshold excluded exactly the
    # convert_element_type/broadcast/dynamic_slice stragglers that then
    # re-queued remotely on every single run).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Global wall-clock budget for the whole suite (r01 post-mortem: the driver
# killed a > 40 min run and every completed child's result was lost because
# nothing was emitted until the very end).  When the budget runs out, the
# combined line is printed with whatever completed and the process exits 0.
# 1500 s default (r04): the r03 artifact has rc=124 with BUDGET_S=2000 —
# the driver's own kill landed somewhere in (1560 s, 2000 s), so the suite
# must finish and exit 0 inside ~25 min even when the compile cache misses.
BUDGET_S = float(os.environ.get("MARLIN_TPU_BENCH_BUDGET_S", "1500"))

# Reference checkout (for the shipped benchmark decks); children fall back
# to embedded equivalents when it is absent so the bench runs standalone.
REF_DIR = os.environ.get("MARLIN_REF_DIR", "/root/reference")

sys.path.insert(0, _HERE)


def _load_deck(relpath, cli=None, fallback=None):
    """Load a benchmark deck from the reference checkout when present
    (zero-drift: the exact shipped deck), else parse the embedded
    equivalent so the bench is self-contained."""
    from marlin_tpu import hit

    path = os.path.join(REF_DIR, relpath)
    if os.path.exists(path):
        return hit.load(path, cli or [])
    if fallback is None:
        raise FileNotFoundError(
            f"{path} not found and no embedded fallback for {relpath}")
    root = hit.parse(fallback)
    variables = hit.apply_cli_args(root, cli or [])
    hit.expand_braces(root, variables)
    return root


def _emit(d):
    """Child-side incremental emission: print the accumulated result dict as
    a full JSON line after every completed measurement, so the parent can
    salvage the last line if the child is killed mid-benchmark."""
    print(json.dumps(d), flush=True)


def _remaining():
    """Seconds left in the GLOBAL suite budget (inherited by children via
    MARLIN_TPU_BENCH_DEADLINE), minus the parent's estimate of the cold
    cost of the REQUIRED metrics still queued after this child
    (MARLIN_TPU_BENCH_RESERVE).  Children gate their OPTIONAL variants
    (tuned/fused/comparison configs) on this, so a cold compile cache
    degrades a run to fewer variants — never to a missing or timed-out
    required BASELINE measurement."""
    dl = os.environ.get("MARLIN_TPU_BENCH_DEADLINE")
    if not dl:
        return float("inf")
    reserve = float(os.environ.get("MARLIN_TPU_BENCH_RESERVE", "0"))
    return float(dl) - time.time() - reserve


def _allow_variant(cold_need_s, observed_compile_s):
    """Gate an OPTIONAL variant on the shared budget.

    The parent's reserve and the per-variant cost estimates are COLD-cache
    worst cases; when this child's own required compile came back warm
    (terminal compile cache hit), the rest of the suite is very likely warm
    too, so the reserve and the variant's cost estimate are scaled down —
    otherwise a full cold reserve would permanently starve early-child
    variants (review r03 finding) even on an all-warm run."""
    warm = observed_compile_s is not None and observed_compile_s < 60
    scale = 0.15 if warm else 1.0
    dl = os.environ.get("MARLIN_TPU_BENCH_DEADLINE")
    if not dl:
        return True
    reserve = float(os.environ.get("MARLIN_TPU_BENCH_RESERVE", "0")) * scale
    return float(dl) - time.time() - reserve >= cold_need_s * scale

_CH3D_DECK = """
[Domain]
  dim = 3
  nx = {n}
  ny = {n}
  nz = {n}
  xmax = {n}
  ymax = {n}
  zmax = {n}
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = 'c0+epsilon*(cos(0.105*x)*cos(0.11*y)*cos(0.09*z)+(cos(0.13*x)*cos(0.087*y))^2+cos(0.025*x-0.15*z)*cos(0.07*x-0.02*y))'
      constant_names = 'c0 epsilon'
      constant_expressions = '0.5 0.01'
    []
    [Mbar]
      type = ReciprocalLaplacianFactor
      factor = 5
      buffer = Mbar
    []
    [kappabarbar]
      type = ReciprocalLaplacianSquareFactor
      factor = -10
      buffer = kappabarbar
    []
  []
  [Solve]
    [mu]
      type = ParsedCompute
      buffer = mu
      expression = 'rho_s*(c-c_alpha)^2*(c_beta-c)^2'
      constant_names = 'rho_s c_alpha c_beta'
      constant_expressions = '5 0.3 0.7'
      derivatives = c
      inputs = c
    []
    [mubar]
      type = ForwardFFT
      buffer = mubar
      input = mu
    []
    [Mbarmubar]
      type = ParsedCompute
      buffer = Mbarmubar
      expression = 'Mbar*mubar'
      inputs = 'Mbar mubar'
    []
    [cbar]
      type = ForwardFFT
      buffer = cbar
      input = c
    []
  []
[]
[TensorSolver]
  type = AdamsBashforthMoulton
  buffer = c
  reciprocal_buffer = cbar
  linear_reciprocal = kappabarbar
  nonlinear_reciprocal = Mbarmubar
  substeps = {substeps}
[]
[Problem]
  type = TensorProblem
[]
"""


def build_run(problem, num_steps, dt0, growth, dtmax, end_time, change_tol):
    """One XLA program: the full adaptive-dt transient with Terminator."""
    import jax
    import jax.numpy as jnp

    cell_volume = math.prod(problem.domain.grid_spacing)

    def whole_run(state):
        def cond(carry):
            step, t, dt, dt_old, state, done = carry
            return (step < num_steps) & jnp.logical_not(done)

        def body(carry):
            step, t, dt, dt_old, state, done = carry
            new_state = problem._step_impl(state, t, dt, dt_old, step == 0)
            # Terminator: change = sum|c - c_old| * dV < tol
            # (reference 1a.i Terminator expression `change<1e-4`)
            c = new_state["buffers"]["c"]
            c_old = new_state["old"]["c"][0]
            change = jnp.sum(jnp.abs(c - c_old)) * cell_volume
            t_new = t + dt
            done = (change < change_tol) | (t_new >= end_time)
            dt_new = jnp.minimum(dt * growth, dtmax)
            dt_new = jnp.minimum(dt_new, end_time - t_new)
            return (step + 1, t_new, dt_new, dt, new_state, done)

        init = (
            jnp.zeros((), jnp.int32),
            jnp.zeros((), problem.domain.dtype),
            jnp.asarray(dt0, problem.domain.dtype),
            jnp.zeros((), problem.domain.dtype),
            state,
            jnp.asarray(False),
        )
        step, t, dt, dt_old, state, done = jax.lax.while_loop(cond, body, init)
        c = state["buffers"]["c"]
        # free energy (reference 1a.i Postprocess group)
        dom = problem.domain
        r = dom.fft(c)
        grad_sq = None
        for d in range(dom.dim):
            g = dom.ifft(r * dom.reciprocal_axis(d) * 1j)
            grad_sq = g * g if grad_sq is None else grad_sq + g * g
        Fd = 5.0 * (c - 0.3) ** 2 * (0.7 - c) ** 2 + grad_sq
        F = jnp.sum(Fd) / Fd.size * dom.volume_global
        return step, t, F, jnp.min(c), jnp.max(c)

    return whole_run


def _sync(x):
    """Force completion by fetching a scalar to the host.

    jax.block_until_ready is a NO-OP on the remote axon TPU backend (r02
    measurement: 10 chained 256^3 FFT pairs "complete" in 0.03 ms under
    block_until_ready but take real wall time once a scalar is fetched);
    only a host round-trip actually synchronizes."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jax.numpy.ravel(leaf)[0]).real)


def bench_1a():
    """Reference benchmark 1a end-to-end (the published 45 s L4 number)."""
    import jax

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    platform = jax.default_backend()
    deck = "benchmarks/01_spinodal_decomposition/1a.i"
    root = _load_deck(deck)
    problem = TensorProblem(root)
    state = problem.init_state()

    whole_run = jax.jit(
        build_run(
            problem,
            num_steps=1000,
            dt0=1.0,
            growth=1.1,
            dtmax=300.0,
            end_time=10500.0,
            change_tol=1e-4,
        )
    )

    # warmup call = compile + one full run (no AOT on axon!)
    t0 = time.time()
    w_step, w_t, w_F, w_cmin, w_cmax = whole_run(state)
    w_F = float(w_F)
    first = time.time() - t0
    # salvage point: the warmup IS a complete physical run, so even a kill
    # during the timed repeat below leaves a compile-inclusive wall + the
    # full cross-check physics in the artifact
    _emit({
        "metric": f"benchmark_1a_spinodal_walltime_{platform}",
        "value": round(first, 3),
        "unit": "s (incl. compile)",
        "vs_baseline": round(BASELINE_SECONDS / first, 3),
        "compile_incl": True,
        "steps": int(w_step),
        "t_final": round(float(w_t), 1),
        "F_final": round(w_F, 3),
        "c_range": [round(float(w_cmin), 4), round(float(w_cmax), 4)],
    })

    t0 = time.time()
    step, t, F, cmin, cmax = whole_run(state)
    F = float(F)
    wall = time.time() - t0
    out = {
        "metric": f"benchmark_1a_spinodal_walltime_{platform}",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / wall, 3),
        "compile_s": round(first - wall, 1),
        "steps": int(step),
        "t_final": round(float(t), 1),
        "F_final": round(F, 3),
        "c_range": [round(float(cmin), 4), round(float(cmax), 4)],
    }
    _emit(out)  # headline survives even if the tuned variant is cut

    # tuned variant: same deck + the marlin_tpu perf knobs (carried ū,
    # Pallas FFTs at the 200-point direct-DFT extent, fused spectral substep) —
    # same physics to fp roundoff, reported alongside the unmodified run.
    # Optional: skipped (cleanly, headline intact) when the global budget
    # cannot absorb another cold compile; warm-cache runs (observed via the
    # headline's own compile time) scale the requirement down.
    if not _allow_variant(300, out.get("compile_s")):
        out["fused_skipped"] = "budget"
        return out
    try:
        root2 = _load_deck(deck, ["Domain/fft_backend=PALLAS",
                                  "Problem/carry_reciprocal=true",
                                  "Problem/fused_spectral=true"])
        problem2 = TensorProblem(root2)
        state2 = problem2.init_state()
        run2 = jax.jit(build_run(problem2, num_steps=1000, dt0=1.0,
                                 growth=1.1, dtmax=300.0, end_time=10500.0,
                                 change_tol=1e-4))
        _sync(run2(state2))
        t0 = time.time()
        s2, t2, F2, _, _ = run2(state2)
        F2 = float(F2)
        wall2 = time.time() - t0
        out.update({
            "fused_value": round(wall2, 3),
            "fused_vs_baseline": round(BASELINE_SECONDS / wall2, 3),
            "fused_F_final": round(F2, 3),
            "fused_steps": int(s2),
        })
    except Exception as e:  # report, never break the headline
        out["fused_error"] = repr(e)[:300]
    return out


def bench_1a_fused():
    """The 1a tuned variant ALONE (Pallas FFT + carried ū + fused spectral
    substep) — a second-chance slot: when the 1a child's budget gate had to
    skip the variant behind a slow required compile, leftover late-suite
    budget can still land the driver-captured fused number."""
    import jax

    from marlin_tpu.problem import TensorProblem

    root = _load_deck("benchmarks/01_spinodal_decomposition/1a.i",
                      ["Domain/fft_backend=PALLAS",
                       "Problem/carry_reciprocal=true",
                       "Problem/fused_spectral=true"])
    problem = TensorProblem(root)
    state = problem.init_state()
    run = jax.jit(build_run(problem, num_steps=1000, dt0=1.0, growth=1.1,
                            dtmax=300.0, end_time=10500.0, change_tol=1e-4))
    t0 = time.time()
    s, t, F, _, _ = run(state)
    F = float(F)
    first = time.time() - t0
    out = {"fused_value": round(first, 3), "unit": "s (incl. compile)",
           "fused_vs_baseline": round(BASELINE_SECONDS / first, 3),
           "fused_F_final": round(F, 3), "fused_steps": int(s),
           "compile_incl": True}
    _emit(out)  # salvage: compile-inclusive wall + physics
    t0 = time.time()
    s, t, F, _, _ = run(state)
    F = float(F)
    wall = time.time() - t0
    return {"fused_value": round(wall, 3),
            "fused_vs_baseline": round(BASELINE_SECONDS / wall, 3),
            "fused_F_final": round(F, 3), "fused_steps": int(s),
            "compile_s": round(first - wall, 1)}


def bench_2a(num_steps=100, variant=None):
    """Reference benchmark 2a (Ostwald ripening: c + 4 order parameters,
    200x200, `substeps = 2000`, adaptive dt growth 1.1 to dtmax 10) —
    the reference's second headline deck
    (reference: benchmarks/02_oswald_ripening/2a.i).  It publishes only
    cross-code accuracy curves (results.2a.1.json), no timing, so there
    is no vs_baseline; the value is wall time for the first `num_steps`
    outer steps (num_steps*2000 substeps, each substep = 5 coupled
    parsed chemical potentials + 10 forward / 5 inverse FFTs) with
    substep throughput, plus F/c/bnds physics for the cross-code check.
    The tuned variant (`Problem/batch_fft=true` — the 15 per-variable
    200² transforms of a substep run as 3 batched transforms, bit-exact
    in f64 — plus `carry_reciprocal=true`, which prunes the 5 u-batch
    forward transforms).  Measured on the v5e: 238 µs/substep default,
    112 with batch_fft, 83 with batch+carry (2.9x).  Tuned F(133.5)
    lands at 871 vs 919 (carry changes f32 roundoff every substep and
    coarsening amplifies it) — both inside the benchmark's published
    cross-code scatter, F in [475, 946] at t≈134 (results.2a.1.json);
    see PERF.md.  Measured and rejected here: fft_backend=PALLAS
    (317 us/substep — the full-complex direct-DFT kernels lose to XLA's
    batched half-spectrum rfft2 at 200²) and carry_reciprocal WITHOUT
    batch_fft (neutral: at 15 small dispatches the substep is bound by
    per-transform fixed cost, so pruning 5 of them only pays once the
    rest are batched)."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    platform = jax.default_backend()
    deck = "benchmarks/02_oswald_ripening/2a.i"

    # one device program per CHUNK of outer steps, state carried host-side:
    # a single ~100 s device execution (200 steps x 2000 substeps in one
    # while_loop) crashes the axon TPU worker ("TPU worker process crashed
    # or restarted", reproduced twice); ~10 s chunks run reliably
    chunk = 25

    def build(cli):
        root = _load_deck(deck, cli)
        problem = TensorProblem(root)
        state = problem.init_state()

        def run_chunk(carry):
            def cond(c):
                return c[0] < jnp.minimum(c[5], num_steps)

            def body(c):
                step, t, dt, dt_old, st, lim = c
                new = problem._step_impl(st, t, dt, dt_old, step == 0)
                # IterationAdaptiveDT schedule from the deck: growth 1.1,
                # dt0 1e-3, dtmax 10 (no iteration feedback — the ABM
                # solver is non-iterative)
                dt_new = jnp.minimum(dt * 1.1, 10.0)
                return (step + 1, t + dt, dt_new, dt, new, lim)

            step, t, dt, dt_old, st, lim = jax.lax.while_loop(
                cond, body, carry)
            return (step, t, dt, dt_old, st, lim + chunk)

        return problem, state, jax.jit(run_chunk)

    def run(cli, progress=None):
        problem, state, run_chunk = build(cli)

        def full(state):
            carry = (
                jnp.zeros((), jnp.int32),
                jnp.zeros((), problem.domain.dtype),
                jnp.asarray(1e-3, problem.domain.dtype),
                jnp.zeros((), problem.domain.dtype),
                state,
                jnp.asarray(chunk, jnp.int32),
            )
            for _ in range((num_steps + chunk - 1) // chunk):
                carry = run_chunk(carry)
            _sync(carry[1])
            return carry

        t0 = time.time()
        full(state)  # compile (one program serves every chunk) + warm run
        first = time.time() - t0
        if progress is not None:
            # salvage point: cold compiles vary 70-700 s on axon; if the
            # parent's timeout lands during the timed run below, the last
            # emitted line still carries a legitimate (compile-inclusive)
            # wall measurement instead of a bare timeout error
            progress(first)
        t0 = time.time()
        step, t, dt, _, final, _ = full(state)
        step, t = int(step), float(t)
        wall = time.time() - t0
        pps = problem.execute_postprocessors(final, "TIMESTEP_END", t, float(dt))
        return wall, first, step, t, pps, problem.solver.substeps

    def progress(first_wall):
        _emit({
            "metric": f"benchmark_2a_ostwald_walltime_{platform}",
            "value": round(first_wall, 3),
            "unit": f"s/{num_steps}steps (incl. compile)",
            "vs_baseline": None,
            "compile_incl": True,
        })

    if variant == "tuned":
        # second-chance slot: ONLY the tuned config (batch_fft + carried ū),
        # for when the 2a slot's budget gate had to skip it

        def progress_t(first_wall):
            _emit({"tuned_value": round(first_wall, 3),
                   "unit": f"s/{num_steps}steps (incl. compile)",
                   "compile_incl": True})

        wall2, first2, s2, t2, pps2, sub2 = run(
            ["Problem/batch_fft=true", "TensorSolver/carry_reciprocal=true"],
            progress=progress_t)
        return {
            "tuned_value": round(wall2, 3),
            "tuned_substep_us": round(wall2 / (s2 * sub2) * 1e6, 1),
            "tuned_F_final": round(pps2.get("F", float("nan")), 3),
            "tuned_c_range": [round(pps2.get("min_c", 0.0), 4),
                              round(pps2.get("max_c", 0.0), 4)],
            "tuned_compile_s": round(first2 - wall2, 1),
        }

    wall, first, step, t, pps, substeps = run([], progress=progress)
    total_substeps = step * substeps
    out = {
        "metric": f"benchmark_2a_ostwald_walltime_{platform}",
        "value": round(wall, 3),
        "unit": f"s/{step}steps",
        "vs_baseline": None,  # reference publishes accuracy curves only
        "compile_s": round(first - wall, 1),
        "steps": step,
        "t_final": round(t, 2),
        "substep_us": round(wall / total_substeps * 1e6, 1),
        "F_final": round(pps.get("F", float("nan")), 3),
        "c_range": [round(pps.get("min_c", 0.0), 4),
                    round(pps.get("max_c", 0.0), 4)],
    }
    _emit(out)

    # tuned variant: optional — skipped cleanly when the budget cannot
    # absorb its cold compile (~300 s on axon), keeping the required
    # default-path 2a measurement error-free.
    if not _allow_variant(420, out.get("compile_s")):
        out["tuned_skipped"] = "budget"
        return out
    try:
        wall2, first2, s2, t2, pps2, sub2 = run([
            "Problem/batch_fft=true", "TensorSolver/carry_reciprocal=true"])
        out.update({
            "tuned_value": round(wall2, 3),
            "tuned_substep_us": round(wall2 / (s2 * sub2) * 1e6, 1),
            "tuned_F_final": round(pps2.get("F", float("nan")), 3),
            "tuned_c_range": [round(pps2.get("min_c", 0.0), 4),
                              round(pps2.get("max_c", 0.0), 4)],
        })
    except Exception as e:  # report, never break the headline
        out["tuned_error"] = repr(e)[:300]

    # fused variant (r03): the whole 5-field substep as batched Pallas
    # passes — per-variable M̄/L̄ polynomials in-kernel, µ stack in one XLA
    # stage (pallas_spectral.ch_substep_multi)
    if not _allow_variant(420, out.get("compile_s")):
        out["fused_skipped"] = "budget"
        return out
    try:
        wall3, first3, s3, t3, pps3, sub3 = run([
            "Domain/fft_backend=PALLAS",
            "TensorSolver/carry_reciprocal=true",
            "TensorSolver/fused_spectral=true"])
        out.update({
            "fused_value": round(wall3, 3),
            "fused_substep_us": round(wall3 / (s3 * sub3) * 1e6, 1),
            "fused_F_final": round(pps3.get("F", float("nan")), 3),
        })
    except Exception as e:
        out["fused_error"] = repr(e)[:300]
    return out


def bench_sh(num_steps=40, variant=None):
    """BASELINE config #2: Swift-Hohenberg pattern formation, the 400x400
    crystal-growth deck (reference: examples/swift_hohenberg/
    swifthohenberg.i — random melt IC, r=0.025, alpha=1, quadratic+cubic
    nonlinearity, `spectral_solve_substeps = 1000`, IterationAdaptiveDT
    growth 1.2 / dt0 10 / dtmax 1000).  The reference publishes no timing
    for it, so there is no vs_baseline; the value is wall time for the
    first `num_steps` outer steps (num_steps*1000 substeps; each substep =
    1 parsed nonlinearity + 2 forward / 1 inverse FFT + the semi-implicit
    k-space update) with substep throughput, plus the psi range and
    integral for the physics cross-check (the melt crystallizes:
    psi spreads from [0, 0.07] to an O(+-0.4) stripe/dot pattern).

    The fused variant runs the same deck with the marlin_tpu perf knobs
    (Pallas direct-DFT FFTs at the 400-point extent, carried psibar, fused
    spectral substep) — same physics to f32 roundoff."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu.problem import TensorProblem

    platform = jax.default_backend()
    deck = "examples/swift_hohenberg/swifthohenberg.i"
    # ~10 s device chunks (the axon worker crashes on ~100 s single
    # executions, see bench_2a)
    chunk = 20

    def run(cli, progress=None):
        root = _load_deck(deck, cli)
        problem = TensorProblem(root)
        state = problem.init_state()

        def run_chunk(carry):
            def cond(c):
                return c[0] < jnp.minimum(c[5], num_steps)

            def body(c):
                step, t, dt, dt_old, st, lim = c
                new = problem._step_impl(st, t, dt, dt_old, step == 0)
                # IterationAdaptiveDT schedule from the deck: growth 1.2,
                # dt0 10, dtmax 1000 (no iteration feedback — ABM lowering
                # of the legacy FFTSemiImplicit block is non-iterative)
                dt_new = jnp.minimum(dt * 1.2, 1000.0)
                return (step + 1, t + dt, dt_new, dt, new, lim)

            step, t, dt, dt_old, st, lim = jax.lax.while_loop(
                cond, body, carry)
            return (step, t, dt, dt_old, st, lim + chunk)

        run_chunk = jax.jit(run_chunk)

        def full(state):
            carry = (
                jnp.zeros((), jnp.int32),
                jnp.zeros((), problem.domain.dtype),
                jnp.asarray(10.0, problem.domain.dtype),
                jnp.zeros((), problem.domain.dtype),
                state,
                jnp.asarray(chunk, jnp.int32),
            )
            for _ in range((num_steps + chunk - 1) // chunk):
                carry = run_chunk(carry)
            _sync(carry[1])
            return carry

        t0 = time.time()
        full(state)  # compile (one program serves every chunk) + warm run
        first = time.time() - t0
        if progress is not None:
            progress(first)
        t0 = time.time()
        step, t, dt, _, final, _ = full(state)
        step, t = int(step), float(t)
        wall = time.time() - t0
        pps = problem.execute_postprocessors(final, "TIMESTEP_END", t,
                                             float(dt))
        return wall, first, step, t, pps, problem.solver.substeps

    if variant == "fused":
        # second-chance slot: ONLY the fused config, for when the sh_400
        # slot's budget gate had to skip it
        def progress_f(first_wall):
            _emit({"fused_value": round(first_wall, 3),
                   "unit": f"s/{num_steps}steps (incl. compile)",
                   "compile_incl": True})

        wall2, first2, s2, t2, pps2, sub2 = run(
            ["Domain/fft_backend=PALLAS", "Problem/carry_reciprocal=true",
             "Problem/fused_spectral=true"], progress=progress_f)
        return {
            "fused_value": round(wall2, 3),
            "fused_substep_us": round(wall2 / (s2 * sub2) * 1e6, 1),
            "fused_psi_range": [round(pps2.get("min_psi", 0.0), 4),
                                round(pps2.get("max_psi", 0.0), 4)],
            "fused_compile_s": round(first2 - wall2, 1),
        }

    def progress(first_wall):
        _emit({
            "metric": f"benchmark_sh_walltime_{platform}",
            "value": round(first_wall, 3),
            "unit": f"s/{num_steps}steps (incl. compile)",
            "vs_baseline": None,
            "compile_incl": True,
        })

    wall, first, step, t, pps, substeps = run([], progress=progress)
    out = {
        "metric": f"benchmark_sh_walltime_{platform}",
        "value": round(wall, 3),
        "unit": f"s/{step}steps",
        "vs_baseline": None,  # reference publishes no SH timing
        "compile_s": round(first - wall, 1),
        "steps": step,
        "t_final": round(t, 2),
        "substep_us": round(wall / (step * substeps) * 1e6, 1),
        "psi_range": [round(pps.get("min_psi", 0.0), 4),
                      round(pps.get("max_psi", 0.0), 4)],
        "Psi": round(pps.get("Psi", float("nan")), 3),
    }
    _emit(out)

    # fused variant: optional — budget-gated like every other variant
    if not _allow_variant(420, out.get("compile_s")):
        out["fused_skipped"] = "budget"
        return out
    try:
        wall2, first2, s2, t2, pps2, sub2 = run([
            "Domain/fft_backend=PALLAS", "Problem/carry_reciprocal=true",
            "Problem/fused_spectral=true"])
        out.update({
            "fused_value": round(wall2, 3),
            "fused_substep_us": round(wall2 / (s2 * sub2) * 1e6, 1),
            "fused_psi_range": [round(pps2.get("min_psi", 0.0), 4),
                                round(pps2.get("max_psi", 0.0), 4)],
        })
    except Exception as e:  # report, never break the required metric
        out["fused_error"] = repr(e)[:300]
    return out


def _marginal(chain, reps):
    """Marginal per-call seconds: time reps and 2*reps chained calls and
    difference them — cancels the ~30 ms axon tunnel round-trip."""
    def run(k):
        t0 = time.time()
        _sync(chain(k))
        return time.time() - t0

    run(1)  # warmup / queue drain
    t1 = min(run(reps) for _ in range(2))
    t2 = min(run(2 * reps) for _ in range(2))
    return max((t2 - t1) / reps, 1e-9)


def bench_ch3d(n, substeps=10, reps=3):
    """North-star: 3-D Cahn-Hilliard at n^3, single chip.

    Reports cell-updates/s, per-substep time (excl. compile), compile
    time, and the empirical FFT-roofline fraction: the solve does 3
    FFT-equivalent passes per substep (fft(mu), fft(c), ifft(cbar-update));
    speed-of-light substep = 1.5x a bare rfftn+irfftn pair at the same
    size (PERF.md has the full model)."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    root = hit.parse(_CH3D_DECK.format(n=n, substeps=substeps))
    problem = TensorProblem(root)
    state = problem.init_state()

    # donate the state: at 512^3 the un-donated double-buffered state plus
    # FFT workspace exceeds v5e HBM (measured RESOURCE_EXHAUSTED)
    step = jax.jit(problem._step_impl, donate_argnums=(0,))
    dt = jnp.asarray(1e-3, problem.domain.dtype)

    t0 = time.time()
    out = step(state, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["c"])
    first = time.time() - t0
    # salvage point: a kill during the roofline probe below still leaves a
    # (compile-inclusive) substep bound in the artifact
    _emit({"cells": n ** 3, "compile_s": round(first, 1),
           "first_step_incl_compile_s": round(first, 3),
           "partial_stage": "compiled"})

    # tunnel round-trip latency (to subtract from the chained measurement)
    tiny = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    _sync(tiny(x0))
    t0 = time.time()
    _sync(tiny(x0))
    rt = time.time() - t0

    # donation forbids replaying the same chain, so time ONE chain of
    # `reps` steps and subtract the round-trip
    t0 = time.time()
    for _ in range(reps):
        out = step(out, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["c"])
    step_s = max((time.time() - t0 - rt) / reps, 1e-9)

    # empirical FFT speed-of-light at this size
    fftpair = jax.jit(lambda x: jnp.fft.irfftn(jnp.fft.rfftn(x)) * 1.000001)

    def chain_fft(k):
        y = out["buffers"]["c"]
        for _ in range(k):
            y = fftpair(y)
        return y

    pair = _marginal(chain_fft, 3 * reps)

    substep_s = step_s / substeps
    sol_substep = 1.5 * pair  # 3 FFT passes / substep
    del out  # free HBM before the variant configs (512^3 is tight)

    # the required BASELINE metric (cell-updates/s + roofline fraction)
    # emits BEFORE any optional variant compiles
    out_d = {
        "cells": n ** 3,
        "substep_ms": round(substep_s * 1e3, 3),
        "cell_updates_per_s": round(n ** 3 / substep_s),
        "compile_s": round(first - step_s, 1),
        "fft_pair_ms": round(pair * 1e3, 3),
        "fft_roofline_frac": round(sol_substep / substep_s, 3),
        "dtype": jnp.dtype(problem.domain.dtype).name,
    }
    _emit(out_d)

    def measure_variant(key, solver_extra, domain_extra=""):
        deck = (_CH3D_DECK.format(n=n, substeps=substeps)
                .replace("substeps =", solver_extra + "\n  substeps ="))
        if domain_extra:
            deck = deck.replace("[Domain]", "[Domain]\n  " + domain_extra)
        problem_v = TensorProblem(hit.parse(deck))
        step_v = jax.jit(problem_v._step_impl, donate_argnums=(0,))
        out_v = step_v(problem_v.init_state(), 0.0, dt, dt, jnp.asarray(False))
        _sync(out_v["buffers"]["c"])
        t0 = time.time()
        for _ in range(reps):
            out_v = step_v(out_v, 0.0, dt, dt, jnp.asarray(False))
        _sync(out_v["buffers"]["c"])
        sub_s = max((time.time() - t0 - rt) / reps, 1e-9) / substeps
        out_d[f"{key}_substep_ms"] = round(sub_s * 1e3, 3)
        out_d[f"{key}_cell_updates_per_s"] = round(n ** 3 / sub_s)
        _emit(out_d)

    # Optional variants, best-first, each gated on the global budget so a
    # cold compile cache cannot time the child out mid-variant:
    #  - fused (512 only): the whole predictor substep as 5 Pallas passes
    #    (pallas_spectral.py) — the headline 512³ number (2.3e9 cu/s)
    #  - carry_reciprocal: ū carried across substeps, 2 FFT passes instead
    #    of 3 (trajectories agree to fp roundoff, tests/test_carry_reciprocal.py)
    #  - pallas (512 only): unordered Pallas FFTs under the regular chain
    variants = []
    if n == 512:
        variants.append(("fused", "carry_reciprocal = true\n  fused_spectral = true",
                         "fft_backend = PALLAS", 420))
    variants.append(("carry", "carry_reciprocal = true", "", 300))
    if n == 512:
        variants.append(("pallas", "carry_reciprocal = true",
                         "fft_backend = PALLAS", 420))
    for key, solver_extra, domain_extra, min_budget in variants:
        if not _allow_variant(min_budget, out_d.get("compile_s")):
            out_d[f"{key}_skipped"] = "budget"
            _emit(out_d)
            continue
        try:
            measure_variant(key, solver_extra, domain_extra)
        except Exception as e:  # report, never break the required metric
            out_d[f"{key}_error"] = repr(e)[:300]
            _emit(out_d)
    return out_d


def bench_ch3d_fused(n=512, substeps=10, reps=3):
    """Second-chance slot for the ch3d fused headline (the whole predictor
    substep as 5 Pallas passes, pallas_spectral.py): when the ch3d_512
    child's budget gate had to skip the fused variant behind a slow
    required compile, leftover late-suite budget can still land the
    driver-captured fused cell-updates/s number."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    deck = (_CH3D_DECK.format(n=n, substeps=substeps)
            .replace("substeps =",
                     "carry_reciprocal = true\n  fused_spectral = true\n"
                     "  substeps =")
            .replace("[Domain]", "[Domain]\n  fft_backend = PALLAS"))
    problem = TensorProblem(hit.parse(deck))
    step = jax.jit(problem._step_impl, donate_argnums=(0,))
    dt = jnp.asarray(1e-3, problem.domain.dtype)

    t0 = time.time()
    out = step(problem.init_state(), 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["c"])
    first = time.time() - t0
    _emit({"cells": n ** 3, "fused_compile_s": round(first, 1),
           "partial_stage": "compiled"})

    tiny = jax.jit(lambda x: x + 1.0)
    _sync(tiny(jnp.zeros(())))
    t0 = time.time()
    _sync(tiny(jnp.zeros(())))
    rt = time.time() - t0

    t0 = time.time()
    for _ in range(reps):
        out = step(out, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["c"])
    sub_s = max((time.time() - t0 - rt) / reps, 1e-9) / substeps
    return {"fused_substep_ms": round(sub_s * 1e3, 3),
            "fused_cell_updates_per_s": round(n ** 3 / sub_s),
            "fused_compile_s": round(first, 1)}


def bench_lbm(n=128, substeps=20, reps=3, backend="JNP"):
    """3-D lattice Boltzmann channel flow (reference test/tests/lbm/
    channel3D.i, D3Q19 BGK + bounce-back walls) scaled to n^3 — reports
    MLUPS (million lattice-site updates per second), the standard LBM
    throughput metric.  backend=PALLAS runs the fused stream+collide
    kernel (marlin_tpu/pallas_lbm.py)."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    root = _load_deck(
        "test/tests/lbm/channel3D.i",
        [f"Domain/nx={n}", f"Domain/ny={n}", f"Domain/nz={n}",
         f"Problem/substeps={substeps}", f"Problem/lbm_backend={backend}"],
    )
    problem = TensorProblem(root)
    state = problem.init_state()
    step = jax.jit(problem._step_impl, donate_argnums=(0,))
    dt = jnp.asarray(1.0, problem.domain.dtype)

    t0 = time.time()
    out = step(state, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["f"])
    first = time.time() - t0
    _emit({"cells": n ** 3, "stencil": "D3Q19", "backend": backend,
           "compile_s": round(first, 1), "partial_stage": "compiled"})

    tiny = jax.jit(lambda x: x + 1.0)
    _sync(tiny(jnp.zeros(())))
    t0 = time.time()
    _sync(tiny(jnp.zeros(())))
    rt = time.time() - t0

    t0 = time.time()
    for _ in range(reps):
        out = step(out, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["f"])
    step_s = max((time.time() - t0 - rt) / reps, 1e-9)
    mlups = n ** 3 * substeps / step_s / 1e6
    return {
        "cells": n ** 3,
        "stencil": "D3Q19",
        "backend": backend,
        "substep_ms": round(step_s / substeps * 1e3, 3),
        "mlups": round(mlups, 1),
        "compile_s": round(first - step_s, 1),
        "dtype": jnp.dtype(problem.domain.dtype).name,
    }


_POROUS_DECK = """
[Domain]
  dim = 3
  nx = {n}
  ny = {n}
  nz = {n}
  mesh_mode = DUMMY
[]
[Stencil]
  [s]
    type = LBMD3Q19
  []
[]
[TensorBuffers]
  [f]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [feq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [fpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [velocity]
    type = LBMTensorBuffer
    buffer_type = mv
  []
  [density]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [speed]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [media]
    type = LBMTensorBuffer
    buffer_type = ms
    is_integer = true
    file = {media_h5}
  []
[]
[TensorComputes]
  [Initialize]
    [initial_density]
      type = LBMConstantTensor
      buffer = density
      constants = 1.0
    []
    [initial_velocity]
      type = LBMConstantTensor
      buffer = velocity
      constants = '0.0 0.0 0.0'
    []
    [initial_equilibrium]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [initial_distribution]
      type = LBMEquilibrium
      buffer = f
      bulk = density
      velocity = velocity
    []
    [initial_distribution_pc]
      type = LBMEquilibrium
      buffer = fpc
      bulk = density
      velocity = velocity
    []
  []
  [Solve]
    [equilibrium]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [collision]
      type = LBMBGKCollision
      buffer = fpc
      f = f
      feq = feq
      tau0 = 0.8
    []
    [density]
      type = LBMComputeDensity
      buffer = density
      f = f
    []
    [velocity]
      type = LBMComputeVelocity
      buffer = velocity
      f = f
      rho = density
      add_body_force = true
      body_force_x = 0.0001
    []
    [speed]
      type = LBMComputeVelocityMagnitude
      buffer = speed
      velocity = velocity
    []
    [residual]
      type = LBMComputeResidual
      buffer = speed
      speed = speed
    []
  []
  [Boundary]
    [wall]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = wall
    []
  []
[]
[TensorSolver]
  type = LBMStream
  buffer = f
  f_old = fpc
[]
[Problem]
  type = LatticeBoltzmannProblem
  substeps = {substeps}
  binary_media = media
  lbm_backend = {backend}
[]
"""


def bench_lbm_porous(n=128, substeps=20, reps=3, backend="PALLAS"):
    """Porous-media LBM (D3Q19 BGK, random sphere pack ~15% solid, obstacle
    bounce-back, body-force-driven flow) — the production LBM workload.
    Fused kernel computes the per-direction obstacle masks in-kernel from
    the media halo."""
    import tempfile

    import h5py
    import jax
    import jax.numpy as jnp
    import numpy as np

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    rng = np.random.RandomState(42)
    media = np.ones((n, n, n), dtype=np.int64)
    idx = np.indices((n, n, n))
    r = max(2, n // 16)
    for _ in range(max(8, (n // r) ** 3 // 24)):
        c = rng.randint(0, n, 3)
        d2 = sum(np.minimum(np.abs(idx[k] - c[k]), n - np.abs(idx[k] - c[k])) ** 2
                 for k in range(3))
        media[d2 <= r * r] = 0

    tmp = tempfile.mkdtemp()
    h5path = os.path.join(tmp, "media.h5")
    with h5py.File(h5path, "w") as f:
        f.create_dataset("media", data=media)

    root = hit.parse(_POROUS_DECK.format(
        n=n, substeps=substeps, backend=backend, media_h5=h5path))
    problem = TensorProblem(root)
    state = problem.init_state()
    step = jax.jit(problem._step_impl, donate_argnums=(0,))
    dt = jnp.asarray(1.0, problem.domain.dtype)

    t0 = time.time()
    out = step(state, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["speed"])
    first = time.time() - t0
    _emit({"cells": n ** 3, "stencil": "D3Q19", "backend": backend,
           "compile_s": round(first, 1), "partial_stage": "compiled"})

    tiny = jax.jit(lambda x: x + 1.0)
    _sync(tiny(jnp.zeros(())))
    t0 = time.time()
    _sync(tiny(jnp.zeros(())))
    rt = time.time() - t0

    t0 = time.time()
    for _ in range(reps):
        out = step(out, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["speed"])
    step_s = max((time.time() - t0 - rt) / reps, 1e-9)
    return {
        "cells": n ** 3,
        "stencil": "D3Q19",
        "backend": backend,
        "solid_frac": round(float((media == 0).mean()), 3),
        "substep_ms": round(step_s / substeps * 1e3, 3),
        "mlups": round(n ** 3 * substeps / step_s / 1e6, 1),
        "compile_s": round(first - step_s, 1),
        "dtype": jnp.dtype(problem.domain.dtype).name,
    }


# Mixed-BC channel (reference examples/lbm/Pebbles pattern, single
# lattice): BGK collision, bounce-back walls, Zou-He velocity inlet
# (LBMFixedFirstOrderBC), microscopic zero-gradient outlet — the most
# common non-periodic production LBM configuration.  Exercises the fused
# kernel's post-stream BC stage (r04).
_MIXED_DECK = """
[Domain]
  dim = 3
  nx = {n}
  ny = {n}
  nz = {n}
  mesh_mode = DUMMY
[]
[Stencil]
  [s]
    type = LBMD3Q19
  []
[]
[TensorBuffers]
  [f]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [feq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [fpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [velocity]
    type = LBMTensorBuffer
    buffer_type = mv
  []
  [density]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [speed]
    type = LBMTensorBuffer
    buffer_type = ms
  []
[]
[TensorComputes]
  [Initialize]
    [initial_density]
      type = LBMConstantTensor
      buffer = density
      constants = 1.0
    []
    [initial_velocity]
      type = LBMConstantTensor
      buffer = velocity
      constants = '0.01 0.0 0.0'
    []
    [initial_equilibrium]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [initial_distribution]
      type = LBMEquilibrium
      buffer = f
      bulk = density
      velocity = velocity
    []
    [initial_distribution_pc]
      type = LBMEquilibrium
      buffer = fpc
      bulk = density
      velocity = velocity
    []
  []
  [Solve]
    [density]
      type = LBMComputeDensity
      buffer = density
      f = f
    []
    [velocity]
      type = LBMComputeVelocity
      buffer = velocity
      f = f
      rho = density
    []
    [feq]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [collision]
      type = LBMBGKCollision
      buffer = fpc
      f = f
      feq = feq
      tau0 = 0.6
    []
    [speed]
      type = LBMComputeVelocityMagnitude
      buffer = speed
      velocity = velocity
    []
    [residual]
      type = LBMComputeResidual
      buffer = speed
      speed = speed
    []
  []
  [Boundary]
    [top]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = top
    []
    [bottom]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = bottom
    []
    [front]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = front
    []
    [back]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = back
    []
    [inlet]
      type = LBMFixedFirstOrderBC
      buffer = f
      f = f
      value = 0.01
      boundary = left
    []
    [outlet]
      type = LBMMicroscopicZeroGradientBC
      buffer = f
      boundary = right
    []
  []
[]
[TensorSolver]
  type = LBMStream
  buffer = f
  f_old = fpc
[]
[Problem]
  type = LatticeBoltzmannProblem
  substeps = {substeps}
  lbm_backend = {backend}
[]
[Executioner]
  type = Transient
  num_steps = 3
[]
"""


def bench_lbm_thermal(substeps=200, reps=5, backend="PALLAS", nx=512, ny=256):
    """Thermal double-distribution LBM (reference
    examples/lbm/Rayleigh-Benard — fluid f + passive-scalar g, Boussinesq
    buoyancy, Guo forcing, bounce-back walls, temperature Dirichlet
    faces) at production scale.  MLUPS counts BOTH lattices' site
    updates (2·nx·ny per substep), the standard convention for coupled
    double-distribution codes."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    deck = os.path.join(REF_DIR,
                        "examples/lbm/Rayleigh-Benard/rayleigh-benard.i")
    if not os.path.exists(deck):
        return {"skipped": "reference Rayleigh-Benard deck not available"}
    root = hit.load(deck, [f"Nx={nx}", f"Ny={ny}",
                           f"Problem/substeps={substeps}",
                           f"Problem/lbm_backend={backend}"])
    problem = TensorProblem(root)
    state = problem.init_state()
    step = jax.jit(problem._step_impl, donate_argnums=(0,))
    dt = jnp.asarray(1.0, problem.domain.dtype)

    t0 = time.time()
    out = step(state, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["T"])
    first = time.time() - t0
    _emit({"cells": nx * ny, "lattices": 2, "stencil": "D2Q9",
           "backend": backend, "compile_s": round(first, 1),
           "partial_stage": "compiled"})

    tiny = jax.jit(lambda x: x + 1.0)
    _sync(tiny(jnp.zeros(())))
    t0 = time.time()
    _sync(tiny(jnp.zeros(())))
    rt = time.time() - t0

    t0 = time.time()
    for _ in range(reps):
        out = step(out, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["T"])
    step_s = max((time.time() - t0 - rt) / reps, 1e-9)
    return {
        "cells": nx * ny,
        "lattices": 2,
        "stencil": "D2Q9",
        "backend": backend,
        "substep_ms": round(step_s / substeps * 1e3, 3),
        "mlups": round(2 * nx * ny * substeps / step_s / 1e6, 1),
        "compile_s": round(first - step_s, 1),
        "dtype": jnp.dtype(problem.domain.dtype).name,
    }


# 3-D thermal double-distribution deck: the Rayleigh-Benard pattern
# (reference examples/lbm/Rayleigh-Benard/*.i) extended to a 3-D D3Q19 box
# with the convection axis along x — temperature gradient, plates, AND
# gravity all on the x faces (the reference leaves the Zou-He front/back
# faces unimplemented: "rotate the domain", LBMFixedZerothOrderBC.C:36-53)
# — the same physics chain as the reference's
# natural_convection_3D/convection.i (two coupled lattices, Boussinesq
# buoyancy, Guo forcing) with face BCs (bounce-back plates + fixed
# temperature) instead of its notebook-generated regional media.
_THERMAL3D_DECK = """
[Domain]
  dim = 3
  nx = {n}
  ny = {n}
  nz = {n}
  xmax = {n}
  ymax = {n}
  zmax = {n}
  mesh_mode = DUMMY
[]
[Stencil]
  [s]
    type = LBMD3Q19
  []
[]
[TensorBuffers]
  [f]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [feq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [fpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [g]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [geq]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [gpc]
    type = LBMTensorBuffer
    buffer_type = df
  []
  [density]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [T]
    type = LBMTensorBuffer
    buffer_type = ms
  []
  [velocity]
    type = LBMTensorBuffer
    buffer_type = mv
  []
  [F]
    type = LBMTensorBuffer
    buffer_type = mv
  []
[]
[TensorComputes]
  [Initialize]
    [density]
      type = LBMConstantTensor
      buffer = density
      constants = 'rho0'
    []
    [velocity]
      type = LBMConstantTensor
      buffer = velocity
      constants = '0.0 0.0 0.0'
    []
    [temperature]
      type = ParsedCompute
      buffer = T
      expression = '1.1 - 0.1*x/{n} + 0.005*sin(y/8)*sin(z/8)'
      extra_symbols = true
    []
    [eq_f]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [eq_f_total]
      type = LBMEquilibrium
      buffer = f
      bulk = density
      velocity = velocity
    []
    [eq_f_pc]
      type = LBMEquilibrium
      buffer = fpc
      bulk = density
      velocity = velocity
    []
    [eq_g]
      type = LBMEquilibrium
      buffer = geq
      bulk = T
      velocity = velocity
    []
    [eq_g_total]
      type = LBMEquilibrium
      buffer = g
      bulk = T
      velocity = velocity
    []
    [eq_g_pc]
      type = LBMEquilibrium
      buffer = gpc
      bulk = T
      velocity = velocity
    []
  []
  [Solve]
    [Temperature]
      type = LBMComputeDensity
      buffer = T
      f = g
    []
    [Fluid_density]
      type = LBMComputeDensity
      buffer = density
      f = f
    []
    [Fluid_velocity]
      type = LBMComputeVelocity
      buffer = velocity
      f = f
      rho = density
      forces = F
      enable_forces = true
    []
    [Eq_temperature]
      type = LBMEquilibrium
      buffer = geq
      bulk = T
      velocity = velocity
    []
    [Collision_temperature]
      type = LBMBGKCollision
      buffer = gpc
      f = g
      feq = geq
      tau0 = tau_T
    []
    [Compute_forces]
      type = LBMComputeForces
      buffer = F
      rho0 = 'rho0'
      temperature = T
      T0 = T_0
      enable_buoyancy = true
      gravity = g
      gravity_direction = 0
    []
    [Eq_fluid]
      type = LBMEquilibrium
      buffer = feq
      bulk = density
      velocity = velocity
    []
    [Collision_fluid]
      type = LBMBGKCollision
      buffer = fpc
      f = f
      feq = feq
      tau0 = tau_f
    []
    [Apply_forces]
      type = LBMApplyForces
      buffer = fpc
      velocity = velocity
      rho = density
      forces = F
      tau0 = tau_f
    []
  []
  [Boundary]
    [plate_left]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = left
    []
    [plate_right]
      type = LBMBounceBack
      buffer = f
      f_old = fpc
      boundary = right
    []
    [hot_left]
      type = LBMFixedZerothOrderBC
      buffer = g
      f = g
      value = T_H
      boundary = left
    []
    [cold_right]
      type = LBMFixedZerothOrderBC
      buffer = g
      f = g
      value = T_C
      boundary = right
    []
  []
[]
[TensorSolver]
  type = LBMStream
  buffer = 'f g'
  f_old = 'fpc gpc'
[]
[Problem]
  type = LatticeBoltzmannProblem
  scalar_constant_names = 'rho0 T_0  T_C  T_H  tau_f tau_T  g'
  scalar_constant_values = '1.0  1.05 1.0  1.1  0.7   0.7   0.0001'
  substeps = {substeps}
  lbm_backend = {backend}
[]
[Executioner]
  type = Transient
  num_steps = 1
[]
"""


def bench_lbm_thermal3d(n=128, substeps=20, reps=3, backend="PALLAS"):
    """3-D thermal double-distribution at n^3 (D3Q19 x2 lattices) — the
    HBM-streamed regime the 2-D single-block RB number never enters
    (VERDICT r04 weak #5), so thermal throughput gets a row comparable to
    the other 3-D entries.  MLUPS counts both lattices' site updates
    (2·n^3 per substep, double-distribution convention)."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    root = hit.parse(_THERMAL3D_DECK.format(n=n, substeps=substeps,
                                            backend=backend))
    problem = TensorProblem(root)
    state = problem.init_state()
    step = jax.jit(problem._step_impl, donate_argnums=(0,))
    dt = jnp.asarray(1.0, problem.domain.dtype)

    t0 = time.time()
    out = step(state, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["T"])
    first = time.time() - t0
    _emit({"cells": n ** 3, "lattices": 2, "stencil": "D3Q19",
           "backend": backend, "compile_s": round(first, 1),
           "partial_stage": "compiled"})

    tiny = jax.jit(lambda x: x + 1.0)
    _sync(tiny(jnp.zeros(())))
    t0 = time.time()
    _sync(tiny(jnp.zeros(())))
    rt = time.time() - t0

    t0 = time.time()
    for _ in range(reps):
        out = step(out, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["T"])
    step_s = max((time.time() - t0 - rt) / reps, 1e-9)
    return {
        "cells": n ** 3,
        "lattices": 2,
        "stencil": "D3Q19",
        "backend": backend,
        "substep_ms": round(step_s / substeps * 1e3, 3),
        "mlups": round(2 * n ** 3 * substeps / step_s / 1e6, 1),
        "compile_s": round(first - step_s, 1),
        "dtype": jnp.dtype(problem.domain.dtype).name,
    }


def bench_lbm_karman(substeps=100, reps=5, backend="PALLAS",
                     nx=800, ny=200):
    """Kármán-vortex cylinder deck (reference
    examples/lbm/Karman-vortex/cylinder.i at its shipped 800×200 scale:
    Smagorinsky + Hermite projection, obstacle bounce-back, perturbed
    Zou-He inlet, zero-gradient outlet) — the r04 single-block 2-D fused
    pattern.  Media synthesized the way the upstream notebook does."""
    import tempfile

    import h5py
    import jax
    import jax.numpy as jnp
    import numpy as np

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    deck = os.path.join(REF_DIR, "examples/lbm/Karman-vortex/cylinder.i")
    if not os.path.exists(deck):
        return {"skipped": "reference Karman deck not available"}
    x, y = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    media = np.ones((nx, ny), dtype=np.int64)
    media[(x - nx // 5) ** 2 + (y - ny // 2) ** 2 <= (ny // 10) ** 2] = 0
    tmp = tempfile.mkdtemp()
    h5path = os.path.join(tmp, "binary_media.h5")
    with h5py.File(h5path, "w") as f:
        f.create_dataset("binary_media", data=media)

    root = hit.load(deck, [
        f"Domain/nx={nx}", f"Domain/ny={ny}",
        f"Problem/substeps={substeps}",
        f"Problem/lbm_backend={backend}",
        "TensorBuffers/binary_media/file=" + h5path,
    ])
    problem = TensorProblem(root)
    state = problem.init_state()
    step = jax.jit(problem._step_impl, donate_argnums=(0,))
    dt = jnp.asarray(1.0, problem.domain.dtype)

    t0 = time.time()
    out = step(state, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["speed"])
    first = time.time() - t0
    _emit({"cells": nx * ny, "stencil": "D2Q9", "backend": backend,
           "pattern": "smagorinsky+projection+perturbed_inlet+zg_outlet",
           "compile_s": round(first, 1), "partial_stage": "compiled"})

    tiny = jax.jit(lambda x: x + 1.0)
    _sync(tiny(jnp.zeros(())))
    t0 = time.time()
    _sync(tiny(jnp.zeros(())))
    rt = time.time() - t0

    t0 = time.time()
    for _ in range(reps):
        out = step(out, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["speed"])
    step_s = max((time.time() - t0 - rt) / reps, 1e-9)
    return {
        "cells": nx * ny,
        "stencil": "D2Q9",
        "backend": backend,
        "pattern": "smagorinsky+projection+perturbed_inlet+zg_outlet",
        "substep_ms": round(step_s / substeps * 1e3, 3),
        "mlups": round(nx * ny * substeps / step_s / 1e6, 1),
        "compile_s": round(first - step_s, 1),
        "dtype": jnp.dtype(problem.domain.dtype).name,
    }


def bench_lbm_mixed(n=128, substeps=20, reps=3, backend="PALLAS"):
    """Mixed-BC LBM channel (Zou-He velocity inlet + zero-gradient outlet
    + bounce-back walls, D3Q19 BGK): before r04 this pattern fell off the
    fused kernel onto the jnp chain (~340-600 MLUPS); the fused
    post-stream BC stage keeps it at fused speed."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    root = hit.parse(_MIXED_DECK.format(n=n, substeps=substeps,
                                        backend=backend))
    problem = TensorProblem(root)
    state = problem.init_state()
    step = jax.jit(problem._step_impl, donate_argnums=(0,))
    dt = jnp.asarray(1.0, problem.domain.dtype)

    t0 = time.time()
    out = step(state, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["speed"])
    first = time.time() - t0
    _emit({"cells": n ** 3, "stencil": "D3Q19", "backend": backend,
           "bcs": "zouhe_inlet+zg_outlet+bounceback",
           "compile_s": round(first, 1), "partial_stage": "compiled"})

    tiny = jax.jit(lambda x: x + 1.0)
    _sync(tiny(jnp.zeros(())))
    t0 = time.time()
    _sync(tiny(jnp.zeros(())))
    rt = time.time() - t0

    t0 = time.time()
    for _ in range(reps):
        out = step(out, 0.0, dt, dt, jnp.asarray(False))
    _sync(out["buffers"]["speed"])
    step_s = max((time.time() - t0 - rt) / reps, 1e-9)
    return {
        "cells": n ** 3,
        "stencil": "D3Q19",
        "backend": backend,
        "bcs": "zouhe_inlet+zg_outlet+bounceback",
        "substep_ms": round(step_s / substeps * 1e3, 3),
        "mlups": round(n ** 3 * substeps / step_s / 1e6, 1),
        "compile_s": round(first - step_s, 1),
        "dtype": jnp.dtype(problem.domain.dtype).name,
    }


# Embedded equivalent of the deGeus hyperelastic RVE benchmark deck
# (reference examples/degeus_mechanics/mech.i): two-phase K/mu fields from
# PhaseMechanicsTest, HyperElasticIsotropic constitutive model, FFTMechanics
# Newton+CG solve under a MacroscopicShearTensor ramp, 10 substeps/step.
_MECH_DECK = """
[Domain]
  dim = 3
  nx = 32
  ny = 32
  nz = 32
  xmax = ${fparse 2*pi}
  ymax = ${fparse 2*pi}
  zmax = ${fparse 2*pi}
  mesh_mode = DUMMY
[]
[TensorComputes]
  [Initialize]
    [Finit]
      type = RankTwoIdentity
      buffer = F
    []
    [phase]
      type = PhaseMechanicsTest
      buffer = phase
    []
    [K]
      type = ParsedCompute
      buffer = K
      expression = '(1-phase)*Ka + phase*Kb'
      inputs = phase
      constant_names = 'Ka Kb'
      constant_expressions = '0.833 8.33'
    []
    [mu]
      type = ParsedCompute
      buffer = mu
      expression = '(1-phase)*mua + phase*mub'
      inputs = phase
      constant_names = 'mua mub'
      constant_expressions = '0.386 3.86'
    []
  []
  [Solve]
    [hyper_elasticity]
      type = HyperElasticIsotropic
      buffer = stress
      F = Fnew
      K = K
      mu = mu
    []
    [root]
      [applied_strain]
        type = MacroscopicShearTensor
        buffer = applied_strain
      []
      [mech]
        type = FFTMechanics
        buffer = Fnew
        F = F
        K = K
        mu = mu
        l_tol = 1e-2
        nl_rel_tol = 2e-2
        nl_abs_tol = 2e-2
        constitutive_model = hyper_elasticity
        stress = stress
        applied_macroscopic_strain = applied_strain
      []
    []
  []
[]
[TensorSolver]
  type = ForwardEulerSolver
  root_compute = root
  forward_buffer = F
  forward_buffer_new = Fnew
  substeps = 10
[]
[Executioner]
  type = Transient
  num_steps = 100
  dt = 0.01
[]
"""


def bench_degeus(steps=10, reps=2, n=None, fft_backend=None, precond=None):
    """deGeus FFT-micromechanics RVE wall-clock (BASELINE.json metric #2):
    the shipped 32^3 hyperelastic RVE (reference
    examples/degeus_mechanics/mech.i — Newton + matrix-free CG per substep,
    10 substeps/step, shear ramp), timed over `steps` load steps.
    n overrides the grid extent (degeus64 child); fft_backend=PALLAS runs
    the CG loop's tensor-valued Green-projection FFTs on the unordered
    Pallas kernels (supported extents only — not the 32³ default grid)."""
    import jax
    import jax.numpy as jnp

    from marlin_tpu import hit
    from marlin_tpu.problem import TensorProblem

    over = [] if n is None else [f"Domain/nx={n}", f"Domain/ny={n}",
                                 f"Domain/nz={n}"]
    if fft_backend:
        over.append(f"Domain/fft_backend={fft_backend}")
    if precond:
        # opt-in CG preconditioning (r05): reference-medium inverse per
        # CG iteration — see PERF.md deGeus section
        over.append("TensorComputes/Solve/root/mech/preconditioner="
                    + precond)
    root = _load_deck("examples/degeus_mechanics/mech.i", over,
                      fallback=_MECH_DECK)
    problem = TensorProblem(root)
    state = problem.init_state()
    step = jax.jit(problem._step_impl)
    dt = jnp.asarray(0.01, problem.domain.dtype)

    t0 = time.time()
    out = step(state, 0.0, dt, dt, jnp.asarray(True))
    _sync(out["buffers"]["F"])
    first = time.time() - t0
    result = {
        "rve": f"{n or 32}^3 hyperelastic (mech.i)",
        "steps": steps,
        "fft_backend": fft_backend or "DEFAULT",
        "preconditioner": precond or "NONE",
        "compile_s": round(first, 1),
    }
    # salvage point (r03 post-mortem: this child emitted NOTHING between
    # start and final return, so a timeout during its 500 s-class cold
    # compile lost the whole measurement) — the first-step wall already
    # bounds step time, so a mid-run kill salvages a legitimate number
    _emit(dict(result, first_step_incl_compile_s=round(first, 3),
               partial_stage="compiled"))

    def run(k):
        s = out
        for i in range(k):
            s = step(s, (i + 1) * 0.01, dt, dt, jnp.asarray(False))
        _sync(s["buffers"]["F"])

    t0 = time.time()
    run(steps)
    wall = time.time() - t0
    result.update({
        "wall_s": round(wall, 3),
        "step_ms": round(wall / steps * 1e3, 1),
    })
    _emit(result)
    return result


def bench_probe():
    """Backend-health probe: compile a trivial program and fetch a scalar.
    A wedged axon backend fails here with FAILED_PRECONDITION in seconds
    instead of burning a full benchmark timeout (r01 item 2)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    v = _sync(tiny(jnp.zeros(())))
    return {"ok": v == 1.0, "backend": jax.default_backend()}


def _child_result(name):
    """Dispatch a child benchmark by name and return its result dict."""
    fns = {
        "probe": bench_probe,
        "1a": bench_1a,
        "ch3d_fused": bench_ch3d_fused,
        "2a": bench_2a,
        "sh": bench_sh,
        "sh_fused": lambda: bench_sh(variant="fused"),
        "lbm": bench_lbm,
        "lbm_pallas": lambda: bench_lbm(backend="PALLAS"),
        "lbm_porous": lambda: bench_lbm_porous(backend="PALLAS"),
        "lbm_porous_jnp": lambda: bench_lbm_porous(backend="JNP"),
        "lbm_mixed": lambda: bench_lbm_mixed(backend="PALLAS"),
        "lbm_mixed_jnp": lambda: bench_lbm_mixed(backend="JNP"),
        "lbm_thermal": lambda: bench_lbm_thermal(backend="PALLAS"),
        "lbm_thermal_jnp": lambda: bench_lbm_thermal(backend="JNP"),
        "lbm_thermal3d": lambda: bench_lbm_thermal3d(backend="PALLAS"),
        "lbm_thermal3d_jnp": lambda: bench_lbm_thermal3d(backend="JNP"),
        "lbm_karman": lambda: bench_lbm_karman(backend="PALLAS"),
        "lbm_karman_jnp": lambda: bench_lbm_karman(backend="JNP"),
        "degeus": bench_degeus,
        "degeus_pallas": lambda: bench_degeus(fft_backend="PALLAS"),
        # 8x the reference's demonstrated RVE (not in the main suite: the
        # 64^3 Newton+CG compile alone takes ~8 min cold)
        "degeus64": lambda: bench_degeus(steps=3, reps=1, n=64),
        "degeus64_pallas": lambda: bench_degeus(steps=3, reps=1, n=64,
                                                fft_backend="PALLAS"),
        # 64x the reference RVE — runs via the analytic-tangent CG
        # operator (no rank-4 tangent; mechanics.py tangent_contract)
        "degeus128": lambda: bench_degeus(steps=2, reps=1, n=128),
        "degeus128_pallas": lambda: bench_degeus(steps=2, reps=1, n=128,
                                                 fft_backend="PALLAS"),
        "degeus_pcg": lambda: bench_degeus(precond="REFERENCE_MEDIUM"),
        "degeus128_pcg": lambda: bench_degeus(steps=2, reps=1, n=128,
                                              precond="REFERENCE_MEDIUM"),
        "1a_fused": bench_1a_fused,
        "2a_tuned": lambda: bench_2a(variant="tuned"),
    }
    if name == "ch3d_fused" or not name.startswith("ch3d_"):
        if name not in fns:
            raise SystemExit(f"unknown benchmark {name}")
        return fns[name]()
    return bench_ch3d(int(name.split("_")[1]))


def _run_child(name):
    _enable_compile_cache()
    print(json.dumps(_child_result(name)))


def _run_batch(names, per_child_timeout=600):
    """Run several children sequentially in ONE process (amortizes the
    per-process backend attach, ~10-60 s each on axon; VERDICT r04 item 3).
    Emits one `{"__batch__": name, "result": ...}` line per completed
    child so the parent can absorb every finished child even if a later
    one crashes or the batch is killed.  A child failure ABORTS the
    batch (an axon failure can poison the whole process — the bogus
    state must not masquerade as measurements for the remaining
    children); the parent falls back to isolated spawns for the rest.

    Each child gets a SIGALRM watchdog matching the 600 s cap isolated
    spawns have (r05 review: without it one stuck child starved every
    later tail child AND the isolated fallbacks, since the batch only
    died at the global deadline).  A fired watchdog also aborts the
    batch — the interrupted axon op may have poisoned the process."""
    import signal

    _enable_compile_cache()

    def _on_alarm(signum, frame):
        raise TimeoutError(f"batch child exceeded {per_child_timeout}s")

    for name in names.split(","):
        old = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(per_child_timeout)
        try:
            result = _child_result(name)
        except BaseException as e:  # SystemExit/TimeoutError included
            print(json.dumps({"__batch__": name, "error": repr(e)[:400]}),
                  flush=True)
            sys.stderr.write(f"batch aborted at {name}: {e!r}\n"[:500])
            return
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
        print(json.dumps({"__batch__": name, "result": result}), flush=True)


def _last_json_line(text):
    for line in reversed((text or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:  # includes json.JSONDecodeError
                continue
    return None


def _spawn(name, deadline, attempts=2, timeout=900):
    """Run one benchmark in a fresh subprocess (axon failures poison the
    process; isolation makes retries meaningful).

    Deadline-aware: each attempt's timeout is clipped to the remaining
    global budget; with < 120 s left the child is skipped outright.
    Children emit their accumulating result dict line-by-line, so when an
    attempt times out or crashes mid-run the last parseable line is
    salvaged and returned with partial/error annotations (r01 item 1)."""
    last, salvage = None, None
    for i in range(attempts):
        remaining = deadline - time.time()
        if remaining < 120:
            break
        t = min(timeout, remaining)
        stdout = ""
        env = dict(os.environ, MARLIN_TPU_BENCH_DEADLINE=str(deadline))
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", name],
                capture_output=True, text=True, timeout=t, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            stdout = p.stdout
            if p.returncode == 0:
                got = _last_json_line(p.stdout)
                if got is not None:
                    return got
            last = f"rc={p.returncode}: {p.stderr.strip()[-600:]}"
        except subprocess.TimeoutExpired as e:
            stdout = e.stdout if isinstance(e.stdout, str) else (
                e.stdout.decode(errors="replace") if e.stdout else "")
            last = f"timeout after {t:.0f}s"
        except Exception as e:
            last = repr(e)
        got = _last_json_line(stdout)
        if got is not None:
            salvage = got
        sys.stderr.write(f"bench {name} attempt {i} failed: {last}\n")
    if salvage is not None:
        salvage.update({"partial": True, "error": last})
        return salvage
    return {"error": last or "skipped: budget exhausted"}


def _batch_spawn(pairs, deadline):
    """Run several tail children in ONE subprocess via `--batch`
    (amortizes the per-process backend attach).  Returns {key: result}
    for every child that emitted a result line; children missing from
    the map (batch aborted on a poisoned process, timed out, or never
    reached) fall back to isolated `_spawn`s in main(), and a PARTIAL
    salvage (progress line of a killed child) is retried isolated too,
    serving only as the fallback if the retry fails."""
    remaining = deadline - time.time()
    if remaining < 120:
        return {}
    env = dict(os.environ, MARLIN_TPU_BENCH_DEADLINE=str(deadline))
    names = ",".join(child for _, child in pairs)
    stdout = ""
    try:
        # leave a 30 s window so the parent can absorb/emit the salvaged
        # per-child lines even when the batch runs to the deadline
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--batch", names],
            capture_output=True, text=True, timeout=remaining - 30, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        stdout = p.stdout
    except subprocess.TimeoutExpired as e:
        stdout = e.stdout if isinstance(e.stdout, str) else (
            e.stdout.decode(errors="replace") if e.stdout else "")
        sys.stderr.write(f"bench batch timed out after {remaining:.0f}s\n")
    except Exception as e:
        sys.stderr.write(f"bench batch failed: {e!r}\n")
    got, tail_progress = {}, None
    for line in (stdout or "").splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except ValueError:
            continue
        name = d.get("__batch__")
        if name is not None:
            if isinstance(d.get("result"), dict):
                got[name] = d["result"]
            elif tail_progress is not None:
                # the child FAILED (watchdog/exception) after emitting
                # incremental progress — salvage it with the partial/error
                # annotations, exactly like _spawn's _last_json_line path
                got[name] = dict(tail_progress, partial=True,
                                 error=str(d.get("error"))[:400])
            tail_progress = None  # progress lines belonged to this child
        else:
            # a child's own incremental _emit line (compile-inclusive
            # walls etc.); salvageable if the child never completes
            tail_progress = d
    out = {key: got[child] for key, child in pairs if child in got}
    if tail_progress is not None:
        # children run in order, so the first pair without a result is
        # the in-flight child the trailing progress lines belong to
        # (the batch itself was killed mid-child, r05 review)
        for key, child in pairs:
            if child not in got:
                out[key] = dict(tail_progress, partial=True,
                                error="batch killed mid-child")
                break
    return out


def _probe(deadline):
    """False only on persistent FAST failures — the r01 wedge signature is
    FAILED_PRECONDITION within seconds of process start.  Probe TIMEOUTS
    mean the backend is merely busy (e.g. still chewing a killed child's
    compile — observed to block new requests for minutes), so the suite
    proceeds immediately: children have their own timeouts and
    partial-result salvage.  Worst case the probe costs ~90 s of budget
    (one timed-out attempt); a second attempt runs only to CONFIRM a
    fast failure."""
    for attempt in range(2):
        if deadline - time.time() < 30:
            return True  # can't tell; the budget logic labels the skips
        t0 = time.time()
        got = _spawn("probe", deadline=min(deadline, t0 + 150),
                     attempts=1, timeout=90)
        if got.get("ok"):
            return True
        err = str(got.get("error") or "")
        if "budget exhausted" in err:
            return True  # never actually contacted the backend
        if time.time() - t0 >= 60:
            return True  # slow failure/timeout = busy, not wedged
        time.sleep(10)
    return False


# Second-chance children: late-suite slots that re-attempt a headline
# VARIANT number whose primary slot's budget gate had to skip it behind a
# slow required compile.  key -> (primary slot key or None for top level,
# presence-check key, variant key prefix to merge).
SECOND_CHANCE = {
    "1a_fused": (None, "fused_value", "fused"),
    "ch3d_fused": ("ch3d_512", "fused_substep_ms", "fused"),
    "2a_tuned": ("benchmark_2a", "tuned_value", "tuned"),
    "sh_fused": ("sh_400", "fused_value", "fused"),
}


def _second_chance_target(result, key):
    sc = SECOND_CHANCE.get(key)
    if sc is None:
        return None, None
    target = result if sc[0] is None else result.get(sc[0])
    return sc, (target if isinstance(target, dict) else None)


def _second_chance_landed(result, key):
    """True when the metric a second-chance child exists for is already in
    the accumulated result (the primary slot's gate let the variant run)."""
    sc, target = _second_chance_target(result, key)
    return (sc is not None and target is not None
            and target.get(sc[1]) is not None)


def _absorb(result, key, sub):
    """Merge one child's output dict into the accumulated artifact."""
    if key == "1a":
        # the 1a headline IS the artifact's top-level metric
        if "value" in sub and sub.get("value") is not None:
            result.update(sub)
        else:
            result.update({k: v for k, v in sub.items()
                           if k in ("error", "skipped", "partial")})
        return
    sc, target = _second_chance_target(result, key)
    if sc is not None:
        if sub.get(sc[1]) is not None:
            # land the second-chance number in the primary slot, where the
            # budget-gated variant would have put it
            if target is None:
                target = result.setdefault(sc[0], {})
            target.pop(f"{sc[2]}_skipped", None)
            target.update({k: v for k, v in sub.items()
                           if k.startswith(sc[2])})
        else:
            result[key] = sub
        return
    result[key] = sub


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--list":
        print("children (run one with: python bench.py --child <name>):")
        for name in ("probe", "1a", "1a_fused", "2a", "2a_tuned", "sh",
                     "sh_fused", "ch3d_256",
                     "ch3d_512", "ch3d_fused",
                     "lbm", "lbm_pallas", "lbm_porous", "lbm_porous_jnp",
                     "lbm_mixed", "lbm_mixed_jnp", "lbm_thermal",
                     "lbm_thermal_jnp", "lbm_thermal3d", "lbm_thermal3d_jnp",
                     "lbm_karman", "lbm_karman_jnp",
                     "degeus", "degeus_pallas", "degeus64", "degeus64_pallas",
                     "degeus128", "degeus128_pallas", "degeus_pcg",
                     "degeus128_pcg"):
            print(" ", name)
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _run_child(sys.argv[2])
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--batch":
        _run_batch(sys.argv[2])
        return

    deadline = time.time() + BUDGET_S
    result = {"metric": "benchmark_1a_spinodal_walltime", "value": None,
              "unit": "s", "vs_baseline": None}
    # No up-front probe (r04): the r03 artifact burned 90-180 s of budget on
    # probe timeouts that told us nothing (cold backend ATTACH alone is
    # ~200 s — a healthy backend cannot answer inside the probe window).
    # Probing now happens only AFTER a child fails, to distinguish a flaky
    # child from a wedged backend.
    wedged = False

    # BASELINE.json metrics FIRST (r02 post-mortem: a 363 s cold fused-LBM
    # compile in slot 2 starved ch3d_512/degeus/2a out of the artifact).
    # Order: 1a headline -> 512^3 north star -> degeus RVEs -> 2a -> then
    # the Pallas showcase children with whatever budget remains.  Children
    # gate their OPTIONAL variants on the inherited deadline, so each slot's
    # REQUIRED metric completes even from a cold compile cache.  With the
    # shipped pre-warmed compile cache (.jax_cache) every child compiles in
    # seconds and the whole suite fits in a few minutes; the timeouts below
    # are the cache-MISS worst case.
    # (key, child, attempts, timeout, est_required_s): the last field is
    # the estimated COLD cost of the child's required metric alone; the sum
    # over LATER BASELINE children is passed to each child as a budget
    # reserve so optional variants never starve a required measurement.
    children = [
        # compiles 1-2 whole-run programs (headline + optional fused
        # variant); the headline is emitted incrementally either way
        ("1a", "1a", 2, 900, 250),
        # attempts=2 (r03 post-mortem: single-shot at timeout 600 lost the
        # whole child to one 500 s-class cold compile; a second attempt
        # hits the just-written compile cache and finishes in seconds)
        ("degeus_rve_32", "degeus", 2, 900, 120),
        # 64x the reference RVE via the analytic-tangent CG operator —
        # BEFORE 2a: it is the cheaper BASELINE child, so a tight cold
        # budget completes it rather than dying inside 2a's longer compile
        ("degeus_rve_128", "degeus128", 2, 900, 200),
        # the reference's second headline deck (5 coupled fields; the
        # budget-gated tuned + fused variants exercise batch_fft+carry and
        # the multi-variable fused substep); its cold compile has been
        # measured anywhere from 73 to ~680 s on axon
        ("benchmark_2a", "2a", 2, 900, 400),
        # BASELINE config #2 (Swift-Hohenberg pattern formation) — r05
        # addition: a named BASELINE config had zero perf tracking for
        # four rounds
        ("sh_400", "sh", 2, 900, 250),
        # required 512^3 metric = ONE program + fft roofline; fused/carry/
        # pallas variants are budget-gated inside the child.  LAST of the
        # non-LBM BASELINE children (r04 reorder): its compile is the most
        # queue-volatile (533-900+ s observed) — cheap-certain children
        # first maximizes expected artifact coverage under a fixed budget
        ("ch3d_512", "ch3d_512", 1, 900, 300),
        # BASELINE config #5 (LBM stream-collide) — r05: reserve-protected
        # (nonzero est) ahead of the second-chance slots, so a cold-cache
        # run degrades earlier children to required-only rather than
        # starving LBM out of the artifact a fifth round running.  The
        # ests are deliberately TRIMMED below the ~250 s cold worst case:
        # warm runs land everything, cold runs still favor the children
        # above (VERDICT r04 item 1)
        ("lbm_mixed_128_pallas", "lbm_mixed", 1, 600, 120),
        ("lbm_thermal_rb_pallas", "lbm_thermal", 1, 600, 120),
    ]
    # showcases (not in the reserve: BASELINE metrics outrank them) —
    # second chances for the headline VARIANT numbers when the primary
    # slots' budget gates had to skip them behind slow required compiles.
    # These run as ONE shared-process batch first (r05: each fresh process
    # pays a 10-60 s backend attach on axon; eight isolated tail children
    # burn 100-500 s of budget on attaches alone), with isolated spawns
    # as the fallback for whatever the batch did not complete.
    tail_children = [
        ("1a_fused", "1a_fused", 1, 600, 0),
        ("ch3d_fused", "ch3d_fused", 1, 600, 0),
        ("2a_tuned", "2a_tuned", 1, 600, 0),
        ("sh_fused", "sh_fused", 1, 600, 0),
        ("lbm_channel3d_128_pallas", "lbm_pallas", 1, 600, 0),
        ("lbm_channel3d_128", "lbm", 1, 600, 0),
        ("lbm_porous_128_pallas", "lbm_porous", 1, 600, 0),
        ("lbm_thermal3d_128_pallas", "lbm_thermal3d", 1, 600, 0),
        ("ch3d_256", "ch3d_256", 1, 600, 0),
    ]
    reserves = []
    tail = 0.0
    for _, _, _, _, est in reversed(children):
        reserves.append(tail)
        tail += est
    reserves.reverse()

    def emit(key, sub):
        # incremental emission: the FULL accumulated result line goes to
        # BOTH stdout and stderr after every child, so even a hard parent
        # kill (rc=124 in the r03 driver run) leaves a complete parseable
        # JSON line wherever the driver captures output
        _absorb(result, key, sub)
        sys.stderr.write(f"bench done {key}: {json.dumps(sub)[:400]}\n")
        sys.stderr.write(json.dumps(result) + "\n")
        sys.stderr.flush()
        print(json.dumps(result), flush=True)

    for (key, child, attempts, timeout, _), reserve in zip(children, reserves):
        if wedged:
            sub = {"skipped": "backend wedged"}
        elif deadline - time.time() < 120:
            sub = {"skipped": "budget exhausted"}
        else:
            os.environ["MARLIN_TPU_BENCH_RESERVE"] = str(reserve)
            sub = _spawn(child, deadline, attempts=attempts, timeout=timeout)
            if ("error" in sub and "partial" not in sub
                    and "timeout" not in str(sub.get("error", ""))
                    and deadline - time.time() > 150):
                # distinguish a flaky child from a wedged backend before
                # spending further timeouts.  A child TIMEOUT is excluded:
                # it proves the backend is reachable-but-slow (usually a
                # backed-up remote compile queue), and the probe would only
                # burn 90-180 s squeezing the remaining children (r04 run:
                # the post-ch3d probe cost degeus128 its slot)
                wedged = not _probe(deadline)
                if wedged:
                    sub = dict(sub, skipped="backend wedged")
        emit(key, sub)

    # shared-process batch over the tail, then isolated fallbacks
    pairs = [(key, child) for key, child, _, _, _ in tail_children
             if not _second_chance_landed(result, key)]
    batch_got = {}
    if pairs and not wedged and deadline - time.time() >= 120:
        os.environ["MARLIN_TPU_BENCH_RESERVE"] = "0"
        batch_got = _batch_spawn(pairs, deadline)
    for key, child, attempts, timeout, _ in tail_children:
        sub = batch_got.get(key)
        if sub is not None and "partial" not in sub:
            pass  # full batch result
        elif wedged:
            sub = sub or {"skipped": "backend wedged"}
        elif _second_chance_landed(result, key):
            sub = {"skipped": "already landed in the primary slot"}
        elif deadline - time.time() < 120:
            sub = sub or {"skipped": "budget exhausted"}
        else:
            # missing OR only a partial salvage from a killed batch child:
            # retry isolated while budget remains (r05 review — a partial
            # must not foreclose the full re-measurement), keeping the
            # salvage if the retry fails too
            os.environ["MARLIN_TPU_BENCH_RESERVE"] = "0"
            retry = _spawn(child, deadline, attempts=attempts,
                           timeout=timeout)
            if sub is None or "error" not in retry:
                sub = retry
        emit(key, sub)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
