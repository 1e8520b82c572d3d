import os

import pytest

# Two lanes (the analog of the reference's per-device test matrix,
# `compute_devices = 'cpu cuda mps'` in test/tests/cahnhilliard/tests:10):
#
#  1. default: a deterministic 8-device CPU mesh in float64 — full gold
#     parity at 1e-10..1e-13 tolerances (the analog of the reference's
#     `device_names='cpu cpu cpu'` MPI-on-localhost strategy; see reference
#     test/tests/gradient/tests:11-30).
#  2. MARLIN_TPU_TESTS=1: run on the session's REAL device (the axon/TPU
#     backend) in its native float32 — only tests marked `tpu` run
#     (`pytest -m tpu`), comparing the same golds at f32 tolerances.
#
# NOTE: this image pre-imports jax and registers the remote-TPU ("axon")
# backend in sitecustomize, so mutating JAX_PLATFORMS here is too late —
# use jax.config.update instead, which takes effect because no backend has
# been initialized yet at conftest time.
TPU_LANE = bool(os.environ.get("MARLIN_TPU_TESTS"))

if TPU_LANE:
    # Persistent XLA compile cache, shared with bench.py (r04: the axon
    # backend deserializes cached executables correctly now — measured
    # 38.6 s -> 3.8 s across processes on the 32^3 Newton+CG program).  The
    # repo ships the cache pre-warmed, so the lane's "cold ~1 h" compile
    # wall collapses to the warm ~6 min.  Opt out/redirect with
    # MARLIN_TPU_COMPILE_CACHE (empty or "0" disables).
    _cache = os.environ.get(
        "MARLIN_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    if _cache and _cache != "0":
        # jax.config, NOT env vars: this jax version's
        # optional_string_state(default=None) silently ignores
        # JAX_COMPILATION_CACHE_DIR (measured r04 — the cache never
        # initialized through the env route)
        import jax

        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

    # Gold-file parity requires float64 (the reference defaults to double
    # precision on CPU/CUDA, reference src/utils/MarlinUtils.C:38-42).
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: real-device (TPU) gold regression lane; run with "
        "`MARLIN_TPU_TESTS=1 python -m pytest tests/ -m tpu`",
    )
    if TPU_LANE:
        # the axon backend sometimes SIGABRTs its compile helper on the
        # fused step+pp program; step_with_pps auto-falls-back, but the
        # crashed helper can poison the process — the lane runs split
        # programs outright (the fallback itself is covered by
        # tests/test_review_r03.py on the CPU lane)
        from marlin_tpu.problem import TensorProblem

        TensorProblem.fuse_pps = False


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not TPU_LANE:
            item.add_marker(pytest.mark.skip(
                reason="real-device lane disabled (set MARLIN_TPU_TESTS=1 "
                       "and select with -m tpu)"))
        elif "tpu" not in item.keywords and TPU_LANE:
            item.add_marker(pytest.mark.skip(
                reason="CPU-lane test skipped under MARLIN_TPU_TESTS=1 "
                       "(drop the env var for the full f64 suite)"))
