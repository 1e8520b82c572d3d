import os

# Force a deterministic 8-device CPU mesh for all tests (the analog of the
# reference's `device_names='cpu cpu cpu'` MPI-on-localhost testing strategy;
# see reference test/tests/gradient/tests:11-30).
#
# NOTE: this image pre-imports jax and registers the remote-TPU ("axon")
# backend in sitecustomize, so mutating JAX_PLATFORMS here is too late —
# use jax.config.update instead, which takes effect because no backend has
# been initialized yet at conftest time.
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
