"""Multi-host launch path (docs/multihost.md; SURVEY §5.8's last clause).

True multi-host needs multiple machines; here the jax.distributed
initialization path is exercised in its single-process degenerate form in
a SUBPROCESS (initialize() is global, irreversible state — it must not
leak into the test session), proving the CLI env-var wiring and that a
mesh built from the post-init jax.devices() runs a sharded deck."""

import os
import socket
import subprocess
import sys

SCRIPT = r"""
import os
import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

# the env-var wiring main.py uses (docs/multihost.md)
jax.distributed.initialize(
    coordinator_address=os.environ["MARLIN_TPU_COORDINATOR"],
    num_processes=1, process_id=0)
assert jax.process_count() == 1

from marlin_tpu import hit, parallel
from marlin_tpu.domain import ParallelMode
from marlin_tpu.executioner import run_deck

deck = '''
[Domain]
  dim = 3
  nx = 8
  ny = 8
  nz = 8
  xmax = 8
  ymax = 8
  zmax = 8
  parallel_mode = FFT_SLAB
[]
[TensorComputes]
  [Initialize]
    [c]
      type = ParsedCompute
      buffer = c
      extra_symbols = true
      expression = 'sin(2*pi*x/8)*cos(2*pi*y/8)'
    []
  []
  [Solve]
    [decay]
      type = ParsedCompute
      buffer = c
      expression = 'c*0.5'
      inputs = c
    []
  []
[]
[Problem]
  type = TensorProblem
[]
[Postprocessors]
  [avg]
    type = TensorAveragePostprocessor
    buffer = c
  []
[]
[Executioner]
  type = Transient
  num_steps = 2
  [TimeStepper]
    type = ConstantDT
    dt = 1.0
  []
[]
'''
root = hit.parse(deck)
hit.expand_braces(root)
mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices())
tr = run_deck(root, output_dir=os.environ["OUT"], mesh=mesh)
print("MULTIHOST_OK", tr.step_count)
"""


def test_distributed_initialize_single_process(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()
    env = dict(os.environ, MARLIN_TPU_COORDINATOR=addr, OUT=str(tmp_path),
               JAX_PLATFORMS="")
    p = subprocess.run([sys.executable, "-c", SCRIPT], capture_output=True,
                       text=True, env=env, timeout=300,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    assert "MULTIHOST_OK 2" in p.stdout
