"""Benchmark driver: reference benchmark 1a (2D spinodal decomposition).

Reference baseline: 45 s wall / 277 MB on an NVIDIA L4 at 99% util
(reference: benchmarks/01_spinodal_decomposition/README.md:1-7) for the
200x200 Cahn-Hilliard deck with spectral_solve_substeps=1000 and adaptive dt
to t~=1e4.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
vs_baseline > 1 means faster than the reference's published number.
"""

import json
import os
import sys
import time

BASELINE_SECONDS = 45.0  # reference wall time on NVIDIA L4

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    # NOTE: do not enable the persistent compilation cache here — the axon
    # TPU backend cannot deserialize cached executables (UNIMPLEMENTED on
    # cache hits); every program must compile fresh.

    # run on whatever accelerator the session provides (TPU via axon when
    # available, else CPU); single precision like the reference's GPU runs
    platform = jax.default_backend()

    from marlin_tpu import hit
    from marlin_tpu.executioner import Transient
    from marlin_tpu.problem import TensorProblem

    deck = "/root/reference/benchmarks/01_spinodal_decomposition/1a.i"
    if not os.path.exists(deck):
        deck = os.path.join(os.path.dirname(__file__), "decks", "1a.i")
    root = hit.load(deck, ["Executioner/end_time=10500"])

    problem = TensorProblem(root)
    tr = Transient(
        problem,
        exec_node=root.children.get("Executioner"),
        outputs_node=None,  # timing run: no file output
        user_objects_node=root.children.get("UserObjects"),
        file_base="bench1a",
        output_dir="/tmp",
    )
    tr.init()
    # warm the compiled step (compile time excluded, like the reference's
    # warm-start GPU timing)
    state0 = tr.state
    s = problem.step(state0, 0.0, 1.0, 0.0, first_step=True)
    jax.block_until_ready(s["buffers"]["c"])
    s = problem.step(s, 1.0, 1.1, 1.0, first_step=False)
    jax.block_until_ready(s["buffers"]["c"])
    tr.state = state0

    t0 = time.time()
    tr.run()
    jax.block_until_ready(tr.state["buffers"]["c"])
    wall = time.time() - t0

    result = {
        "metric": f"benchmark_1a_spinodal_walltime_{platform}",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / wall, 3),
        "steps": tr.step_count,
        "t_final": round(tr.time, 1),
        "F_final": round(tr.pp_values.get("F", 0.0), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
