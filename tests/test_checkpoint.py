"""Checkpoint/resume: a resumed run must reproduce the uninterrupted run
bit-exactly (superset of the reference, which never checkpoints tensor
buffers — SURVEY §5.4)."""

import numpy as np

from marlin_tpu import hit
from marlin_tpu.executioner import Transient
from marlin_tpu.problem import TensorProblem

REF = "/root/reference"


def _make(tmp, num_steps):
    root = hit.load(
        f"{REF}/test/tests/cahnhilliard/cahnhilliard.i",
        [f"Executioner/num_steps={num_steps}"],
    )
    p = TensorProblem(root)
    return Transient(
        p,
        exec_node=root.children.get("Executioner"),
        outputs_node=root.children.get("Outputs"),
        file_base="ck",
        output_dir=str(tmp),
    )


def test_resume_bit_exact(tmp_path):
    # full 10-step run
    full = _make(tmp_path / "full", 10)
    full.run()

    # 5 steps, checkpoint, resume to 10
    part = _make(tmp_path / "part", 5)
    part.run()
    part.save_checkpoint()

    res = _make(tmp_path / "part", 10)
    res.init()
    res.recover(part.checkpoint_path)
    res.run()

    assert res.step_count == 10
    np.testing.assert_array_equal(
        np.asarray(res.state["buffers"]["c"]), np.asarray(full.state["buffers"]["c"])
    )
