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


def test_resume_bit_exact_sharded(tmp_path):
    """Checkpoint/resume with a distributed (FFT_SLAB) mesh: sharded
    device arrays gather into the .npz and the resumed run reproduces the
    uninterrupted sharded run bit-exactly."""
    import jax

    from marlin_tpu import parallel
    from marlin_tpu.domain import ParallelMode

    mesh = parallel.make_mesh(ParallelMode.FFT_SLAB, jax.devices()[:4])

    def make(tmp, num_steps):
        root = hit.load(
            f"{REF}/test/tests/cahnhilliard/cahnhilliard.i",
            [f"Executioner/num_steps={num_steps}",
             "Domain/parallel_mode=FFT_SLAB"],
        )
        p = TensorProblem(root, mesh=mesh)
        return Transient(
            p,
            exec_node=root.children.get("Executioner"),
            outputs_node=root.children.get("Outputs"),
            file_base="cks",
            output_dir=str(tmp),
        )

    full = make(tmp_path / "full", 6)
    full.run()
    part = make(tmp_path / "part", 3)
    part.run()
    part.save_checkpoint()
    res = make(tmp_path / "part", 6)
    res.init()
    res.recover(part.checkpoint_path)
    res.run()
    np.testing.assert_array_equal(
        np.asarray(res.state["buffers"]["c"]),
        np.asarray(full.state["buffers"]["c"]),
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


def test_recover_without_init_runs(tmp_path):
    """recover() -> run() must work WITHOUT an init() call (regression:
    _vpp_counter was only set in init(), so this path crashed with
    AttributeError on the first step)."""
    part = _make(tmp_path / "part", 5)
    part.run()
    part.save_checkpoint()

    res = _make(tmp_path / "part", 10)
    res.recover(part.checkpoint_path)  # no init()
    res.run()
    assert res.step_count == 10

    full = _make(tmp_path / "full", 10)
    full.run()
    np.testing.assert_array_equal(
        np.asarray(res.state["buffers"]["c"]),
        np.asarray(full.state["buffers"]["c"]))


def test_resume_history_free_deck(tmp_path):
    """A deck with NO old-state history (empty state['old']) must survive
    the checkpoint round-trip (regression: _flatten dropped empty dicts
    and resume crashed with KeyError: 'old')."""
    from marlin_tpu import checkpoint

    part = _make(tmp_path / "p", 3)
    part.init()
    # simulate a history-free solver state
    part.state = {**part.state, "old": {}}
    checkpoint.save(str(tmp_path / "ck.npz"), part.state, 1.0, 3, 0.1)
    state, meta = checkpoint.load(str(tmp_path / "ck.npz"))
    assert "old" in state and state["old"] == {}
    assert meta["step"] == 3
