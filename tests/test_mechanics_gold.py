"""FFT micromechanics gold parity (reference test/tests/mechanics/tests).

The deGeus-style FFTMechanics Newton+CG solve driven by ForwardEulerSolver
with buffer forwarding (Fnew -> F) must reproduce the reference's
mech.h5/mech3d.h5 golds (HDF5Diff abs_tol 1e-13 in the reference spec)."""

from .gold import h5_diff, run_ref_deck


def test_mechanics_2d():
    _, tmp = run_ref_deck("test/tests/mechanics/mech.i")
    h5_diff("test/tests/mechanics/gold/mech.h5", f"{tmp}/mech.h5")


def test_mechanics_3d():
    _, tmp = run_ref_deck("test/tests/mechanics/mech3d.i")
    h5_diff("test/tests/mechanics/gold/mech3d.h5", f"{tmp}/mech3d.h5")


def test_analytic_tangent_parity():
    """The analytic K4:dF contraction (the 128³-enabling fast path,
    VERDICT r01 item 4) agrees with the materialized rank-4 assembly on
    the same deck — forced on vs the small-grid default off."""
    import numpy as np

    _, tmp_ref = run_ref_deck("test/tests/mechanics/mech3d.i")
    _, tmp_ana = run_ref_deck(
        "test/tests/mechanics/mech3d.i",
        ["TensorComputes/Solve/root/mech/analytic_tangent=true"],
    )
    import h5py

    with h5py.File(f"{tmp_ref}/mech3d.h5") as a, \
            h5py.File(f"{tmp_ana}/mech3d.h5") as b:
        for k in a:
            ga, gb = a[k][...], b[k][...]
            scale = max(np.abs(ga).max(), 1.0)
            assert np.abs(ga - gb).max() < 1e-6 * scale, k


def test_analytic_tangent_contract_matches_k4():
    """Pin the algebra: tangent_contract == trans2(ddot42(K4, trans2(dF)))
    on random fields."""
    import jax.numpy as jnp
    import numpy as np

    from marlin_tpu.computes import mechanics as M

    rng = np.random.RandomState(0)
    shp = (3, 4, 5)
    F = jnp.asarray(np.eye(3) + 0.1 * rng.randn(*shp, 3, 3))
    dF = jnp.asarray(rng.randn(*shp, 3, 3))
    K = jnp.asarray(1.0 + rng.rand(*shp))
    mu = jnp.asarray(0.5 + rng.rand(*shp))
    ti, tI4, tI4rt, tI4s, tII = M._identity_tensors(3, F.dtype)
    Km4 = K[..., None, None, None, None]
    mu4 = mu[..., None, None, None, None]
    C4 = Km4 * tII + 2.0 * mu4 * (tI4s - tII / 3.0)
    S = M.ddot42(C4, 0.5 * (M.dot22(M.trans2(F), F) - ti))
    K4 = M.dot24(S, tI4) + M.ddot44(
        M.ddot44(tI4rt, M.dot42(M.dot24(F, C4), M.trans2(F))), tI4rt
    )
    ref = M.trans2(M.ddot42(K4, M.trans2(dF)))

    obj = M.HyperElasticIsotropic.__new__(M.HyperElasticIsotropic)
    obj.F, obj.K, obj.mu = "F", "K", "mu"

    class Dom:
        dim = 3

    obj.domain = Dom()
    got = obj.tangent_contract({"F": F, "K": K, "mu": mu}, dF)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_gate_requires_methods_actually_called(monkeypatch):
    """analytic_tangent=auto must fall back to the materialized tangent
    when the constitutive model lacks the tangent_fields/tangent_apply
    pair apply() actually calls (a model with only the older
    tangent_contract interface must not enable the fast path and then
    AttributeError inside the Newton trace)."""
    from marlin_tpu import hit
    from marlin_tpu.computes import mechanics as M
    from marlin_tpu.problem import TensorProblem

    import os

    from .gold import REF

    deck = os.path.join(REF, "test/tests/mechanics/mech3d.i")

    def build():
        root = hit.load(deck, [
            "TensorComputes/Solve/root/mech/analytic_tangent=true"])
        p = TensorProblem(root)
        p.init_state()
        def find(cs):
            for c in cs:
                if isinstance(c, M.FFTMechanics):
                    return c
                got = find(getattr(c, "members", []))
                if got is not None:
                    return got
            return None

        mech = find(p.solve_computes)
        assert mech is not None, "no FFTMechanics compute in deck"
        return mech

    assert build().analytic_tangent is True
    monkeypatch.delattr(M.HyperElasticIsotropic, "tangent_fields")
    assert build().analytic_tangent is False


def test_newton_nonconvergence_raises():
    """Exhausting nl_max_its must surface as an error (reference
    FFTMechanics.C paramError), not silently write unconverged fields."""
    import pytest

    from marlin_tpu import hit as hit_mod
    from marlin_tpu.problem import TensorProblem

    from .gold import REF

    root = hit_mod.load(
        REF + "/test/tests/mechanics/mech.i",
        ["TensorComputes/Solve/root/mech/nl_max_its=1",
         "TensorComputes/Solve/root/mech/nl_rel_tol=1e-30",
         "TensorComputes/Solve/root/mech/nl_abs_tol=1e-30"])
    p = TensorProblem(root)
    s = p.init_state()
    # the flag rides the state pytree to the per-step host sync (a device
    # callback would need host send/recv — unimplemented on the axon TPU
    # backend, where this check first shipped broken)
    with pytest.raises(RuntimeError, match="[Nn]onlinear iterations"):
        p.step_with_pps(s, 0.0, 0.1, 0.0, first_step=True)
