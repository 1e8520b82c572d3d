"""aux.sample_at — arbitrary-point sampling of grid fields (the MOOSE
MultiApp / ProjectTensorAux coupling-surface equivalent, SURVEY §7 stage 8)."""

import numpy as np
import pytest

from marlin_tpu.aux import AuxError, sample_at
from marlin_tpu.domain import Domain, Precision


def _dom(dim, n):
    return Domain(dim, (n,) * dim, maxs=(1.0,) * dim,
                  floating_precision=Precision.DOUBLE)


def test_exact_at_cell_centers_2d():
    dom = _dom(2, 16)
    x = np.asarray(dom.axis(0))
    y = np.asarray(dom.axis(1))
    f = np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)
    xs, ys = np.meshgrid(x.ravel(), y.ravel(), indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    np.testing.assert_allclose(sample_at(dom, f, pts), f.ravel(), atol=1e-14)


def test_linear_field_reproduced_exactly():
    """Multilinear interpolation is exact for multilinear fields (within a
    periodic cell away from the wrap seam)."""
    dom = _dom(2, 32)
    x = np.asarray(dom.axis(0))
    y = np.asarray(dom.axis(1))
    f = 2.0 * x + 3.0 * y  # broadcasts to (32, 32)
    f = np.broadcast_to(f, (32, 32))
    rng = np.random.RandomState(3)
    pts = 0.1 + 0.8 * rng.rand(200, 2)
    np.testing.assert_allclose(
        sample_at(dom, f, pts), 2.0 * pts[:, 0] + 3.0 * pts[:, 1],
        atol=1e-12)


def test_smooth_field_convergence_3d():
    """Interpolation error of a smooth field is O(h^2)."""
    errs = []
    for n in (8, 16, 32):
        dom = _dom(3, n)
        ax = [np.asarray(dom.axis(d)) for d in range(3)]
        f = (np.sin(2 * np.pi * ax[0]) * np.sin(2 * np.pi * ax[1])
             * np.sin(2 * np.pi * ax[2]))
        rng = np.random.RandomState(5)
        pts = rng.rand(500, 3)
        exact = (np.sin(2 * np.pi * pts[:, 0]) * np.sin(2 * np.pi * pts[:, 1])
                 * np.sin(2 * np.pi * pts[:, 2]))
        errs.append(np.abs(sample_at(dom, f, pts) - exact).max())
    assert errs[1] < errs[0] / 2.5
    assert errs[2] < errs[1] / 2.5


def test_periodic_wrap_and_vector_values():
    dom = _dom(1, 8)
    f = np.stack([np.arange(8.0), np.arange(8.0) * 10], -1)  # (8, 2) vector
    # x just left of 0 wraps to the last cell; halfway between centers 7, 0
    out = sample_at(dom, f, [[0.0]])
    np.testing.assert_allclose(out[0], [3.5, 35.0])
    out = sample_at(dom, f, [[1.0]])  # x = 1 == 0 periodically
    np.testing.assert_allclose(out[0], [3.5, 35.0])


def test_shape_errors():
    dom = _dom(2, 8)
    with pytest.raises(AuxError, match="points must be"):
        sample_at(dom, np.zeros((8, 8)), np.zeros((3, 3)))
    with pytest.raises(AuxError, match="grid shape"):
        sample_at(dom, np.zeros((4, 4)), np.zeros((3, 2)))
