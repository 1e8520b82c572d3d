"""Domain: grid geometry, real/reciprocal axes, FFT dispatch, device mesh.

TPU-native re-design of the reference DomainAction
(reference: src/actions/DomainAction.C — axes :226-338, fft/ifft :833-1078,
partitioners :340-742).  Key semantic choices preserved:

- real-space axes are cell-centered: linspace(min+h/2, max-h/2, n)
  (reference :246-252)
- reciprocal axes are ``(r)fftfreq(n, h) * 2*pi`` with an rfft (half-spectrum)
  axis along the LAST dimension in serial mode (reference :268-291); the
  Nyquist frequency is NOT zeroed (reference :289-291 is commented out)
- axes are broadcast-aligned: axis d has extent n_d along dim d and singleton
  elsewhere (reference ``align``, :1406-1434)
- ``fft`` is an unnormalized forward real FFT; ``ifft`` carries the 1/N
  (torch/numpy "backward" norm — matches jnp.fft defaults)

Parallel modes map the reference's MPI decompositions onto a
``jax.sharding.Mesh``: FFT_SLAB/FFT_PENCIL shard the grid and perform the
transform with all_to_all transposes under ``shard_map``; REAL_SPACE shards
with halo exchange via ``ppermute`` (see marlin_tpu.parallel).
"""

from __future__ import annotations

import math
import os
from enum import Enum
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ParallelMode(Enum):
    NONE = "NONE"
    REAL_SPACE = "REAL_SPACE"
    FFT_SLAB = "FFT_SLAB"
    FFT_PENCIL = "FFT_PENCIL"


class Precision(Enum):
    DEVICE_DEFAULT = "DEVICE_DEFAULT"
    SINGLE = "SINGLE"
    DOUBLE = "DOUBLE"


class FFTBackend(Enum):
    DEFAULT = "DEFAULT"  # jnp.fft (XLA)
    PALLAS = "PALLAS"    # unordered Pallas kernels (marlin_tpu.pallas_fft)


def _default_float_dtype(precision: Precision):
    """Mirror the reference's device-default precision rule
    (reference: src/utils/MarlinUtils.C:38-42 — double where supported)."""
    platform = jax.default_backend()
    x64 = jax.config.read("jax_enable_x64")
    if precision == Precision.SINGLE:
        return jnp.float32
    if precision == Precision.DOUBLE:
        if not x64:
            raise RuntimeError(
                "DOUBLE precision requires jax_enable_x64 "
                "(set JAX_ENABLE_X64=1 or jax.config.update('jax_enable_x64', True))"
            )
        return jnp.float64
    # DEVICE_DEFAULT: double where cheap (CPU), single on TPU/GPU
    if platform == "cpu" and x64:
        return jnp.float64
    return jnp.float32


_COMPLEX_FOR = {jnp.float32: jnp.complex64, jnp.float64: jnp.complex128}


def batched_transform(op, pairs):
    """{key: op(t)} for ``pairs = [(key, t), ...]`` where same-(shape,
    complexness) fields are stacked on a trailing value axis and transformed
    as ONE call (the Domain transforms value axes natively).  The single
    batching algorithm behind ``[Problem] batch_fft = true`` — used by both
    the compute-graph side (computes.core.BatchedFFT) and the solver side
    (solvers.base.TensorSolver._ifft_all); singletons fall through to the
    plain per-field path, so mixed-shape/-dtype runs stay correct."""
    groups = {}
    for k, t in pairs:
        gkey = (tuple(t.shape), bool(jnp.iscomplexobj(t)))
        groups.setdefault(gkey, []).append((k, t))
    out = {}
    for items in groups.values():
        if len(items) == 1:
            k, t = items[0]
            out[k] = op(t)
        else:
            res = op(jnp.stack([t for _, t in items], axis=-1))
            for i, (k, _) in enumerate(items):
                out[k] = res[..., i]
    return out


class Domain:
    """Uniform periodic grid with spectral transforms.

    Parameters mirror the reference ``[Domain]`` block
    (reference: src/actions/DomainAction.C:29-92).
    """

    def __init__(
        self,
        dim: int,
        n: Sequence[int],
        mins: Sequence[float] = (0.0, 0.0, 0.0),
        maxs: Sequence[float] = (1.0, 1.0, 1.0),
        parallel_mode: ParallelMode = ParallelMode.NONE,
        floating_precision: Precision = Precision.DEVICE_DEFAULT,
        mesh: Optional[jax.sharding.Mesh] = None,
        periodic: Tuple[bool, bool, bool] = (True, True, True),
        fft_backend: FFTBackend = FFTBackend.DEFAULT,
        debug: bool = False,
    ):
        if dim not in (1, 2, 3):
            raise ValueError(f"Unsupported dimension {dim}")
        self.dim = dim
        self.n_global = tuple(int(x) for x in n[:dim])
        self.mins = tuple(float(x) for x in mins[:dim])
        self.maxs = tuple(float(x) for x in maxs[:dim])
        self.parallel_mode = parallel_mode
        if parallel_mode == ParallelMode.FFT_PENCIL and dim != 3:
            # reference DomainAction.C:572 (the 2-D decomposition of a 2-D
            # grid is FFT_SLAB); without this, _use_rfft would build a
            # half-spectrum x axis that fft() never produces in 2-D
            raise ValueError("Dimension must be 3 for pencil decomposition.")
        self.periodic = periodic
        self.mesh = mesh
        self.fft_backend = fft_backend
        self.debug = debug  # reference Domain/debug=true introspection
        if fft_backend == FFTBackend.PALLAS:
            from . import pallas_fft

            if parallel_mode not in (ParallelMode.NONE, ParallelMode.FFT_SLAB) \
                    or (parallel_mode == ParallelMode.FFT_SLAB and dim != 3):
                raise ValueError(
                    "[Domain] fft_backend = PALLAS supports serial mode and "
                    "3-D FFT_SLAB (z and x kernels run per-shard, one planar "
                    "all_to_all, y kernel after the transpose); use the "
                    "DEFAULT backend for pencil/2-D-slab decompositions"
                )
            bad = [x for x in self.n_global if not pallas_fft.supported(x)]
            if bad:
                raise ValueError(
                    f"[Domain] fft_backend = PALLAS requires every grid "
                    f"extent to factor as {pallas_fft.SUPPORTED_RULE}; "
                    f"got {bad}"
                )
            # per-extent support is necessary but not sufficient: the
            # mid-axis kernels must also tile the transverse products
            # (200³ passes the extent check but 200×200=40000 lanes
            # can't block) — reject at build time, not mid-run.  FFT_SLAB
            # checks the PER-SHARD kernel shapes; without a mesh a slab
            # deck runs the whole-grid kernels, so the serial check
            # applies there too.
            if parallel_mode == ParallelMode.FFT_SLAB and mesh is not None:
                p = int(np.prod(mesh.devices.shape))
                reason = pallas_fft.slab_grid_unsupported_reason(
                    self.n_global, p)
            else:
                reason = pallas_fft.grid_unsupported_reason(self.n_global)
            if reason:
                raise ValueError(
                    f"[Domain] fft_backend = PALLAS cannot tile this "
                    f"grid: {reason}"
                )
            if floating_precision == Precision.DOUBLE:
                raise ValueError(
                    "[Domain] fft_backend = PALLAS is single-precision "
                    "(MXU f32 matmuls); use floating_precision = SINGLE "
                    "or the DEFAULT backend for f64"
                )

        for d in range(dim):
            if self.maxs[d] <= self.mins[d]:
                raise ValueError(
                    "Max coordinate must be larger than the min coordinate "
                    "in every dimension"
                )

        self.dtype = _default_float_dtype(floating_precision)
        self.cdtype = _COMPLEX_FOR[self.dtype]

        # grid spacing & volume (reference :240-254)
        self.grid_spacing = tuple(
            (self.maxs[d] - self.mins[d]) / self.n_global[d] for d in range(dim)
        )
        self.volume_global = math.prod(
            self.maxs[d] - self.mins[d] for d in range(dim)
        )
        self.n_cells_global = math.prod(self.n_global)

        self._build_axes()
        self._k_square = None
        self._x_grid = None
        self._k_grid = None

        if self.mesh is not None:
            from .parallel import validate_mesh

            validate_mesh(self)

    # -- axes -------------------------------------------------------------
    def _use_rfft(self, d: int) -> bool:
        """Which axis carries the half-spectrum (reference :268-284).

        Serial mode: rfft on the last axis.  FFT_SLAB on 3-D grids: rfft on
        the last axis too — z is local in BOTH the real (Y-sharded) and
        reciprocal (X-sharded) slab layouts, so the odd half extent is never
        split by the all_to_all and the transpose traffic halves with none
        of the reference's remainder bookkeeping (DomainAction.h:247-280).
        FFT_SLAB on 2-D grids stays full complex: both axes participate in
        the transpose (x is split, y is concatenated), so a half axis would
        need uneven tiles for ~half the traffic of an already-small problem.
        FFT_PENCIL: rfft on the x axis like the reference
        (DomainAction.C:279-284), with the odd half extent zero-padded to
        the p1 tile multiple instead of remainder-partitioned (see
        parallel.fft_pencil).  REAL_SPACE has no spectral axes."""
        if self.parallel_mode == ParallelMode.NONE:
            return d == self.dim - 1
        if self.parallel_mode == ParallelMode.FFT_SLAB:
            # nz > 2 keeps the half extent nz/2+1 distinct from nz, so the
            # inverse can tell half- from full-spectrum arrays by shape
            return self.dim == 3 and d == 2 and self.n_global[2] > 2
        if self.parallel_mode == ParallelMode.FFT_PENCIL:
            return d == 0 and self.n_global[0] > 2
        return False

    def align(self, t: jnp.ndarray, d: int) -> jnp.ndarray:
        """Broadcast-align a 1-D axis tensor along dimension d
        (reference align :1406-1434)."""
        shape = [1] * self.dim
        shape[d] = t.shape[0]
        return t.reshape(shape)

    def _build_axes(self):
        dim = self.dim
        npdtype = np.float64 if self.dtype == jnp.float64 else np.float32
        self.axes = []  # real-space, aligned
        self.reciprocal_axes = []  # aligned
        self._np_axes = []  # unaligned 1-D numpy (for trace-safe cache builds)
        self._np_raxes = []
        self.n_reciprocal_global = []
        self.max_k = []
        # FFT_PENCIL: the x half-spectrum extent (n/2+1, odd) is zero-padded
        # to a multiple of the p1 mesh axis so the all_to_all stages split
        # evenly (TPU collectives need equal tiles; the reference instead
        # remainder-partitions, DomainAction.h:247-280).  Pad spectrum rows
        # are zero after every forward transform and are sliced off before
        # the inverse, so they never influence real-space physics.
        self.reciprocal_pad = 0
        for d in range(dim):
            h = self.grid_spacing[d]
            n = self.n_global[d]
            ax = np.linspace(
                self.mins[d] + h / 2.0, self.maxs[d] - h / 2.0, n
            ).astype(npdtype)
            self._np_axes.append(ax)
            # axes are kept as numpy: they enter jit traces as embedded
            # constants without a device->host round-trip
            self.axes.append(self._np_align_new(ax, d))
            if self.parallel_mode == ParallelMode.REAL_SPACE:
                freq = np.zeros((0,))
            elif self.fft_backend == FFTBackend.PALLAS:
                # full complex spectrum in the kernels' permuted (t-major)
                # storage order — every pointwise k-space operator built from
                # these axes is automatically consistent (pallas_fft.py)
                from .pallas_fft import permuted_freqs

                freq = permuted_freqs(n, d=h)
            elif self._use_rfft(d):
                freq = np.fft.rfftfreq(n, d=h)
                if (self.parallel_mode == ParallelMode.FFT_PENCIL
                        and d == 0 and self.mesh is not None):
                    p1 = dict(zip(self.mesh.axis_names,
                                  self.mesh.devices.shape)).get("p1", 1)
                    pad = (-len(freq)) % p1
                    if len(freq) + pad == n:
                        # tiny-grid collision: a padded half spectrum the
                        # same length as the full one would make the
                        # inverse's shape-based half/full detection
                        # ambiguous — pad one more tile of zeros
                        pad += p1
                    if pad:
                        self.reciprocal_pad = pad
                        freq = np.concatenate([freq, np.zeros(pad)])
            else:
                freq = np.fft.fftfreq(n, d=h)
            k = (freq * 2.0 * math.pi).astype(npdtype)
            self._np_raxes.append(k)
            self.reciprocal_axes.append(self._np_align_new(k, d))
            self.n_reciprocal_global.append(k.shape[0])
            self.max_k.append(math.pi / h)

    def _np_align(self, a: np.ndarray, d: int) -> np.ndarray:
        shape = [1] * self.dim
        shape[d] = a.shape[0]
        return a.reshape(shape)

    def _np_align_new(self, a: np.ndarray, d: int) -> np.ndarray:
        shape = [1] * self.dim
        shape[d] = a.shape[0]
        return np.ascontiguousarray(a.reshape(shape))

    # -- shapes -----------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        """Global real-space shape (serial == local; see parallel module)."""
        return self.n_global

    @property
    def reciprocal_shape(self) -> Tuple[int, ...]:
        return tuple(self.n_reciprocal_global)

    def value_shape(self, extra_dims: Sequence[int] = ()) -> Tuple[int, ...]:
        return self.shape + tuple(extra_dims)

    def reciprocal_value_shape(self, extra_dims: Sequence[int] = ()) -> Tuple[int, ...]:
        return self.reciprocal_shape + tuple(extra_dims)

    # -- derived grids ----------------------------------------------------
    @property
    def k_square(self) -> jnp.ndarray:
        """|k|² over the reciprocal grid (reference :1503-1510).

        Deliberately NOT materialized: the sum of dim-aligned 1-D axis
        constants broadcasts to the full grid inside XLA.  A precomputed
        full-shape numpy array would be baked into the HLO as a constant —
        at 512³ that is a ~270 MB compile payload, which overflows the
        axon remote-compile request (HTTP 413) and bloats every program.
        Nothing is cached, so no tracers can leak between traces."""
        ks = jnp.asarray(self._np_align(self._np_raxes[0] ** 2, 0))
        for d in range(1, self.dim):
            ks = ks + jnp.asarray(self._np_align(self._np_raxes[d] ** 2, d))
        return ks

    def np_k_square(self) -> np.ndarray:
        """|k|² as a full-grid numpy array, for HOST-side consumers only
        (e.g. the FFTMechanics Green-function build).  Traced code must use
        `k_square`, which stays lazy inside the program."""
        ks = self._np_align(self._np_raxes[0] ** 2, 0)
        for d in range(1, self.dim):
            ks = ks + self._np_align(self._np_raxes[d] ** 2, d)
        return np.broadcast_to(ks, self.reciprocal_shape)

    @property
    def x_grid(self) -> jnp.ndarray:
        """Stacked coordinate grid, shape (*shape, dim) for dim>1
        (reference :1457-1477)."""
        if self._x_grid is None:
            if self.dim == 1:
                self._x_grid = self._np_axes[0]
            else:
                self._x_grid = np.stack(
                    [
                        np.broadcast_to(self._np_align(a, d), self.shape)
                        for d, a in enumerate(self._np_axes)
                    ],
                    axis=-1,
                )
        return self._x_grid

    @property
    def k_grid(self) -> jnp.ndarray:
        if self._k_grid is None:
            if self.dim == 1:
                self._k_grid = self._np_raxes[0]
            else:
                self._k_grid = np.stack(
                    [
                        np.broadcast_to(self._np_align(a, d), self.reciprocal_shape)
                        for d, a in enumerate(self._np_raxes)
                    ],
                    axis=-1,
                )
        return self._k_grid

    def axis(self, d: int) -> jnp.ndarray:
        return self.axes[d]

    def reciprocal_axis(self, d: int):
        if d < self.dim:
            return self.reciprocal_axes[d]
        npdtype = np.float64 if self.dtype == jnp.float64 else np.float32
        return np.zeros([1] * self.dim, dtype=npdtype)

    # -- transforms --------------------------------------------------------
    def fft(self, t: jnp.ndarray) -> jnp.ndarray:
        """Forward real FFT over the spatial axes (trailing value dims pass
        through).  Serial path (reference fftSerial :853-867); distributed
        paths live in marlin_tpu.parallel and are wired in by the problem
        builder when a mesh is configured."""
        if self.parallel_mode == ParallelMode.REAL_SPACE:
            raise RuntimeError("FFT is not available in REAL_SPACE parallel mode.")
        spatial = tuple(range(self.dim))
        if self.fft_backend == FFTBackend.PALLAS:
            from . import pallas_fft

            if self.mesh is not None and self.parallel_mode == ParallelMode.FFT_SLAB:
                from . import parallel

                if t.ndim != self.dim:
                    raise RuntimeError(
                        "fft_backend = PALLAS supports scalar fields only in "
                        f"FFT_SLAB mode (got a rank-{t.ndim} tensor on a "
                        f"{self.dim}-D grid)"
                    )
                if jnp.iscomplexobj(t):
                    return (
                        parallel.fft_slab_pallas(self, jnp.real(t))
                        + 1j * parallel.fft_slab_pallas(self, jnp.imag(t))
                    ).astype(self.cdtype)
                return parallel.fft_slab_pallas(self, t)
            if t.ndim > self.dim:
                # tensor-valued fields (e.g. FFTMechanics' (…, dim, dim)
                # deformation gradients): move the trailing value axes to a
                # leading batch position — the planar kernels batch over
                # leading axes natively — and transform the spatial axes
                nv = t.ndim - self.dim
                axes = tuple(range(nv, t.ndim))
                tb = jnp.moveaxis(t, tuple(range(self.dim, t.ndim)),
                                  tuple(range(nv)))

                def fwd(x):
                    rr, ri = pallas_fft.fwd_axes_planar(
                        x.astype(jnp.float32), axes)
                    return rr + 1j * ri

                if jnp.iscomplexobj(tb):
                    u = fwd(jnp.real(tb)) + 1j * fwd(jnp.imag(tb))
                else:
                    u = fwd(tb)
                return jnp.moveaxis(
                    u.astype(self.cdtype), tuple(range(nv)),
                    tuple(range(self.dim, t.ndim)))
            if t.ndim != self.dim:
                raise RuntimeError(
                    "fft_backend = PALLAS supports scalar fields only "
                    f"(got a rank-{t.ndim} tensor on a {self.dim}-D grid)"
                )
            if jnp.iscomplexobj(t):
                u = (pallas_fft.fftn_unordered(jnp.real(t).astype(jnp.float32))
                     + 1j * pallas_fft.fftn_unordered(jnp.imag(t).astype(jnp.float32)))
                return u.astype(self.cdtype)
            return pallas_fft.fftn_unordered(t.astype(jnp.float32)).astype(self.cdtype)
        if self.parallel_mode == ParallelMode.NONE:
            if jnp.iscomplexobj(t):
                return jnp.fft.fftn(t, axes=spatial).astype(self.cdtype)
            return jnp.fft.rfftn(t, axes=spatial).astype(self.cdtype)
        if self.mesh is None:
            # slab/pencil convention without a mesh (single-device run of a
            # parallel deck): same half-spectrum layout as the decomposed
            # run (reciprocal_pad is 0 without a mesh)
            if jnp.iscomplexobj(t):
                return jnp.fft.fftn(t, axes=spatial).astype(self.cdtype)
            if self.parallel_mode == ParallelMode.FFT_SLAB and self.dim == 3:
                return jnp.fft.rfftn(t, axes=spatial).astype(self.cdtype)
            if self.parallel_mode == ParallelMode.FFT_PENCIL and self.dim == 3:
                # half axis is x: rfftn transforms the LAST listed axis real
                return jnp.fft.rfftn(t, axes=(1, 2, 0)).astype(self.cdtype)
            return jnp.fft.fftn(t, axes=spatial).astype(self.cdtype)
        from . import parallel

        return parallel.fft(self, t)

    def ifft(self, t: jnp.ndarray) -> jnp.ndarray:
        if self.parallel_mode == ParallelMode.REAL_SPACE:
            raise RuntimeError("IFFT is not available in REAL_SPACE parallel mode.")
        spatial = tuple(range(self.dim))
        if self.fft_backend == FFTBackend.PALLAS:
            from . import pallas_fft

            if self.mesh is not None and self.parallel_mode == ParallelMode.FFT_SLAB:
                from . import parallel

                if t.ndim != self.dim:
                    # same named rejection as fft(): tensor spectra must not
                    # fall into the scalar slab kernels with a cryptic
                    # reshape/shard error
                    raise RuntimeError(
                        "fft_backend = PALLAS supports scalar fields only in "
                        f"FFT_SLAB mode (got a rank-{t.ndim} tensor on a "
                        f"{self.dim}-D grid)"
                    )
                return parallel.ifft_slab_pallas(self, t)
            if t.ndim > self.dim:
                # inverse of the tensor-valued forward path above
                nv = t.ndim - self.dim
                axes = tuple(range(nv, t.ndim))
                tb = jnp.moveaxis(t, tuple(range(self.dim, t.ndim)),
                                  tuple(range(nv)))
                shape = tb.shape[:nv] + tuple(self.shape)
                out = pallas_fft.inv_axes_planar(
                    jnp.real(tb).astype(jnp.float32),
                    jnp.imag(tb).astype(jnp.float32),
                    axes, real_output=True, shape=shape)
                return jnp.moveaxis(
                    out.astype(self.dtype), tuple(range(nv)),
                    tuple(range(self.dim, t.ndim)))
            return pallas_fft.ifftn_unordered(t, self.shape).astype(self.dtype)
        if self.parallel_mode == ParallelMode.NONE:
            last = self.dim - 1
            # Spectrum kind (half rfftn vs full fftn of a complex field) is
            # inferred from the last spatial extent.  When n_last <= 2 the
            # two layouts COINCIDE (n == n//2+1: bins k=0 and Nyquist only),
            # so the irfftn path below is taken either way; that is exact
            # for any Hermitian-in-last-axis spectrum (every real-field
            # forward transform, including quasi-1D decks with ny=2 such as
            # the reference interface-velocity test).  Only a genuinely
            # complex FIELD transformed at n_last <= 2 would lose its
            # imaginary part here — the full-spectrum branch discards .imag
            # too, so there is no silent-crop hazard beyond that documented
            # degeneracy.
            if (t.shape[last] != self.reciprocal_shape[last]
                    and t.shape[last] == self.shape[last]):
                # full spectrum (forward transform of a COMPLEX field uses
                # fftn, line above) — irfftn would silently crop it to the
                # half layout; mirror the mesh-less slab/pencil convention
                return jnp.fft.ifftn(t, axes=spatial).real.astype(self.dtype)
            return jnp.fft.irfftn(t, s=self.shape, axes=spatial).astype(self.dtype)
        if self.mesh is None:
            s = self.shape
            if (self.parallel_mode == ParallelMode.FFT_SLAB and self.dim == 3
                    and t.shape[2] == self.reciprocal_shape[2]):
                return jnp.fft.irfftn(t, s=s, axes=spatial).astype(self.dtype)
            if (self.parallel_mode == ParallelMode.FFT_PENCIL and self.dim == 3
                    and t.shape[0] == self.reciprocal_shape[0]):
                return jnp.fft.irfftn(
                    t, s=(s[1], s[2], s[0]), axes=(1, 2, 0)
                ).astype(self.dtype)
            return jnp.fft.ifftn(t, axes=spatial).real.astype(self.dtype)
        from . import parallel

        return parallel.ifft(self, t)

    # -- reductions --------------------------------------------------------
    def sum(self, t: jnp.ndarray) -> jnp.ndarray:
        """Global sum over the spatial axes.  Unlike the reference (serial-only
        TODO at src/actions/DomainAction.C:1558-1568) this is
        decomposition-safe: XLA inserts the psum when sharded."""
        return jnp.sum(t, axis=tuple(range(self.dim)))

    def average(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.sum(t) / self.n_cells_global

    def cell_volume(self) -> float:
        return math.prod(self.grid_spacing)

    def __repr__(self):
        return (
            f"Domain(dim={self.dim}, n={self.n_global}, "
            f"box={list(zip(self.mins, self.maxs))}, mode={self.parallel_mode.name})"
        )
