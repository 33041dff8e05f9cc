# Copyright 2026 The brainevent-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
# ==============================================================================

"""Fixed-number-connectivity (ELL) data structures
(reference ``brainevent/_fcn/main.py``).

:class:`FixedNumPerPre` stores, per presynaptic row, a fixed number of
postsynaptic targets — the natural format for biological "fixed out-degree"
random connectivity and the storage behind event-driven EI networks.
:class:`FixedNumPerPost` is the post-grouped mirror (fixed in-degree). Both
describe a logical ``(n_pre, n_post)`` matrix; ``transpose()`` flips between
them zero-copy.

ELL is *naturally* TPU-friendly: the ``(rows, n_conn)`` rectangles are
static-shape gathers/scatters with no indptr indirection.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .._data import DataRepresentation
from .._error import MathError, UnsupportedOperationError
from ..events.base import EventRepresentation, extract_raw_value
from ..events.compact_binary import CompactBinary
from ..units import get_mantissa, split_mantissa_unit, maybe_unit
from .binary import binary_fcnmv, binary_fcnmm
from .float import fcnmv, fcnmm, fcnmv_dt2t
from .plasticity import (
    update_fixed_post_conn_on_binary_pre,
    update_fixed_pre_conn_on_binary_post,
)

__all__ = ['FixedNumConn', 'FixedNumPerPre', 'FixedNumPerPost']


def _is_event(x) -> bool:
    return isinstance(x, (EventRepresentation, CompactBinary))


def _event_value(x):
    return extract_raw_value(x.value if isinstance(x, CompactBinary) else x)


class FixedNumConn(DataRepresentation):
    """Base class of fixed-number connectivity matrices
    (reference ``brainevent/_fcn/main.py:199``).

    Stores ``indices`` of shape ``(n_rows_ell, n_conn)`` and ``data`` of
    shape ``(1,)`` (homogeneous) or ``indices.shape``. The subclass decides
    whether ELL rows are presynaptic (:class:`FixedNumPerPre`) or
    postsynaptic (:class:`FixedNumPerPost`) units of the logical
    ``(n_pre, n_post)`` matrix.
    """

    def __init__(self, args, *, shape: Tuple[int, int]):
        data, indices = args
        super().__init__(shape)
        indices = jnp.asarray(indices)
        if indices.ndim != 2:
            raise MathError(f'indices must be (rows, n_conn), got {indices.ndim}D.')
        data_m = get_mantissa(data)
        if not (np.shape(data_m) in ((1,), tuple(indices.shape)) or
                np.ndim(data_m) == 0):
            raise MathError(
                f'data must be scalar, (1,), or {tuple(indices.shape)}, got '
                f'{np.shape(data_m)}.')
        if np.ndim(data_m) == 0:
            data = jnp.asarray(data)[None] if not hasattr(data, 'reshape') \
                else data.reshape(1)
        self.register_buffer('data', data)
        self.register_buffer('indices', indices)
        if self._ell_rows() != indices.shape[0]:
            raise MathError(
                f'indices rows ({indices.shape[0]}) must equal '
                f'{self._ell_rows()} for {type(self).__name__} with shape '
                f'{shape}.')

    # -- orientation hooks (reference _fcn/main.py:253-260) -----------------

    def _ell_rows(self) -> int:
        """Number of ELL rows (n_pre for PerPre, n_post for PerPost)."""
        raise NotImplementedError

    def _ell_shape(self) -> Tuple[int, int]:
        """Logical shape of the row-oriented ELL view."""
        raise NotImplementedError

    @property
    def n_conn(self) -> int:
        return self.indices.shape[1]

    @property
    def nse(self) -> int:
        return self.indices.size

    # -- MXU float route (the CSR counterpart lives in csr/main.py) ---------

    def build_mxu_plan(self, **knobs):
        """Build and cache the blocked one-hot MXU layout for the float
        products (both directions of the stored ELL view) — measured ~1
        ns/element vs XLA's ~14 ns/element gathers (BENCH_NOTES round 3).
        Requires concrete structure (call outside ``jit``); returns self.

        As on :class:`~brainevent_tpu.CSR`, the first float 1-D product
        auto-builds the pair on TPU (``config.set_auto_mxu_plan``); the
        plan pair is structure-only and survives ``with_data``, and
        gradients w.r.t. the product vector ride the pair through
        ``ops/mxu_gather.plan_matvec_vjp``. Traced-data products fall
        back to the XLA kernels (AD w.r.t. ``data`` stays on the
        primitive's exact rules; training loops hoist the permutation —
        ``models/training.py``).
        """
        if getattr(self, '_mxu_plans', None) is None:
            from ..ops.mxu_gather import build_gather_plan, plan_from_ell
            import jax.core as jcore
            if isinstance(self.indices, jcore.Tracer):
                raise UnsupportedOperationError(
                    'build_mxu_plan needs concrete structure; '
                    'call it outside jit/grad.')
            idx = np.asarray(self.indices)
            rows_n, cols_n = self._ell_shape()
            plan = plan_from_ell(idx, (rows_n, cols_n))
            plan_t = build_gather_plan(
                idx.reshape(-1), np.repeat(np.arange(rows_n), idx.shape[1]),
                (cols_n, rows_n))
            self._mxu_plans = (plan, plan_t)
        return self

    def _auto_mxu_plans(self):
        """Lazy auto-build at the first float product (see the CSR
        counterpart, ``csr/main.py``)."""
        plans = getattr(self, '_mxu_plans', None)
        if plans is not None:
            return plans
        from .. import config as _cfg
        mode = _cfg.get_auto_mxu_plan()
        if mode is False:
            return None
        if mode == 'auto':
            from .._compat import default_platform
            if default_platform() != 'tpu':
                return None
        if self.nse < _cfg.get_mxu_plan_min_nse():
            return None
        import jax.core as jcore
        if isinstance(self.indices, jcore.Tracer):
            return None
        self.build_mxu_plan()
        return self._mxu_plans

    def _mxu_weight_views(self, plans):
        views = getattr(self, '_mxu_wviews', None)
        if views is not None:
            return views
        import jax.core as jcore
        data = get_mantissa(self.data)
        if isinstance(data, jcore.Tracer):
            return None
        plan, plan_t = plans
        flat = (data if data.shape == (1,) else data.reshape(-1))
        self._mxu_wviews = (plan.sort_data(flat), plan_t.sort_data(flat))
        return self._mxu_wviews

    def _mxu_matmat(self, B, *, ell_transpose: bool,
                    transpose_out: bool = False):
        """Float mat-mat through a cached DENSE mirror, or ``None``.

        Same MXU crossover as ``CSR._mxu_matmat`` (BENCH_NOTES r4f):
        concrete data on TPU + dense form within
        ``config.get_dense_mm_max_bytes()`` runs ``D @ B`` on a lazily
        cached dense ELL view; the mirror is a concrete constant so
        operand grads differentiate natively; traced-data instances
        return ``None`` (exact AD on the primitive)."""
        B_m = get_mantissa(B)
        if B_m.ndim != 2:
            return None
        if not ell_transpose:
            # favorable (gather) direction: the ELL gather reads only
            # K*rows values and beats the dense matmul at biological K
            # (measured 102 vs 218 us at (5k,K=50,B=128) — BENCH_NOTES
            # r4f); dense only pays in the scatter direction (2,615 ->
            # 251 us, 10.4x)
            return None
        if jnp.dtype(get_mantissa(self.data).dtype) == jnp.float64:
            return None
        from .. import config as _cfg
        mode = _cfg.get_auto_mxu_plan()
        if mode is False:
            return None
        if mode == 'auto':
            from .._compat import default_platform
            if default_platform() != 'tpu':
                return None
        rows_n, cols_n = self._ell_shape()
        budget = _cfg.get_dense_mm_max_bytes()
        if self.nse < _cfg.get_mxu_plan_min_nse():
            return None
        import jax.core as jcore
        data = get_mantissa(self.data)
        if any(isinstance(a, jcore.Tracer) for a in (self.indices, data)):
            return None
        if budget <= 0 or 4 * rows_n * cols_n > budget:
            # above the dense budget (10k reference shapes): the blocked
            # one-hot mm kernel over the cached plan pair — same route
            # as CSR._mxu_plan_matmat (BENCH_NOTES r5)
            return self._mxu_plan_matmat(
                B, ell_transpose=ell_transpose,
                transpose_out=transpose_out)
        D = getattr(self, '_mxu_dense', None)
        if D is None:
            D = get_mantissa(self._ell_dense()).astype(jnp.float32)
            self._mxu_dense = D
        _, d_unit = split_mantissa_unit(self.data)
        B_v, b_unit = split_mantissa_unit(B)
        out = jax.lax.dot_general(
            D, B_v.astype(jnp.float32),
            dimension_numbers=((((0,) if ell_transpose else (1,)),
                                (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        if transpose_out:
            out = out.T
        return maybe_unit(out.astype(data.dtype), d_unit, b_unit)

    def _mxu_plan_matmat(self, B, *, ell_transpose: bool,
                         transpose_out: bool = False):
        """Float mat-mat through the blocked one-hot mm kernel over a
        cached mm plan pair (``ops/mxu_gather.gather_matmat``), or
        ``None`` when the operand exceeds VMEM residency. Mirrors
        ``CSR._mxu_plan_matmat``; the ELL flat order is row-major of the
        ``(rows, K)`` table, matching ``GatherPlan.sort_data``."""
        from ..ops.mxu_gather import (build_mm_plan, _mm_vmem_ok,
                                      plan_matmat_vjp)
        from .. import config as _cfg
        import numpy as np
        B_m = get_mantissa(B)
        plans = getattr(self, '_mm_plans', None)
        if plans is None:
            idx = np.asarray(self.indices)
            rows_n, cols_n = self._ell_shape()
            n_rows, K = idx.shape
            rows = np.repeat(np.arange(n_rows), K)
            plan = build_mm_plan(rows, idx.reshape(-1), (rows_n, cols_n))
            plan_t = build_mm_plan(idx.reshape(-1), rows, (cols_n, rows_n))
            self._mm_plans = plans = (plan, plan_t)
        plan, plan_t = plans
        passes = _cfg.get_mm_passes()
        if not (_mm_vmem_ok(plan, B_m.shape[1], passes)
                and _mm_vmem_ok(plan_t, B_m.shape[1], passes)):
            return None
        views = getattr(self, '_mm_wviews', None)
        if views is None:
            data = get_mantissa(self.data)
            flat = (data if data.shape == (1,) else data.reshape(-1))
            self._mm_wviews = views = (plan.sort_data(flat),
                                       plan_t.sort_data(flat))
        w_s, w_t = views
        data = get_mantissa(self.data)
        _, d_unit = split_mantissa_unit(self.data)
        B_v, b_unit = split_mantissa_unit(B)
        Bf = B_v.astype(jnp.float32)
        if ell_transpose:
            out = plan_matmat_vjp(plan_t, plan, w_t, w_s, Bf,
                                  passes=passes)
        else:
            out = plan_matmat_vjp(plan, plan_t, w_s, w_t, Bf,
                                  passes=passes)
        if transpose_out:
            out = out.T
        return maybe_unit(out.astype(data.dtype), d_unit, b_unit)

    def _mxu_matvec(self, v, *, ell_transpose: bool):
        """Float matvec through the cached MXU plan, or ``None``.

        ``ell_transpose`` refers to the stored ELL view (matches the
        ``transpose=`` argument of ``fcnmv`` on ``_ell_shape()``).
        """
        if get_mantissa(v).ndim != 1:
            return None
        if jnp.dtype(get_mantissa(self.data).dtype) == jnp.float64:
            return None          # keep x64 exact on the XLA kernels
        plans = self._auto_mxu_plans()
        if plans is None:
            return None
        views = self._mxu_weight_views(plans)
        if views is None:
            return None
        from ..ops.mxu_gather import plan_matvec_vjp
        plan, plan_t = plans
        w_s, w_t = views
        v_m, v_unit = split_mantissa_unit(v)
        _, d_unit = split_mantissa_unit(self.data)
        if ell_transpose:
            out = plan_matvec_vjp(plan_t, plan, w_t, w_s, v_m)
        else:
            out = plan_matvec_vjp(plan, plan_t, w_s, w_t, v_m)
        return maybe_unit(out.astype(get_mantissa(self.data).dtype),
                          d_unit, v_unit)

    @property
    def dtype(self):
        return get_mantissa(self.data).dtype

    # -- pytree ----------------------------------------------------------------

    def tree_flatten(self):
        return (self.data, self.indices), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux_data, children):
        obj = cls.__new__(cls)
        obj.shape = aux_data[0]
        obj._buffers = {'data': children[0], 'indices': children[1]}
        return obj

    def with_data(self, data):
        obj = type(self)((data, self.indices), shape=self.shape)
        # structure-only plan pair survives data swaps; the sorted weight
        # views are re-derived lazily from the new data (csr/main.py:_new)
        obj._mxu_plans = getattr(self, '_mxu_plans', None)
        return obj

    def apply(self, fn):
        return self.with_data(fn(self.data))

    def apply2(self, other, fn, *, reverse: bool = False):
        if isinstance(other, FixedNumConn):
            other = other.data
        if reverse:
            return self.with_data(fn(other, self.data))
        return self.with_data(fn(self.data, other))

    # -- conversions (shared) ------------------------------------------------------

    def _ell_dense(self):
        """Dense matrix of the row-oriented ELL view."""
        data, unit = split_mantissa_unit(self.data)
        rows_n, n_conn = self.indices.shape
        cols = self._ell_shape()[1]
        d = (jnp.broadcast_to(data, self.indices.shape)
             if data.shape == (1,) else data)
        rows = jnp.repeat(jnp.arange(rows_n), n_conn,
                          total_repeat_length=rows_n * n_conn)
        dense = jnp.zeros((rows_n, cols), dtype=d.dtype).at[
            rows, self.indices.reshape(-1)].add(d.reshape(-1))
        return maybe_unit(dense, unit)

    def tocoo(self):
        """Return a ``jax.experimental.sparse.BCOO`` of the logical matrix."""
        return self.tocsr().tocoo()

    def tocsr(self):
        """Convert to :class:`~brainevent_tpu.CSR` (host/trace-time)."""
        from ..csr.main import CSR
        return CSR.fromdense(self.todense())

    def tocsc(self):
        """Convert to :class:`~brainevent_tpu.CSC` (host/trace-time)."""
        from ..csr.main import CSC
        return CSC.fromdense(self.todense())

    def __repr__(self):
        return (f'{type(self).__name__}(shape={self.shape}, '
                f'n_conn={self.n_conn}, dtype={self.dtype})')


@jax.tree_util.register_pytree_node_class
class FixedNumPerPre(FixedNumConn):
    """Fixed out-degree connectivity: ``indices[i, :]`` are the postsynaptic
    targets of presynaptic neuron ``i``
    (reference ``brainevent/_fcn/main.py:781``).

    Logical matrix ``A`` is ``(n_pre, n_post)`` with
    ``A[i, indices[i,k]] += data[i,k]``.
    """

    def _ell_rows(self):
        return self.shape[0]

    def _ell_shape(self):
        return self.shape

    @classmethod
    def fromdense(cls, mat, *, num_conn=None, backend=None) -> 'FixedNumPerPre':
        """Build from a dense matrix whose rows all have the same nnz."""
        del backend
        mat_m, unit = split_mantissa_unit(mat)
        with jax.ensure_compile_time_eval():
            mat_np = np.asarray(mat_m)
            counts = (mat_np != 0).sum(axis=1)
            k = int(counts[0]) if num_conn is None else int(num_conn)
            if not (counts == k).all():
                raise MathError(
                    'FixedNumPerPre.fromdense requires every row to have '
                    f'exactly {k} non-zeros; got counts in '
                    f'[{counts.min()}, {counts.max()}].')
            indices = np.zeros((mat_np.shape[0], k), np.int32)
            data = np.zeros((mat_np.shape[0], k), mat_np.dtype)
            for i in range(mat_np.shape[0]):
                cols = np.nonzero(mat_np[i])[0][:k]
                indices[i] = cols
                data[i] = mat_np[i, cols]
        return cls((maybe_unit(jnp.asarray(data), unit), jnp.asarray(indices)),
                   shape=tuple(mat_np.shape))

    def todense(self):
        return self._ell_dense()

    def transpose(self, axes=None) -> 'FixedNumPerPost':
        if axes is not None:
            raise MathError('transpose with axes is not supported.')
        return FixedNumPerPost((self.data, self.indices),
                               shape=(self.shape[1], self.shape[0]))

    def slice_rows(self, index) -> 'FixedNumPerPre':
        obj = FixedNumPerPre.__new__(FixedNumPerPre)
        data = self.data if get_mantissa(self.data).shape == (1,) \
            else self.data[index]
        idx = self.indices[index]
        obj.shape = (idx.shape[0], self.shape[1])
        obj._buffers = {'data': data, 'indices': idx}
        return obj

    # -- plasticity -----------------------------------------------------------

    def update_on_pre(self, pre_spike, post_trace, w_min=None, w_max=None):
        pre_spike = _event_value(pre_spike) if _is_event(pre_spike) else pre_spike
        return self.with_data(update_fixed_post_conn_on_binary_pre(
            self.data, self.indices, pre_spike, post_trace, w_min, w_max))

    def update_on_post(self, pre_trace, post_spike, w_min=None, w_max=None):
        # post-driven update on pre-grouped storage: per (i, k):
        # w += pre_trace[i] * gate(post_spike[indices[i, k]])
        post_spike = _event_value(post_spike) if _is_event(post_spike) else post_spike
        data, unit = split_mantissa_unit(self.data)
        trace, _ = split_mantissa_unit(pre_trace)
        gate = (post_spike.astype(data.dtype) if post_spike.dtype == jnp.bool_
                else (post_spike > 0).astype(data.dtype))
        d = jnp.broadcast_to(data, self.indices.shape) if data.shape == (1,) \
            else data
        out = d + trace[:, None].astype(d.dtype) * gate[self.indices]
        if w_min is not None or w_max is not None:
            w_min_m, _ = split_mantissa_unit(w_min) if w_min is not None else (None, None)
            w_max_m, _ = split_mantissa_unit(w_max) if w_max is not None else (None, None)
            out = jnp.clip(out, w_min_m, w_max_m)
        return self.with_data(maybe_unit(out, unit))

    # -- dt2t -------------------------------------------------------------------

    def dt2t(self, y, transpose: bool = False):
        return fcnmv_dt2t(y, self.data, self.indices, shape=self.shape,
                          transpose=transpose)

    def dt2t_transposed(self, y):
        return self.dt2t(y, transpose=True)

    # -- products ------------------------------------------------------------------
    # A @ v: gather (favorable); s @ A: event scatter (compact kernel).

    def __matmul__(self, other):
        if _is_event(other):
            ev = _event_value(other)
            op = binary_fcnmv if ev.ndim == 1 else binary_fcnmm
            return op(self.data, self.indices, ev, shape=self.shape,
                      transpose=False)
        other = extract_raw_value(other)
        if getattr(other, 'ndim', 0) == 1:
            fast = self._mxu_matvec(other, ell_transpose=False)
            if fast is not None:
                return fast
            return fcnmv(self.data, self.indices, other, shape=self.shape,
                         transpose=False)
        fast = self._mxu_matmat(other, ell_transpose=False)
        if fast is not None:
            return fast
        return fcnmm(self.data, self.indices, other, shape=self.shape,
                     transpose=False)

    def __rmatmul__(self, other):
        if _is_event(other):
            ev = _event_value(other)
            if ev.ndim == 1:
                return binary_fcnmv(self.data, self.indices, ev,
                                    shape=self.shape, transpose=True)
            return binary_fcnmm(self.data, self.indices, ev.T,
                                shape=self.shape, transpose=True).T
        other = extract_raw_value(other)
        if getattr(other, 'ndim', 0) == 1:
            fast = self._mxu_matvec(other, ell_transpose=True)
            if fast is not None:
                return fast
            return fcnmv(self.data, self.indices, other, shape=self.shape,
                         transpose=True)
        fast = self._mxu_matmat(other.T, ell_transpose=True,
                                transpose_out=True)
        if fast is not None:
            return fast
        return fcnmm(self.data, self.indices, other.T, shape=self.shape,
                     transpose=True).T


@jax.tree_util.register_pytree_node_class
class FixedNumPerPost(FixedNumConn):
    """Fixed in-degree connectivity: ``indices[j, :]`` are the presynaptic
    sources of postsynaptic neuron ``j``
    (reference ``brainevent/_fcn/main.py:1042``).

    Logical matrix ``A`` is ``(n_pre, n_post)`` with
    ``A[indices[j,k], j] += data[j,k]``. The stored ELL is the row view of
    ``A.T``.
    """

    def _ell_rows(self):
        return self.shape[1]

    def _ell_shape(self):
        return (self.shape[1], self.shape[0])

    @classmethod
    def fromdense(cls, mat, *, num_conn=None, backend=None) -> 'FixedNumPerPost':
        """Build from a dense matrix whose columns all have the same nnz."""
        t = FixedNumPerPre.fromdense(mat.T, num_conn=num_conn, backend=backend)
        return cls((t.data, t.indices), shape=(t.shape[1], t.shape[0]))

    def todense(self):
        return self._ell_dense().T

    def transpose(self, axes=None) -> 'FixedNumPerPre':
        if axes is not None:
            raise MathError('transpose with axes is not supported.')
        return FixedNumPerPre((self.data, self.indices),
                              shape=(self.shape[1], self.shape[0]))

    def slice_rows(self, index):
        """Dense submatrix of the selected logical rows (pre neurons)."""
        return self.tocsr().slice_rows(index)

    def update_on_pre(self, pre_spike, post_trace, w_min=None, w_max=None):
        # pre-driven update on post-grouped storage: per (j, k):
        # w[j,k] += gate(pre_spike[indices[j,k]]) * post_trace[j]
        pre_spike = _event_value(pre_spike) if _is_event(pre_spike) else pre_spike
        data, unit = split_mantissa_unit(self.data)
        trace, _ = split_mantissa_unit(post_trace)
        gate = (pre_spike.astype(data.dtype) if pre_spike.dtype == jnp.bool_
                else (pre_spike > 0).astype(data.dtype))
        d = jnp.broadcast_to(data, self.indices.shape) if data.shape == (1,) \
            else data
        out = d + gate[self.indices] * trace[:, None].astype(d.dtype)
        if w_min is not None or w_max is not None:
            w_min_m, _ = split_mantissa_unit(w_min) if w_min is not None else (None, None)
            w_max_m, _ = split_mantissa_unit(w_max) if w_max is not None else (None, None)
            out = jnp.clip(out, w_min_m, w_max_m)
        return self.with_data(maybe_unit(out, unit))

    def update_on_post(self, pre_trace, post_spike, w_min=None, w_max=None):
        post_spike = _event_value(post_spike) if _is_event(post_spike) else post_spike
        return self.with_data(update_fixed_pre_conn_on_binary_post(
            self.data, self.indices, pre_trace, post_spike, w_min, w_max))

    def dt2t(self, y, transpose: bool = False):
        # row view is A.T: non-transposed logical dt2t indexes post rows
        return fcnmv_dt2t(y, self.data, self.indices,
                          shape=self._ell_shape(), transpose=not transpose)

    def dt2t_transposed(self, y):
        return self.dt2t(y, transpose=True)

    # -- products: stored ELL is A.T ---------------------------------------------

    def __matmul__(self, other):
        # A @ v = (ELL).T @ v: scatter direction of the stored view
        if _is_event(other):
            ev = _event_value(other)
            if ev.ndim == 1:
                return binary_fcnmv(self.data, self.indices, ev,
                                    shape=self._ell_shape(), transpose=True)
            return binary_fcnmm(self.data, self.indices, ev,
                                shape=self._ell_shape(), transpose=True)
        other = extract_raw_value(other)
        if getattr(other, 'ndim', 0) == 1:
            fast = self._mxu_matvec(other, ell_transpose=True)
            if fast is not None:
                return fast
            return fcnmv(self.data, self.indices, other,
                         shape=self._ell_shape(), transpose=True)
        fast = self._mxu_matmat(other, ell_transpose=True)
        if fast is not None:
            return fast
        return fcnmm(self.data, self.indices, other,
                     shape=self._ell_shape(), transpose=True)

    def __rmatmul__(self, other):
        # s @ A = ELL @ s: gather direction of the stored view
        if _is_event(other):
            ev = _event_value(other)
            if ev.ndim == 1:
                return binary_fcnmv(self.data, self.indices, ev,
                                    shape=self._ell_shape(), transpose=False)
            return binary_fcnmm(self.data, self.indices, ev.T,
                                shape=self._ell_shape(), transpose=False).T
        other = extract_raw_value(other)
        if getattr(other, 'ndim', 0) == 1:
            fast = self._mxu_matvec(other, ell_transpose=False)
            if fast is not None:
                return fast
            return fcnmv(self.data, self.indices, other,
                         shape=self._ell_shape(), transpose=False)
        fast = self._mxu_matmat(other.T, ell_transpose=False,
                                transpose_out=True)
        if fast is not None:
            return fast
        return fcnmm(self.data, self.indices, other.T,
                     shape=self._ell_shape(), transpose=False).T
