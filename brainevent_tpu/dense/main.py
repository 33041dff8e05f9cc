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

"""``Dense``: dense weight-matrix wrapper with event matmul dispatch
(reference ``brainevent/_dense/main.py:60``)."""

import jax
import jax.numpy as jnp

from .._data import DataRepresentation
from .._error import MathError
from ..units import get_mantissa, split_mantissa_unit, maybe_unit
from .binary import binary_densemv, binary_densemm
from .plasticity import update_dense_on_binary_pre, update_dense_on_binary_post

__all__ = ['Dense']


def _is_event(x) -> bool:
    from ..events.base import EventRepresentation
    from ..events.compact_binary import CompactBinary
    return isinstance(x, (EventRepresentation, CompactBinary))


@jax.tree_util.register_pytree_node_class
class Dense(DataRepresentation):
    """A dense weight matrix that understands event operands.

    ``BinaryArray @ Dense`` / ``Dense @ BinaryArray`` route to the
    event-driven ``binary_densemv/mm`` primitives; plain-array operands use
    ordinary matmul.
    """

    def __init__(self, data, *, shape=None):
        data_m = get_mantissa(data)
        if data_m.ndim != 2:
            raise MathError(f'Dense data must be 2D, got {data_m.ndim}D.')
        super().__init__(shape if shape is not None else data_m.shape)
        self.register_buffer('data', data)

    # -- structure ----------------------------------------------------------

    @property
    def nse(self) -> int:
        return self.size

    @property
    def dtype(self):
        return get_mantissa(self.data).dtype

    def tree_flatten(self):
        return (self.data,), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux_data, children):
        obj = cls.__new__(cls)
        obj.shape = aux_data[0]
        obj._buffers = {'data': children[0]}
        return obj

    # -- conversions ----------------------------------------------------------

    @classmethod
    def fromdense(cls, mat, **kwargs) -> 'Dense':
        return cls(mat)

    def with_data(self, data) -> 'Dense':
        assert get_mantissa(data).shape == self.shape
        return Dense(data)

    def todense(self):
        return self.data

    def tocsr(self, *, nse=None, index_dtype=jnp.int32):
        from ..csr.main import CSR
        return CSR.fromdense(self.data, nse=nse, index_dtype=index_dtype)

    def tocsc(self, *, nse=None, index_dtype=jnp.int32):
        from ..csr.main import CSC
        return CSC.fromdense(self.data, nse=nse, index_dtype=index_dtype)

    def tocoo(self):
        return self.tocsr().tocoo()

    def transpose(self, axes=None) -> 'Dense':
        if axes is not None:
            raise MathError('transpose with axes is not supported.')
        return Dense(self.data.T)

    def slice_rows(self, index) -> 'Dense':
        return Dense(self.data[index])

    def diag_add(self, other) -> 'Dense':
        n = min(self.shape)
        idx = jnp.arange(n)
        return Dense(self.data.at[idx, idx].add(other))

    def solve(self, b, tol=1e-6, reorder=1):
        del tol, reorder
        return jnp.linalg.solve(self.data, b)

    # -- elementwise ----------------------------------------------------------

    def apply(self, fn) -> 'Dense':
        return Dense(fn(self.data))

    def apply2(self, other, fn, *, reverse: bool = False):
        if isinstance(other, Dense):
            other = other.data
        if reverse:
            return Dense(fn(other, self.data))
        return Dense(fn(self.data, other))

    # -- plasticity -----------------------------------------------------------

    def update_on_pre(self, pre_spike, post_trace, w_min=None, w_max=None) -> 'Dense':
        pre_spike = get_mantissa(
            pre_spike.value if _is_event(pre_spike) else pre_spike)
        return Dense(update_dense_on_binary_pre(
            self.data, pre_spike, post_trace, w_min, w_max))

    def update_on_post(self, pre_trace, post_spike, w_min=None, w_max=None) -> 'Dense':
        post_spike = get_mantissa(
            post_spike.value if _is_event(post_spike) else post_spike)
        return Dense(update_dense_on_binary_post(
            self.data, pre_trace, post_spike, w_min, w_max))

    # -- dt2t (per-"connection" broadcast; for Dense every entry is one) ------

    def dt2t(self, y, transpose: bool = False):
        y = get_mantissa(y)
        if transpose:
            return self.data * y[None, :]
        return self.data * y[:, None]

    def dt2t_transposed(self, y):
        return self.dt2t(y, transpose=True)

    # -- products --------------------------------------------------------------

    def _event_value(self, other):
        return get_mantissa(other.value)

    def __matmul__(self, other):
        if _is_event(other):
            ev = self._event_value(other)
            data, unit = split_mantissa_unit(self.data)
            if ev.ndim == 1:
                return maybe_unit(binary_densemv(data, ev, transpose=False), unit)
            return maybe_unit(binary_densemm(data, ev, transpose=False), unit)
        return self.data @ get_mantissa(other)

    def __rmatmul__(self, other):
        if _is_event(other):
            ev = self._event_value(other)
            data, unit = split_mantissa_unit(self.data)
            if ev.ndim == 1:
                return maybe_unit(binary_densemv(data, ev, transpose=True), unit)
            return maybe_unit(
                binary_densemm(data, ev.T, transpose=True).T, unit)
        return get_mantissa(other) @ self.data

    def __repr__(self):
        return f'Dense(shape={self.shape}, dtype={self.dtype})'
