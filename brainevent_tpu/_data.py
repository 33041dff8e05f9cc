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

"""Base classes for sparse/implicit data representations.

Capability parity with reference ``brainevent/_data.py``:
:class:`DataRepresentation` (named-buffer pytree sparse-matrix base) and
:class:`JITCMatrix` (implicit just-in-time-connectivity base whose scalar
algebra is lifted onto the weight parameters). The reference derives from
``brainunit.sparse.SparseMatrix``; here the base is self-contained so units
are optional (see :mod:`brainevent_tpu.units`).
"""

from typing import Callable, Dict, Tuple

import jax.numpy as jnp

from ._error import UnsupportedOperationError

__all__ = ['DataRepresentation', 'JITCMatrix']


class DataRepresentation:
    """Pytree base class of every sparse data representation.

    Concrete subclasses (CSR/CSC/Dense/FixedNumConn/JITC*) store their array
    components as *named buffers* and register themselves as pytree nodes, so
    instances pass transparently through ``jit``/``vmap``/``grad``.

    Subclass contract:

    - ``shape`` is static aux data (the logical dense shape),
    - all traced arrays live in ``self._buffers``,
    - ``__matmul__``/``__rmatmul__`` implement the event/float products,
    - ``todense``/``fromdense`` convert to/from dense arrays.
    """

    __array_priority__ = 200  # our dunders win over np/jnp arrays

    def __init__(self, shape: Tuple[int, ...]):
        self.shape = tuple(int(s) for s in shape)
        self._buffers: Dict[str, object] = {}

    # -- named buffers (reference brainevent/_data.py:44-70) --------------

    def register_buffer(self, name: str, value=None) -> None:
        """Register a named array buffer (a pytree child)."""
        self._buffers[name] = value

    def set_buffer(self, name: str, value) -> None:
        """Set a previously registered buffer."""
        if name not in self._buffers:
            raise KeyError(
                f'Buffer {name!r} is not registered on {type(self).__name__}; '
                f'registered: {sorted(self._buffers)}.'
            )
        self._buffers[name] = value

    def buffers(self) -> Dict[str, object]:
        """Return the named-buffer dict (live reference)."""
        return self._buffers

    def __getattr__(self, name):
        # Called only when normal lookup fails: expose buffers as attributes.
        buffers = self.__dict__.get('_buffers')
        if buffers is not None and name in buffers:
            return buffers[name]
        raise AttributeError(
            f'{type(self).__name__!r} object has no attribute {name!r}'
        )

    # -- shape protocol ----------------------------------------------------

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n

    @property
    def T(self):
        return self.transpose()

    # -- conversions (defaults raise; subclasses override what they support)

    def fromdense(cls, *args, **kwargs):  # noqa: N805 - matches reference
        raise UnsupportedOperationError(
            f'{cls if isinstance(cls, type) else type(cls).__name__} does not '
            f'support fromdense.'
        )

    def todense(self):
        raise UnsupportedOperationError(f'{type(self).__name__} does not support todense.')

    def tocoo(self):
        raise UnsupportedOperationError(f'{type(self).__name__} does not support tocoo.')

    def tocsr(self):
        raise UnsupportedOperationError(f'{type(self).__name__} does not support tocsr.')

    def tocsc(self):
        raise UnsupportedOperationError(f'{type(self).__name__} does not support tocsc.')

    def transpose(self, axes=None):
        raise UnsupportedOperationError(f'{type(self).__name__} does not support transpose.')

    # -- structure-indexed broadcast & plasticity hooks ---------------------
    # (reference brainevent/_data.py:164-360; overridden by formats that
    # support them)

    def dt2t(self, y, transpose: bool = False):
        """Per-connection broadcast ``out[k] = data[k] * y[row(k)]``."""
        raise UnsupportedOperationError(f'{type(self).__name__} does not support dt2t.')

    def dt2t_transposed(self, y):
        return self.dt2t(y, transpose=True)

    def yw_to_w(self, y, w, transpose: bool = False):
        """Combine a per-unit trace ``y`` with per-connection values ``w``."""
        raise UnsupportedOperationError(f'{type(self).__name__} does not support yw_to_w.')

    def yw_to_w_transposed(self, y, w):
        return self.yw_to_w(y, w, transpose=True)

    def update_on_pre(self, pre_spike, post_trace, w_min=None, w_max=None):
        """STDP weight update driven by presynaptic spikes."""
        raise UnsupportedOperationError(
            f'{type(self).__name__} does not support update_on_pre.'
        )

    def update_on_post(self, pre_trace, post_spike, w_min=None, w_max=None):
        """STDP weight update driven by postsynaptic spikes."""
        raise UnsupportedOperationError(
            f'{type(self).__name__} does not support update_on_post.'
        )

    # -- elementwise algebra lifted onto .data ------------------------------

    def apply(self, fn: Callable):
        """Apply *fn* elementwise to the stored values, keeping structure."""
        raise UnsupportedOperationError(f'{type(self).__name__} does not support apply.')

    def apply2(self, other, fn: Callable, *, reverse: bool = False):
        """Binary elementwise op against a scalar or same-structure matrix."""
        if isinstance(other, (int, float, complex)) or (
            hasattr(other, 'ndim') and getattr(other, 'ndim', None) == 0
        ):
            if reverse:
                return self.apply(lambda d: fn(other, d))
            return self.apply(lambda d: fn(d, other))
        raise UnsupportedOperationError(
            f'{type(self).__name__}.apply2 only supports scalars by default, '
            f'got {type(other).__name__}.'
        )

    def __mul__(self, other):
        return self.apply2(other, jnp.multiply)

    def __rmul__(self, other):
        return self.apply2(other, jnp.multiply, reverse=True)

    def __truediv__(self, other):
        return self.apply2(other, jnp.divide)

    def __add__(self, other):
        return self.apply2(other, jnp.add)

    def __radd__(self, other):
        return self.apply2(other, jnp.add, reverse=True)

    def __sub__(self, other):
        return self.apply2(other, jnp.subtract)

    def __rsub__(self, other):
        return self.apply2(other, jnp.subtract, reverse=True)

    def __neg__(self):
        return self.apply(jnp.negative)

    def __repr__(self):
        return f'{type(self).__name__}(shape={self.shape})'


class JITCMatrix(DataRepresentation):
    """Base class of implicit (just-in-time connectivity) matrices.

    The matrix is never stored: connectivity and weights are regenerated
    in-kernel from ``(params..., prob, seed)`` by the light-RNG sampler
    (reference ``brainevent/_data.py:392``). Scalar algebra acts on the
    weight parameters; structure-changing ops are unsupported.
    """

    def fromdense(cls, dense, **kwargs):  # noqa: N805
        raise UnsupportedOperationError(
            'JITC matrices are generative: they cannot be built from a dense '
            'array. Construct them from (weight params, prob, seed).'
        )

    def update_on_pre(self, *args, **kwargs):
        raise UnsupportedOperationError(
            'JITC matrices have no stored weights to update; materialize to '
            'CSR first (``.tocsr()``).'
        )

    def update_on_post(self, *args, **kwargs):
        raise UnsupportedOperationError(
            'JITC matrices have no stored weights to update; materialize to '
            'CSR first (``.tocsr()``).'
        )
