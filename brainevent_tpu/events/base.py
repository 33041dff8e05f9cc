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

"""Event representation base classes (reference ``brainevent/_event/base.py``).

An :class:`EventRepresentation` wraps an array of spike events and overloads
``@`` so that products against weight structures route to event-driven
kernels. ``__array_priority__`` ensures our dunders win against raw arrays.
"""

import abc
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..units import get_mantissa, is_quantity

__all__ = ['extract_raw_value', 'is_known_type', 'EventRepresentation',
           'IndexedEventRepresentation']


def extract_raw_value(obj):
    """Unwrap an event representation / unit quantity into its raw array."""
    if isinstance(obj, EventRepresentation):
        return obj.value
    if is_quantity(obj):
        return get_mantissa(obj)
    return obj


def is_known_type(x) -> bool:
    """Whether *x* is a raw array-ish operand (vs a sparse structure object
    that should handle the product itself)."""
    return isinstance(x, (jax.Array, np.ndarray, EventRepresentation)) or is_quantity(x)


class EventRepresentation(abc.ABC):
    """Pytree array wrapper marking its content as spike *events*.

    Boolean entries flag events directly; float entries are events where
    non-zero (the event-driven kernels multiply by the float value, so 0/1
    floats and booleans agree).
    """

    __array_priority__ = 100

    def __init__(self, value):
        self._value = jnp.asarray(value) if not isinstance(
            value, (jax.Array, np.ndarray)
        ) and not is_quantity(value) else value

    # -- value protocol ------------------------------------------------

    @property
    def value(self):
        """The wrapped raw array."""
        return self._value

    @value.setter
    def value(self, val):
        self._value = val

    def with_value(self, value) -> 'EventRepresentation':
        """Return a new wrapper of the same type around *value*."""
        obj = type(self).__new__(type(self))
        obj._value = value
        return obj

    # -- array protocol --------------------------------------------------

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self._value.shape)

    @property
    def ndim(self) -> int:
        return self._value.ndim

    @property
    def dtype(self):
        return self._value.dtype

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, item):
        return self.with_value(self._value[item])

    def __array__(self, dtype=None):
        return np.asarray(self._value, dtype=dtype)

    def __jax_array__(self):
        return jnp.asarray(self._value)

    # -- abstract products -------------------------------------------------

    @abc.abstractmethod
    def __matmul__(self, other):
        ...

    @abc.abstractmethod
    def __rmatmul__(self, other):
        ...

    # -- pytree protocol -----------------------------------------------------

    def tree_flatten(self):
        return (self._value,), None

    @classmethod
    def tree_unflatten(cls, aux_data, flat_contents):
        obj = cls.__new__(cls)
        (obj._value,) = flat_contents
        return obj

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if not getattr(cls, '_no_pytree', False):
            jax.tree_util.register_pytree_node_class(cls)

    def __repr__(self):
        return f'{type(self).__name__}(shape={self.shape}, dtype={self.dtype})'


class IndexedEventRepresentation(EventRepresentation):
    """Marker base for event representations carrying explicit active-index
    side structures (reference ``brainevent/_event/base.py:362``)."""
    _no_pytree = True
