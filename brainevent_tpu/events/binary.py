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

"""``BinaryArray``: the primary spike-event wrapper
(reference ``brainevent/_event/binary.py:31``)."""

from .._error import MathError
from .base import EventRepresentation, extract_raw_value, is_known_type

__all__ = ['BinaryArray']


class BinaryArray(EventRepresentation):
    """0/1 spike vector or matrix.

    ``@`` against a dense weight matrix routes to the event-driven
    ``binary_densemv``/``binary_densemm`` primitives; against a sparse
    structure object (CSR, FixedNumConn, ...), the product is deferred to
    that object, which dispatches its own event kernels.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import brainevent_tpu as be
    >>> s = be.BinaryArray(jnp.array([True, False, True]))
    >>> W = jnp.array([[1., 2.], [3., 4.], [5., 6.]])
    >>> s @ W
    Array([6., 8.], dtype=float32)
    """

    def bitpack(self):
        """Return a :class:`BitPackedBinary` view of this array."""
        from .bitpack import BitPackedBinary
        return BitPackedBinary(self.value)

    @property
    def T(self):
        """Transposed *raw* array (matches reference: not re-wrapped)."""
        return self.value.T

    def transpose(self, *axes):
        """Underlying array with axes permuted (raw array)."""
        return self.value.transpose(*axes)

    def _check_matmul_operand(self, oc, side: str):
        if self.ndim not in (1, 2):
            raise MathError(
                f'Matrix multiplication is only supported for 1D and 2D '
                f'event arrays; got {self.ndim}D.'
            )
        if oc.ndim != 2:
            raise MathError(
                f'{side} operand must be a 2D weight matrix, got {oc.ndim}D.'
            )

    def __matmul__(self, oc):
        from ..dense.binary import binary_densemv, binary_densemm
        if is_known_type(oc):
            oc = extract_raw_value(oc)
            self._check_matmul_operand(oc, 'Right')
            if self.shape[-1] != oc.shape[0]:
                raise MathError(
                    f'Incompatible matmul dimensions: {self.shape[-1]} vs '
                    f'{oc.shape[0]}.'
                )
            if self.ndim == 1:
                # y[j] = sum_{i active} oc[i, j]
                return binary_densemv(oc, self.value, transpose=True)
            # (m, k) @ (k, n): event matrix on the left
            return binary_densemm(oc, self.value.T, transpose=True).T
        return oc.__rmatmul__(self)

    def __rmatmul__(self, oc):
        from ..dense.binary import binary_densemv, binary_densemm
        if is_known_type(oc):
            oc = extract_raw_value(oc)
            self._check_matmul_operand(oc, 'Left')
            if oc.shape[-1] != self.shape[0]:
                raise MathError(
                    f'Incompatible matmul dimensions: {oc.shape[-1]} vs '
                    f'{self.shape[0]}.'
                )
            if self.ndim == 1:
                # y[i] = sum_{j active} oc[i, j]
                return binary_densemv(oc, self.value, transpose=False)
            # (m, k) @ (k, n): event matrix on the right
            return binary_densemm(oc, self.value, transpose=False)
        return oc.__matmul__(self)

    def __imatmul__(self, oc):
        return self.__matmul__(oc)
