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

"""Optional physical-unit support.

The reference hard-depends on ``brainunit`` for unit-aware operator wrappers
(``u.split_mantissa_unit``, e.g. ``brainevent/_csr/binary.py:248-260``).
brainevent-tpu keeps the same behavior when brainunit is installed but
degrades gracefully to plain arrays when it is not — all unit handling in the
package routes through this shim.
"""

from typing import Any, Optional, Tuple

__all__ = [
    'HAS_BRAINUNIT',
    'split_mantissa_unit',
    'maybe_unit',
    'get_mantissa',
    'is_quantity',
]

try:  # pragma: no cover - exercised only when brainunit is installed
    import brainunit as _u
    HAS_BRAINUNIT = True
except ImportError:
    _u = None
    HAS_BRAINUNIT = False


def is_quantity(x) -> bool:
    """Whether *x* is a brainunit ``Quantity``."""
    return HAS_BRAINUNIT and isinstance(x, _u.Quantity)


def split_mantissa_unit(x) -> Tuple[Any, Optional[Any]]:
    """Split *x* into ``(mantissa, unit)``; unit is ``None`` for plain arrays."""
    if is_quantity(x):
        m, unit = _u.split_mantissa_unit(x)
        return m, unit
    return x, None


def get_mantissa(x):
    """Return the raw array behind *x* (strip any unit)."""
    if is_quantity(x):
        return _u.get_mantissa(x)
    return x


def maybe_unit(x, *units):
    """Re-attach the product of *units* to *x* (``None`` entries are skipped)."""
    if not HAS_BRAINUNIT:
        return x
    result_unit = None
    for unit in units:
        if unit is None:
            continue
        result_unit = unit if result_unit is None else result_unit * unit
    if result_unit is None:
        return x
    return _u.maybe_decimal(x * result_unit)
