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

"""Version-tolerant JAX imports (capability parity with reference
``brainevent/_compatible_import.py:33-66``).

Every symbol whose import location has moved between JAX releases is resolved
here once, so the rest of the package imports from a single stable place.
"""

import jax

__all__ = [
    'Primitive',
    'apply_primitive',
    'ShapedArray',
    'ad',
    'batching',
    'mlir',
    'pallas_tpu_params',
]

# --- Primitive ---------------------------------------------------------------
try:  # jax >= 0.4.34
    from jax.extend.core import Primitive
except ImportError:  # pragma: no cover - older jax
    from jax.core import Primitive  # type: ignore

# --- apply_primitive (eager execution of a bound primitive) ------------------
try:
    from jax._src.dispatch import apply_primitive
except ImportError:  # pragma: no cover - future jax moves
    from jax._src.interpreters.xla import apply_primitive  # type: ignore

# --- ShapedArray --------------------------------------------------------------
try:
    from jax.core import ShapedArray
except ImportError:  # pragma: no cover
    from jax._src.core import ShapedArray  # type: ignore

from jax.interpreters import ad, batching, mlir  # noqa: E402


def pallas_tpu_params(**kwargs):
    """Build TPU compiler params for ``pl.pallas_call`` across JAX versions.

    JAX has renamed this structure a couple of times
    (``TPUCompilerParams`` -> ``CompilerParams``); mirror of the reference's
    ``pallas_mosaic_tpu_params`` shim (``brainevent/_compatible_import.py``).
    """
    from jax.experimental.pallas import tpu as pltpu
    if hasattr(pltpu, 'CompilerParams'):
        return pltpu.CompilerParams(**kwargs)
    return pltpu.TPUCompilerParams(**kwargs)  # pragma: no cover - older jax


def default_platform() -> str:
    """Return the default JAX backend platform name ('cpu'/'gpu'/'tpu').

    Experimental platforms that proxy a TPU (e.g. single-chip tunnels) report
    the platform of their device kind when possible.
    """
    try:
        dev = jax.devices()[0]
        kind = getattr(dev, 'device_kind', '') or ''
        if 'tpu' in kind.lower() or dev.platform == 'tpu':
            return 'tpu'
        return dev.platform
    except Exception:  # pragma: no cover - no devices at all
        return jax.default_backend()
