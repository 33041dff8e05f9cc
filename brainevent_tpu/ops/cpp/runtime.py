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

"""Compiled-module loading + FFI target registration
(reference ``brainevent/_op/kernix_runtime.py``).

Loads the built ``.so`` with ctypes, fetches each export's
``XLA_FFI_Handler*`` through its generated ``be_get_<name>`` getter, and
registers it with ``jax.ffi`` under ``"<module>.<export>"``. Name collisions
with different content raise :class:`KernelRegistrationError`
(``E-REG-COLLISION``); missing symbols raise :class:`KernelLoadError`
(``E-LOAD-MISSING``).
"""

import ctypes
from pathlib import Path
from typing import Dict, List

import jax

from ..._error import KernelLoadError, KernelRegistrationError

__all__ = ['CompiledModule', 'register_ffi_target', 'list_registered_targets']

# target name -> content key, for collision detection
_REGISTERED: Dict[str, str] = {}


class CompiledModule:
    """A loaded native module exposing XLA-FFI targets.

    Attributes
    ----------
    name : str
        Module name (the FFI target prefix).
    targets : list of str
        Fully qualified registered target names.
    """

    def __init__(self, name: str, so_path: Path, exports: List[str],
                 content_key: str):
        self.name = name
        self.so_path = Path(so_path)
        self.content_key = content_key
        try:
            self._lib = ctypes.CDLL(str(self.so_path))
        except OSError as exc:
            raise KernelLoadError(
                f'[E-LOAD-DLOPEN] Could not load {self.so_path}: {exc}\n'
                f'Remediation: clear the cache (brainevent_tpu.clear_cache()) '
                f'and rebuild; check that the host libstdc++ matches the '
                f'compiler used.'
            ) from exc
        self.targets: List[str] = []
        for export in exports:
            self._register(export)

    def _register(self, export: str) -> None:
        getter_name = f'be_get_{export}'
        getter = getattr(self._lib, getter_name, None)
        if getter is None:
            raise KernelLoadError(
                f'[E-LOAD-MISSING] Symbol {getter_name!r} not found in '
                f'{self.so_path}. The module was built without this export; '
                f'check the `// @BE {export}` annotation.'
            )
        getter.restype = ctypes.c_void_p
        handler_ptr = getter()
        target = f'{self.name}.{export}'
        register_ffi_target(target, handler_ptr, self.content_key)
        self.targets.append(target)

    def __repr__(self):
        return f'CompiledModule({self.name!r}, targets={self.targets})'


def register_ffi_target(name: str, handler_ptr: int, content_key: str = '',
                        platform: str = 'cpu') -> None:
    """Register a raw ``XLA_FFI_Handler*`` with jax under *name*.

    Re-registration with identical content is a no-op; different content
    raises (``E-REG-COLLISION``), mirroring reference
    ``kernix_pipeline.py:198``.
    """
    if name in _REGISTERED:
        if _REGISTERED[name] == content_key:
            return
        raise KernelRegistrationError(
            f'[E-REG-COLLISION] FFI target {name!r} is already registered '
            f'with different content. Rename the module or function.'
        )
    capsule = jax.ffi.pycapsule(handler_ptr)
    jax.ffi.register_ffi_target(name, capsule, platform=platform)
    _REGISTERED[name] = content_key


def list_registered_targets() -> List[str]:
    """Names of every FFI target registered through this runtime."""
    return sorted(_REGISTERED)
