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

"""Global registry of every :class:`XLACustomKernel` primitive.

Populated as a side effect of importing the package: every module-level
``XLACustomKernel(...)`` auto-registers itself, so the CLI and the benchmark
harness can enumerate primitives and filter them by tags (capability parity
with reference ``brainevent/_registry.py:39-108``).
"""

from typing import TYPE_CHECKING, Dict, List, Set

if TYPE_CHECKING:
    from .ops.core import XLACustomKernel

__all__ = [
    'register_primitive',
    'get_registry',
    'get_primitives_by_tags',
    'get_all_primitive_names',
]

_REGISTRY: Dict[str, 'XLACustomKernel'] = {}


def register_primitive(name: str, primitive: 'XLACustomKernel') -> None:
    """Register *primitive* under *name* in the global registry.

    Called automatically by ``XLACustomKernel.__init__``; re-registration of
    the same name overwrites (last definition wins), which keeps module
    reloads in notebooks working.
    """
    if not isinstance(name, str) or not name:
        raise ValueError(f'Primitive name must be a non-empty string, got {name!r}.')
    _REGISTRY[name] = primitive


def get_registry() -> Dict[str, 'XLACustomKernel']:
    """Return a copy of the ``name -> XLACustomKernel`` registry."""
    return dict(_REGISTRY)


def get_primitives_by_tags(tags: Set[str]) -> Dict[str, 'XLACustomKernel']:
    """Return the registered primitives whose tag set contains every tag in *tags*.

    Tags are attached with ``XLACustomKernel.def_tags`` (e.g. ``{'csr',
    'binary'}``). An empty *tags* set matches everything.
    """
    tags = set(tags)
    return {
        name: prim
        for name, prim in _REGISTRY.items()
        if tags.issubset(prim.tags)
    }


def get_all_primitive_names() -> List[str]:
    """Return the sorted names of all registered primitives."""
    return sorted(_REGISTRY)
