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

"""Compilation cache (reference ``brainevent/_op/kernix_cache.py``).

Content-addressed: SHA-256 over (generated source, toolchain identity, jax
version, schema key) -> ``<name>_<16hex>/module.so`` directories.
"""

import hashlib
import shutil
from pathlib import Path
from typing import Optional

import jax

__all__ = ['CompilationCache', 'set_cache_dir', 'get_cache_dir', 'clear_cache']

_KEY_SCHEMA = 'brainevent-tpu-cpp-v1'

_cache_dir: Optional[Path] = None


def get_cache_dir() -> str:
    """Current cache directory (created on demand)."""
    global _cache_dir
    if _cache_dir is None:
        _cache_dir = Path.home() / '.cache' / 'brainevent_tpu' / 'cpp'
    _cache_dir.mkdir(parents=True, exist_ok=True)
    return str(_cache_dir)


def set_cache_dir(path: str) -> None:
    """Override the cache directory."""
    global _cache_dir
    _cache_dir = Path(path)
    _cache_dir.mkdir(parents=True, exist_ok=True)


def clear_cache() -> None:
    """Delete every cached build artifact."""
    d = Path(get_cache_dir())
    for child in d.iterdir():
        if child.is_dir():
            shutil.rmtree(child, ignore_errors=True)
        else:
            child.unlink(missing_ok=True)


class CompilationCache:
    """Lookup/store compiled modules by content hash."""

    def __init__(self, name: str, source: str, toolchain_id: str):
        payload = '\0'.join([
            _KEY_SCHEMA, name, source, toolchain_id, jax.__version__,
        ]).encode()
        self.key = hashlib.sha256(payload).hexdigest()[:16]
        self.name = name
        self.dir = Path(get_cache_dir()) / f'{name}_{self.key}'

    @property
    def so_path(self) -> Path:
        return self.dir / 'module.so'

    def lookup(self) -> Optional[Path]:
        """Return the cached .so path, or None on miss."""
        return self.so_path if self.so_path.exists() else None

    def store_source(self, source: str) -> Path:
        """Write the generated source next to the artifact (debuggability)."""
        self.dir.mkdir(parents=True, exist_ok=True)
        src = self.dir / 'module.cc'
        src.write_text(source)
        return src
