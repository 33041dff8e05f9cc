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

"""Per-chip CSR kernel tuning configuration.

TPU-native re-design of the reference's CUDA hybrid-scheduler configuration
(``brainevent/_csr/hybrid_config.py``): where the CUDA path bakes task-queue
constants into compiled ``.so`` files, the TPU path tunes *strategy
thresholds* — the MXU-one-hot-scatter output limit and Pallas block sizes —
and persists the winners per device generation in a JSON file. The public
names (:class:`HybridConfig`, :func:`get_hybrid_config`,
``init_csr_config``) are kept so reference code ports unchanged.
"""

import dataclasses
import json
import os
from pathlib import Path
from typing import Optional

import jax

__all__ = ['HybridConfig', 'validate_config', 'current_device_kind',
           'get_hybrid_config', 'save_hybrid_config']

_ENV_PATH = 'BRAINEVENT_CSR_HYBRID_CONFIG'
_DEFAULT_FILENAME = 'csr_tpu_config.json'


@dataclasses.dataclass
class HybridConfig:
    """Tunable CSR-kernel strategy parameters for one device kind.

    Attributes
    ----------
    block_size : int
        Pallas row-block size for blocked CSR kernels (sublane multiple).
    mxu_scatter_limit : int
        Output length at or below which transpose/scatter products use the
        MXU one-hot strategy instead of XLA scatter.
    nse_chunk : int
        nse-axis chunk width for streamed Pallas kernels.
    """
    block_size: int = 256
    mxu_scatter_limit: int = 65536
    nse_chunk: int = 4096

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: int(v) for k, v in d.items()
                      if k in {f.name for f in dataclasses.fields(cls)}})


def validate_config(config: HybridConfig) -> HybridConfig:
    """Validate and normalize a :class:`HybridConfig` (raises ValueError)."""
    if config.block_size <= 0 or config.block_size % 8 != 0:
        raise ValueError(f'block_size must be a positive multiple of 8, got '
                         f'{config.block_size}.')
    if config.mxu_scatter_limit < 0:
        raise ValueError('mxu_scatter_limit must be >= 0.')
    if config.nse_chunk <= 0:
        raise ValueError('nse_chunk must be positive.')
    return config


def current_device_kind() -> str:
    """Device-kind key for config persistence (e.g. ``'TPU v5 lite'``)."""
    try:
        return jax.devices()[0].device_kind
    except Exception:  # pragma: no cover
        return 'cpu'


def _config_path() -> Path:
    env = os.environ.get(_ENV_PATH)
    if env:
        return Path(env)
    return Path.home() / '.cache' / 'brainevent_tpu' / _DEFAULT_FILENAME


_cached: Optional[HybridConfig] = None


def get_hybrid_config() -> HybridConfig:
    """Return the persisted config for this device kind.

    Resolution: user cache (``save_hybrid_config``/``init_csr_config``
    output) > the VENDORED per-device-kind table shipped with the package
    (``brainevent_tpu/tuned/``, measured in CI on each generation —
    the TPU counterpart of the reference's per-GPU hybrid JSON) >
    dataclass defaults.
    """
    global _cached
    if _cached is not None:
        return _cached
    vendored = Path(__file__).parent.parent / 'tuned' / _DEFAULT_FILENAME
    for path in (_config_path(), vendored):
        if path.exists():
            try:
                table = json.loads(path.read_text())
                entry = table.get(current_device_kind())
                if entry:
                    _cached = validate_config(HybridConfig.from_dict(entry))
                    return _cached
            except (json.JSONDecodeError, ValueError, OSError):
                pass
    _cached = HybridConfig()
    return _cached


def save_hybrid_config(config: HybridConfig, path: Optional[str] = None) -> Path:
    """Persist *config* for the current device kind; returns the path."""
    global _cached
    config = validate_config(config)
    p = Path(path) if path else _config_path()
    p.parent.mkdir(parents=True, exist_ok=True)
    table = {}
    if p.exists():
        try:
            table = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            table = {}
    table[current_device_kind()] = config.to_dict()
    p.write_text(json.dumps(table, indent=2))
    _cached = config
    return p
