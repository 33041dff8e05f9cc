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

"""Backward-compatibility shim for names retired in the reference between
v0.0.7 and v0.1.0 (reference ``brainevent/_deprecation.py``): renamed public
names resolve with a DeprecationWarning; removed names raise with a
migration message. Installed through PEP 562 ``__getattr__`` hooks in
``brainevent_tpu/__init__.py``."""

import warnings
from typing import Any, Dict, List, Mapping

__all__ = ['DEPRECATED_RENAMES', 'DEPRECATED_REMOVED', 'resolve', 'public_dir']

#: old public name -> replacement name in the package namespace
DEPRECATED_RENAMES: Dict[str, str] = {
    'EventArray': 'BinaryArray',
    'csr_on_pre': 'update_csr_on_binary_pre',
    'csr2csc_on_post': 'update_csr_on_binary_post',
    'dense_on_pre': 'update_dense_on_binary_pre',
    'dense_on_post': 'update_dense_on_binary_post',
    'JITCHomoR': 'JITCScalarR',
    'JITCHomoC': 'JITCScalarC',
    'FixedPostNumConn': 'FixedNumPerPre',
    'FixedPreNumConn': 'FixedNumPerPost',
}

_COO_MIGRATION = (
    'The COO sparse format was removed in 0.1.0. Use CSR / CSC instead; '
    'convert indices with coo2csr or the *_index helpers (csr_to_coo_index, '
    'coo_to_csc_index, csr_to_csc_index, csc_to_csr_index).'
)
_FCN_PACK_MIGRATION = (
    'The explicit bitpack_/compact_ FCN kernels were unified into '
    'fcnmv / fcnmm; wrap spikes with BitPackedBinary or CompactBinary and '
    'call fcnmv / fcnmm.'
)

#: old public name -> migration message (no drop-in replacement)
DEPRECATED_REMOVED: Dict[str, str] = {}
DEPRECATED_REMOVED.update({
    name: _COO_MIGRATION for name in (
        'COO',
        'binary_coomv', 'binary_coomv_p',
        'binary_coomm', 'binary_coomm_p',
        'coomv', 'coomv_p',
        'coomm', 'coomm_p',
        'update_coo_on_binary_pre', 'update_coo_on_binary_post',
        'update_coo_on_binary_pre_p', 'update_coo_on_binary_post_p',
    )
})
DEPRECATED_REMOVED.update({
    name: _FCN_PACK_MIGRATION for name in (
        'bitpack_binary_fcnmv', 'bitpack_binary_fcnmv_p',
        'bitpack_binary_fcnmm', 'bitpack_binary_fcnmm_p',
        'compact_binary_fcnmv', 'compact_binary_fcnmv_p',
    )
})


def resolve(name: str, namespace: Mapping[str, Any]) -> Any:
    """Resolve a retired public name against *namespace* (PEP 562 hook)."""
    if name in DEPRECATED_RENAMES:
        new = DEPRECATED_RENAMES[name]
        warnings.warn(
            f'brainevent_tpu.{name} was renamed to brainevent_tpu.{new}; '
            f'the old name will be removed in a future release.',
            DeprecationWarning,
            stacklevel=3,
        )
        return namespace[new]
    if name in DEPRECATED_REMOVED:
        raise AttributeError(
            f'brainevent_tpu.{name} was removed. {DEPRECATED_REMOVED[name]}')
    raise AttributeError(f'module brainevent_tpu has no attribute {name!r}')


def public_dir(namespace: Mapping[str, Any]) -> List[str]:
    """``__dir__`` contents: live names plus resolvable renames."""
    return sorted(set(namespace) | set(DEPRECATED_RENAMES))
