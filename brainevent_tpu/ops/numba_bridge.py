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

"""Python/Numba CPU kernel bridge
(reference ``brainevent/_op/numba_ffi.py`` / ``numba_cuda_ffi.py``).

``numba_kernel`` wraps an output-parameter-style CPU kernel (the reference's
Numba calling convention: ``kernel(*inputs, *outputs)`` mutating the
outputs in place) as a JAX-callable op. When Numba is installed the function
is njit-compiled; otherwise it runs as plain Python — either way it executes
through ``jax.pure_callback``, which is the supported JAX-native host-call
mechanism (the reference's hand-built ctypes mirror of the XLA FFI C ABI is
obsolete on this stack; true native kernels use
:func:`brainevent_tpu.load_cpp_inline`).

``numba_cuda_kernel`` / ``numba_cuda_callable`` are GPU-only capabilities
kept as parity stubs.
"""

from typing import Callable

import jax
import numpy as np

from .._error import CUDANotInstalledError
from .util import abstract_arguments

__all__ = ['numba_kernel', 'numba_cuda_kernel', 'numba_cuda_callable']


def _maybe_njit(fn: Callable) -> Callable:
    try:
        import numba
        return numba.njit(fn)
    except ImportError:
        return fn


def numba_kernel(kernel: Callable, outs, *,
                 input_output_aliases=None) -> Callable:
    """Wrap an in-place CPU kernel as a JAX-callable function.

    Parameters
    ----------
    kernel : Callable
        ``kernel(*inputs, *outputs)`` writing results into the output
        arrays (the reference's Numba kernel convention,
        ``brainevent/_op/numba_ffi.py:997``).
    outs
        Output spec(s) (``ShapeDtypeStruct``-like or a sequence).
    input_output_aliases : dict, optional
        ``{input_index: output_index}`` pairs whose outputs start as copies
        of the aliased inputs (donation semantics of the reference's FFI
        path, emulated by initialization).

    Returns
    -------
    Callable mapping the JAX array inputs to a tuple of outputs.
    """
    out_specs = abstract_arguments(outs)
    compiled = _maybe_njit(kernel)
    aliases = dict(input_output_aliases or {})

    def host_fn(*np_inputs):
        outputs = []
        for i, spec in enumerate(out_specs):
            src = None
            for in_idx, out_idx in aliases.items():
                if out_idx == i:
                    src = np.array(np_inputs[in_idx], copy=True)
            outputs.append(
                src if src is not None
                else np.zeros(spec.shape, dtype=spec.dtype))
        compiled(*[np.asarray(x) for x in np_inputs], *outputs)
        return tuple(outputs)

    def call(*args):
        return jax.pure_callback(
            host_fn, tuple(jax.ShapeDtypeStruct(s.shape, s.dtype)
                           for s in out_specs),
            *args, vmap_method='sequential')

    return call


_CUDA_MSG = (
    '{fn} requires CUDA + numba.cuda, which are not available on this '
    'TPU/CPU deployment. Write device kernels with Pallas '
    '(XLACustomKernel.def_pallas_kernel).'
)


def numba_cuda_kernel(*args, **kwargs):
    """API-parity stub (reference ``brainevent/_op/numba_cuda_ffi.py:831``)."""
    raise CUDANotInstalledError(_CUDA_MSG.format(fn='numba_cuda_kernel'))


def numba_cuda_callable(*args, **kwargs):
    """API-parity stub (reference ``brainevent/_op/numba_cuda_ffi.py:1411``)."""
    raise CUDANotInstalledError(_CUDA_MSG.format(fn='numba_cuda_callable'))
