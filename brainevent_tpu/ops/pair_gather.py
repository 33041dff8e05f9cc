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

"""Runtime MXU pair-gather: per-entry ``s[row_e] * x[col_e]`` without XLA's
serialized gathers.

The plasticity/dt2t family (reference ``brainevent/_csr/plasticity_binary.py``,
``_csr/dt2t.py``, ``_fcn/plasticity_row_driven.cu``) is bound on TPU by two
XLA structure gathers (~7-14 ns/element — BENCH_NOTES). Unlike the
:mod:`~brainevent_tpu.ops.mxu_gather` plans, these ops need their output in
**nnz order**, so a sorted layout would pay an inverse permutation that
costs more than the gathers (measured 6.6 ms/1M elements, BENCH_NOTES r4a).

This kernel exploits that no sort is needed at all: both gathers run as
whole-operand one-hot MXU contractions per 1024-entry chunk, directly in
nnz order, with TRACED ``rows``/``cols`` (no host-side plan — the kernel is
a real backend on the primitives, not a class-layer route):

- per chunk, ``shot = [row_hi == i]`` (``Mb x C``) one-hot contracted
  against the pre-split bf16 operand slab gathers 128 candidate sublanes
  per entry; a lane one-hot selects the element (exactly the
  :mod:`mxu_gather` kernel's decode, minus the plan);
- ``passes``-way bf16 splitting keeps f32 values exact (3 = exact; 0/1
  event gates need only 1);
- sentinel ``-1`` ids contribute exact zeros (no one-hot row matches).

Per-entry cost ~``(Mb + Nb + 256)`` VPU compares + ``(Mb + Nb) * 128 *
passes`` bf16 MACs — ~1-2 ns/element at the benchmark shapes vs the
~14 ns XLA floor.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from .pallas_utils import interpret_mode
from .scatter import bf16_split

__all__ = ['pair_gather_product']

_LANES = 128
_C = 1024          # entries per chunk
_CPB = 8           # chunks per program (Mosaic block sublane rule)
# perf envelope: beyond this many combined 128-blocks the one-hot heights
# make XLA's serialized gathers competitive again
_MAX_BLOCKS = 2048
_VMEM_BUDGET = 64 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(sides, C: int):
    """``sides``: tuple of (operand_blocks, passes) for the row and/or col
    gather actually present; the kernel multiplies the gathered values."""

    def kernel(*refs):
        # refs: [ids_ref, split_ref] per side, then out_ref
        out_ref = refs[-1]
        for s in range(_CPB):
            acc = None
            for k, (nb, passes) in enumerate(sides):
                ids_ref = refs[2 * k]
                op_ref = refs[2 * k + 1]
                ids = ids_ref[s:s + 1, :]                     # (1, C) int32
                hi = ids >> 7
                lo = ids & 127
                hiota = jax.lax.broadcasted_iota(jnp.int32, (nb, C), 0)
                hot = (hiota == hi).astype(jnp.bfloat16)      # (nb, C)
                dn = (((0,), (0,)), ((), ()))
                g = jnp.zeros((_LANES, C), jnp.float32)
                for p in range(passes):
                    g = g + jax.lax.dot_general(
                        op_ref[p], hot, dn,
                        preferred_element_type=jnp.float32)   # (128, C)
                liota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, C), 0)
                val = jnp.sum(jnp.where(liota == lo, g, 0.0),
                              axis=0, keepdims=True)          # (1, C)
                acc = val if acc is None else acc * val
            out_ref[s:s + 1, :] = acc

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=('nse', 'sides_static', 'interpret'))
def _pair_impl(ids_list, ops_list, *, nse, sides_static, interpret):
    n_chunks = _ceil_to(max(nse, 1), _C * _CPB) // _C
    total = n_chunks * _C

    in_specs = []
    args = []
    for (nb, passes), ids, op in zip(sides_static, ids_list, ops_list):
        ids_p = jnp.full((total,), -1, jnp.int32).at[:nse].set(
            ids.astype(jnp.int32)).reshape(n_chunks, _C)
        args.append(ids_p)
        in_specs.append(pl.BlockSpec((_CPB, _C), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        op_pad = jnp.zeros((nb * _LANES,), jnp.float32).at[
            :op.shape[0]].set(op.astype(jnp.float32)).reshape(nb, _LANES)
        splits = jnp.stack(bf16_split(op_pad, passes))  # (passes, nb, 128)
        args.append(splits)
        in_specs.append(pl.BlockSpec((passes, nb, _LANES),
                                     lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(sides_static, _C),
        grid=(n_chunks // _CPB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_CPB, _C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, _C), jnp.float32),
        compiler_params=pallas_tpu_params(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(*args)
    return out.reshape(-1)[:nse]


def pair_gather_product(rows, cols, s, x, *,
                        s_passes: int = 3, x_passes: int = 3,
                        platform: Optional[str] = None):
    """``out[e] = s[rows[e]] * x[cols[e]]`` (f32), or ``None`` outside the
    kernel envelope (fall back to the XLA gathers).

    Either side may be ``None`` to skip that gather (dt2t's single-gather
    broadcast): pass ``rows=None, s=None`` for a pure column gather and
    vice versa. ``*_passes``: bf16 split depth of that operand (3 = exact
    f32; 1 suffices for 0/1 event gates). ``rows``/``cols`` may be traced;
    ``-1`` entries yield exact zeros.
    """
    sides = []
    ids_list = []
    ops_list = []
    if s is not None:
        if jnp.dtype(s.dtype) == jnp.float64:
            return None
        nb = max(1, _ceil_to(s.shape[0], _LANES) // _LANES)
        sides.append((_ceil_to(nb, 8), s_passes))
        ids_list.append(rows)
        ops_list.append(s)
    if x is not None:
        if jnp.dtype(x.dtype) == jnp.float64:
            return None
        nb = max(1, _ceil_to(x.shape[0], _LANES) // _LANES)
        sides.append((_ceil_to(nb, 8), x_passes))
        ids_list.append(cols)
        ops_list.append(x)
    if not sides:
        raise ValueError('pair_gather_product needs at least one side')
    if sum(nb for nb, _ in sides) > _MAX_BLOCKS:
        return None
    nse = ids_list[0].shape[0]
    if any(i.shape[0] != nse for i in ids_list):
        raise ValueError('rows/cols length mismatch')
    if nse == 0:
        return jnp.zeros((0,), jnp.float32)
    return _pair_impl(tuple(ids_list), tuple(ops_list), nse=nse,
                      sides_static=tuple(sides),
                      interpret=interpret_mode(platform))
