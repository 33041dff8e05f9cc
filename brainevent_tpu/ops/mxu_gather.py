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

"""Blocked one-hot MXU gather: float sparse products without gather hardware.

XLA's TPU gather/scatter costs ~14 ns/element (serialized — BENCH_NOTES.md),
which makes the float CSR/ELL products (``csrmv``, ``fcnmv``, the AD backbone
of every event primitive, reference ``brainevent/_csr/float.py`` /
``float_csrmv.cu``) orders of magnitude slower than the hardware allows.
This module replaces the per-element gather with MXU contractions over a
STATIC blocked layout:

1. **Plan** (host, NumPy, built once per sparsity structure): sort the flat
   synapse list by ``(row_block, column_window)`` with WB-aligned column
   windows, chop into C-entry chunks, and pack each entry's
   ``(column_window-local block, lane, block-local row)`` into one int32.
2. **Kernel** (Pallas, grid = chunks): per chunk,
   - block-row gather on the MXU: ``G = slabᵀ @ Bhot`` where ``Bhot`` is the
     one-hot of each entry's window-local column block — one-hots are exact
     in bf16, and the operand is pre-split into bf16 hi/lo halves, so two
     full-rate bf16 passes reconstruct the f32 gather EXACTLY;
   - lane select on the VPU: ``val[e] = Σ_l G[l,e] · (l == lane[e])``;
   - row reduce on the MXU: ``out_rb += (w·val) @ Rowhotᵀ`` (NT dot, hi/lo
     split again so the f32 contributions are not rounded to bf16).

Per-element cost: ~2·(WB·128 + R) bf16 MACs (MXU) + ~(WB + 128 + R) compares
(VPU) — at the default knobs ≈ 400 VPU ops/element, ~30x faster than the
14 ns/element XLA floor and accuracy-equivalent to an f32 segment-sum.

The layout is the TPU counterpart of the reference's lazy CSC mirror + perm
(``brainevent/_csr/main.py:1321-1359``): structure-derived, built lazily,
cached on the data structure. Weight values must be presented in plan order
(``GatherPlan.sort_data``); training loops hoist that permutation out of
their scan exactly like the training model's mirror trick
(``models/training.py``).
"""

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from .core import XLACustomKernel
from .pallas_utils import interpret_mode

__all__ = [
    'GatherPlan', 'build_gather_plan', 'plan_from_csr', 'plan_from_ell',
    'gather_matvec', 'gather_matvec_xla', 'mxu_gather_mv_p', 'plan_matvec',
    'plan_matvec_dw', 'matvec_dw_xla', 'plan_inverse_perm',
    'plan_aux', 'plan_matvec_vjp',
    'build_mm_plan', 'gather_matmat', 'gather_matmat_xla',
    'plan_matmat_vjp',
]

_LANES = 128
_VMEM_BUDGET = 96 * 1024 * 1024

# packed metadata bit layout (must match the decode in the kernel)
_COL_BITS = 7      # lane within the 128-column block
_ROW_BITS = 10     # block-local row  -> row_block <= 1024
_BLK_BITS = 8      # window-local column block -> win_blocks <= 256

# Mosaic requires block shapes (8k, 128m); each program therefore covers
# _CPB chunks (the plan pads every row-block's chunk count to x_CPB so all
# of a program's chunks share one output block).
_CPB = 8


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _ceil_to_arr(x, m: int):
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GatherPlan:
    """Static blocked layout of one sparsity structure.

    Device arrays (pytree leaves): ``meta (n_chunks, C) int32`` packed
    per-entry metadata, ``b0 (n_chunks,)`` window starts (in 128-column
    blocks), ``rb (n_chunks,)`` row-block ids (non-decreasing),
    ``perm (n_chunks, C) int32`` flat-nnz source index (-1 = padding).
    """
    meta: jax.Array
    b0: jax.Array
    rb: jax.Array
    perm: jax.Array
    shape: Tuple[int, int]
    nse: int
    chunk: int
    row_block: int
    win_blocks: int
    n_rb: int
    nbp: int              # padded number of 128-column blocks

    def tree_flatten(self):
        leaves = (self.meta, self.b0, self.rb, self.perm)
        aux = (self.shape, self.nse, self.chunk, self.row_block,
               self.win_blocks, self.n_rb, self.nbp)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def n_chunks(self) -> int:
        return self.meta.shape[0]

    def sort_data(self, data: jax.Array) -> jax.Array:
        """Permute flat nnz ``data`` into plan order → ``(n_chunks, C)``.

        One gather per call — hoist out of inner loops (the mirror trick,
        ``models/training.py``); zero-filled at padding slots. Homogeneous
        ``data`` of shape ``(1,)`` broadcasts without a gather.
        """
        valid = self.perm >= 0
        if data.shape == (1,):
            return jnp.where(valid, data[0].astype(jnp.float32), 0.0)
        flat = data.reshape(-1).astype(jnp.float32)
        if flat.shape[0] == 0:
            return jnp.zeros(self.perm.shape, jnp.float32)
        return jnp.where(valid, flat[jnp.clip(self.perm, 0)], 0.0)


def build_gather_plan(rows, cols, shape: Tuple[int, int], *,
                      chunk: int = 1024, row_block: int = 1024,
                      win_blocks: int = 32) -> GatherPlan:
    """Build the blocked layout for flat COO-style ``(rows, cols)``.

    Fully vectorized (no Python loop over nnz): column windows are
    WB-ALIGNED, so the (row_block, window) group of every entry is a pure
    elementwise key and chunking is a group-local ``arange // C``.

    Defaults are the v5e sweep winners (``scripts/tpu_plan_sweep.py`` +
    ``tpu_plan_csr10k_hi.py``, relay-corrected): (1024, 1024, 32)
    measures 10.6 ms/call at the 10M-synapse ELL (6.9 ms with
    ``passes=2``) vs 15.3 ms for (512, 256, 16), and 843 us (566 us at
    ``passes=2``) at the (10k, 10k, 1%) CSR row — 9.0-13.3x over the
    same-day XLA ``csrmv`` (BENCH_NOTES "GatherPlan sweep").
    """
    assert row_block <= (1 << _ROW_BITS), row_block
    assert row_block % _LANES == 0, row_block
    assert win_blocks <= (1 << _BLK_BITS), win_blocks
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    M, N = shape
    E = rows.shape[0]
    nb = -(-N // _LANES)
    nbp = _ceil_to(max(nb, win_blocks), win_blocks)
    n_rb = max(1, -(-M // row_block))

    if E == 0:
        z2 = jnp.zeros((_CPB, chunk), jnp.int32)
        z1 = jnp.zeros((_CPB,), jnp.int32)
        return GatherPlan(z2, z1, z1,
                          jnp.full((_CPB, chunk), -1, jnp.int32),
                          (M, N), 0, chunk, row_block, win_blocks, n_rb, nbp)

    blk = cols // _LANES
    rbid = rows // row_block
    win = blk // win_blocks
    order = np.lexsort((cols, win, rbid))
    rbid_s = rbid[order]
    win_s = win[order]
    group = rbid_s * (nbp // win_blocks) + win_s
    # index within the (rb, window) group
    grp_change = np.empty(E, bool)
    grp_change[0] = True
    grp_change[1:] = group[1:] != group[:-1]
    grp_start = np.maximum.accumulate(np.where(grp_change, np.arange(E), 0))
    within = np.arange(E) - grp_start
    chunk_key = group * (E // chunk + 2) + within // chunk
    # chunk ids, densely renumbered in order
    ck_change = np.empty(E, bool)
    ck_change[0] = True
    ck_change[1:] = chunk_key[1:] != chunk_key[:-1]
    chunk_id = np.cumsum(ck_change) - 1
    n_chunks = int(chunk_id[-1]) + 1
    slot = within % chunk

    col_local = (cols[order] % _LANES).astype(np.int64)
    row_local = (rows[order] % row_block).astype(np.int64)
    blk_rel = (blk[order] - win_s * win_blocks).astype(np.int64)
    packed = (col_local | (row_local << _COL_BITS)
              | (blk_rel << (_COL_BITS + _ROW_BITS))).astype(np.int32)

    meta = np.zeros((n_chunks, chunk), np.int32)
    perm = np.full((n_chunks, chunk), -1, np.int32)
    meta[chunk_id, slot] = packed
    perm[chunk_id, slot] = order.astype(np.int32)
    first_of_chunk = np.full(n_chunks, E, np.int64)
    np.minimum.at(first_of_chunk, chunk_id, np.arange(E))
    b0 = (win_s[first_of_chunk] * win_blocks).astype(np.int32)
    rb_arr = rbid_s[first_of_chunk].astype(np.int32)

    # pad every row-block's chunk run to a multiple of _CPB so one program
    # (which covers _CPB consecutive chunks) never straddles output blocks
    rb_present, rb_counts = np.unique(rb_arr, return_counts=True)
    padded_counts = _ceil_to_arr(rb_counts, _CPB)
    total = int(padded_counts.sum())
    new_off = np.concatenate([[0], np.cumsum(padded_counts)])[:-1]
    old_off = np.concatenate([[0], np.cumsum(rb_counts)])[:-1]
    pos = (np.arange(n_chunks)
           - np.repeat(old_off, rb_counts)
           + np.repeat(new_off, rb_counts))
    meta_p = np.zeros((total, chunk), np.int32)
    perm_p = np.full((total, chunk), -1, np.int32)
    b0_p = np.zeros(total, np.int32)
    rb_p = np.repeat(rb_present, padded_counts).astype(np.int32)
    meta_p[pos] = meta
    perm_p[pos] = perm
    b0_p[pos] = b0

    return GatherPlan(
        jnp.asarray(meta_p), jnp.asarray(b0_p), jnp.asarray(rb_p),
        jnp.asarray(perm_p), (M, N), E, chunk, row_block, win_blocks,
        n_rb, nbp)


def plan_from_csr(indices, indptr, shape, **kw) -> GatherPlan:
    """Plan for a CSR structure (host arrays)."""
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    rows = np.repeat(np.arange(shape[0]), np.diff(indptr))
    return build_gather_plan(rows, indices, shape, **kw)


def plan_from_ell(ell_indices, shape, **kw) -> GatherPlan:
    """Plan for an ELL table ``(n_rows, K)`` of column ids; flat order is
    row-major, matching ``data.reshape(-1)`` of an ``(n_rows, K)`` table."""
    ell_indices = np.asarray(ell_indices)
    n_rows, K = ell_indices.shape
    rows = np.repeat(np.arange(n_rows), K)
    return build_gather_plan(rows, ell_indices.reshape(-1), shape, **kw)


# =============================================================================
# XLA reference implementation (oracle; any backend)
# =============================================================================

def gather_matvec_xla(plan: GatherPlan, w_sorted, x):
    """Decode the plan with XLA gathers — the correctness oracle."""
    m = plan.meta
    col = m & ((1 << _COL_BITS) - 1)
    row = (m >> _COL_BITS) & ((1 << _ROW_BITS) - 1)
    blk = (m >> (_COL_BITS + _ROW_BITS)) & ((1 << _BLK_BITS) - 1)
    gcol = (plan.b0[:, None] + blk) * _LANES + col
    grow = plan.rb[:, None] * plan.row_block + row
    xv = jnp.where(plan.perm >= 0,
                   x[jnp.clip(gcol, 0, plan.shape[1] - 1)], 0.0)
    out = jnp.zeros(plan.n_rb * plan.row_block, jnp.float32)
    out = out.at[grow.reshape(-1)].add(
        (w_sorted * xv).reshape(-1), mode='drop')
    return out[: plan.shape[0]]


# =============================================================================
# Pallas kernel
# =============================================================================

# canonical home: ops/scatter.py (shared with the one-hot scatter engines)
from .scatter import bf16_split as _bf16_split  # noqa: E402


def _make_kernel(C: int, R: int, WB: int, passes: int):
    S = R // _LANES               # sublanes of the output block

    def kernel(b0_ref, rb_ref, meta_ref, w_ref, xs_ref, out_ref):
        pid = pl.program_id(0)
        part = jnp.zeros((S, _LANES), jnp.float32)

        for s in range(_CPB):     # the _CPB chunks this program covers
            ch = pid * _CPB + s
            # windows are WB-aligned by construction; tell Mosaic so the
            # dynamic sublane slice below is provably tile-aligned
            b0 = pl.multiple_of(b0_ref[ch], WB)
            meta = meta_ref[s:s + 1, :]                      # (1, C) int32
            col = meta & ((1 << _COL_BITS) - 1)
            row = (meta >> _COL_BITS) & ((1 << _ROW_BITS) - 1)
            blk = ((meta >> (_COL_BITS + _ROW_BITS))
                   & ((1 << _BLK_BITS) - 1))

            # window-local block one-hot (WB, C): exact in bf16
            biota = jax.lax.broadcasted_iota(jnp.int32, (WB, C), 0)
            bhot = (biota == blk).astype(jnp.bfloat16)
            # block-row gather on the MXU: `passes` full-rate bf16 passes
            # over the pre-split operand (3 passes reconstruct f32 exactly)
            dn = (((0,), (0,)), ((), ()))
            g = jnp.zeros((_LANES, C), jnp.float32)
            for p in range(passes):
                slab = xs_ref[p, pl.ds(b0, WB), :]           # (WB, 128) bf16
                g = g + jax.lax.dot_general(
                    slab, bhot, dn, preferred_element_type=jnp.float32)
            # lane select on the VPU                          (128, C)
            liota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, C), 0)
            lhot = (liota == col).astype(jnp.float32)
            val = jnp.sum(g * lhot, axis=0, keepdims=True)    # (1, C)
            contrib = w_ref[s:s + 1, :] * val                 # (1, C) f32
            # row reduce on the MXU, decomposed (sublane, lane): spread
            # contributions over S sublane rows by row>>7, then one NT dot
            # against the lane one-hot; bf16-split keeps f32 accuracy
            siota = jax.lax.broadcasted_iota(jnp.int32, (S, C), 0)
            c_s = jnp.where(siota == (row >> 7), contrib, 0.0)  # (S, C)
            riota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, C), 0)
            rhot = (riota == (row & (_LANES - 1))).astype(jnp.bfloat16)
            nt = (((1,), (1,)), ((), ()))
            for c_p in _bf16_split(c_s, passes):
                part = part + jax.lax.dot_general(
                    c_p, rhot, nt, preferred_element_type=jnp.float32)

        prev = rb_ref[jnp.maximum(pid * _CPB - 1, 0)]
        first = jnp.logical_or(pid == 0, rb_ref[pid * _CPB] != prev)

        @pl.when(first)
        def _():
            out_ref[0] = part

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0] = out_ref[0] + part

    return kernel


@functools.partial(jax.jit, static_argnames=('interpret', 'passes'))
def _gather_matvec_impl(plan: GatherPlan, w_sorted, x, interpret: bool,
                        passes: int):
    C, R, WB = plan.chunk, plan.row_block, plan.win_blocks
    nbp = plan.nbp
    x_pad = jnp.zeros(nbp * _LANES, jnp.float32).at[: x.shape[0]].set(
        x.astype(jnp.float32))
    x2 = x_pad.reshape(nbp, _LANES)
    xs = jnp.stack(_bf16_split(x2, passes))        # (passes, nbp, 128) bf16

    S = R // _LANES
    grid = (plan.n_chunks // _CPB,)
    out = pl.pallas_call(
        _make_kernel(C, R, WB, passes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_CPB, C), lambda p, b0, rb: (p, 0)),
                pl.BlockSpec((_CPB, C), lambda p, b0, rb: (p, 0)),
                pl.BlockSpec((passes, nbp, _LANES),
                             lambda p, b0, rb: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, S, _LANES),
                                   lambda p, b0, rb: (rb[p * _CPB], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_rb, S, _LANES), jnp.float32),
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
        interpret=interpret,
    )(plan.b0, plan.rb, plan.meta, w_sorted, xs)
    return out.reshape(-1)[: plan.shape[0]]


def gather_matvec(plan: GatherPlan, w_sorted, x,
                  *, force_xla: Optional[bool] = None, passes: int = 3):
    """``out[r] = Σ_{e in row r} w[e] · x[col[e]]`` over the plan's structure.

    ``w_sorted`` must be ``plan.sort_data(data)`` output. ``passes`` is the
    bf16 split depth of both MXU contractions (3 = exact f32; 2 trades
    ~2^-16 relative error for one fewer MXU pass). Falls back to the XLA
    oracle when the operand exceeds the VMEM budget or on request.
    """
    if force_xla is None:
        # operand slabs + metadata/weights blocks must fit VMEM
        force_xla = plan.nbp * _LANES * 2 * passes > _VMEM_BUDGET // 2
    if force_xla:
        return gather_matvec_xla(plan, w_sorted, x)
    return _gather_matvec_impl(plan, w_sorted, x, interpret_mode(), passes)


# =============================================================================
# Primitive registration: the MXU route as a first-class backend
# =============================================================================

def _plan_of(params) -> GatherPlan:
    """Reconstruct a (perm-free) plan view from primitive bind params."""
    return GatherPlan(
        None, None, None, None, params['shape'], params['nse'],
        params['chunk'], params['row_block'], params['win_blocks'],
        params['n_rb'], params['nbp'])


def _mxu_mv_jax_kernel(**params):
    """Decode-based XLA formulation (oracle backend).

    Padding entries carry ``w_sorted == 0`` so they contribute nothing
    (their clamped gathers read real-but-ignored values of ``x``).
    """
    p = _plan_of(params)

    def kernel(meta, b0, rb, w_sorted, x):
        col = meta & ((1 << _COL_BITS) - 1)
        row = (meta >> _COL_BITS) & ((1 << _ROW_BITS) - 1)
        blk = (meta >> (_COL_BITS + _ROW_BITS)) & ((1 << _BLK_BITS) - 1)
        gcol = (b0[:, None] + blk) * _LANES + col
        grow = rb[:, None] * p.row_block + row
        xv = x.astype(jnp.float32)[jnp.clip(gcol, 0, p.shape[1] - 1)]
        out = jnp.zeros(p.n_rb * p.row_block, jnp.float32)
        out = out.at[grow.reshape(-1)].add(
            (w_sorted * xv).reshape(-1), mode='drop')
        return (out[: p.shape[0]].astype(params['outs'][0].dtype),)

    return kernel


def _mxu_mv_pallas_kernel(platform=None, **params):
    p = _plan_of(params)

    def kernel(meta, b0, rb, w_sorted, x):
        if p.nbp * _LANES * 2 * 3 > _VMEM_BUDGET // 2:
            return None          # operand too large for VMEM residency
        plan = GatherPlan(meta, b0, rb, None, p.shape, p.nse, p.chunk,
                          p.row_block, p.win_blocks, p.n_rb, p.nbp)
        out = _gather_matvec_impl(plan, w_sorted, x,
                                  interpret_mode(platform), 3)
        return (out.astype(params['outs'][0].dtype),)

    return kernel


def _mxu_mv_jvp_w(w_dot, meta, b0, rb, w_sorted, x, **params):
    return mxu_gather_mv_p_call(meta, b0, rb, w_dot, x, **_statics(params))


def _mxu_mv_jvp_x(x_dot, meta, b0, rb, w_sorted, x, **params):
    return mxu_gather_mv_p_call(meta, b0, rb, w_sorted, x_dot,
                                **_statics(params))


def _statics(params):
    return dict(shape=params['shape'], nse=params['nse'],
                chunk=params['chunk'], row_block=params['row_block'],
                win_blocks=params['win_blocks'], n_rb=params['n_rb'],
                nbp=params['nbp'], backend=params.get('backend'))


def _mxu_mv_transpose(ct, meta, b0, rb, w_sorted, x, **params):
    """Cotangent rules via the decode formulation (correct on every
    backend; the fast transposed product needs the transposed plan, which
    lives on the data structures — ``CSR.build_mxu_plan``)."""
    from .._compat import ad
    p = _plan_of(params)
    ct = ct[0].astype(jnp.float32)
    col = meta & ((1 << _COL_BITS) - 1)
    row = (meta >> _COL_BITS) & ((1 << _ROW_BITS) - 1)
    blk = (meta >> (_COL_BITS + _ROW_BITS)) & ((1 << _BLK_BITS) - 1)
    gcol = jnp.clip((b0[:, None] + blk) * _LANES + col, 0, p.shape[1] - 1)
    grow = jnp.clip(rb[:, None] * p.row_block + row, 0, p.shape[0] - 1)
    if ad.is_undefined_primal(x):
        contrib = w_sorted * ct[grow]
        x_bar = jnp.zeros(p.shape[1], jnp.float32).at[gcol.reshape(-1)].add(
            contrib.reshape(-1), mode='drop')
        return meta, b0, rb, w_sorted, x_bar
    w_bar = x.astype(jnp.float32)[gcol] * ct[grow]
    return meta, b0, rb, w_bar, x


mxu_gather_mv_p = XLACustomKernel(
    'mxu_gather_mv',
    doc='Blocked one-hot MXU gather matvec over a static GatherPlan layout '
        '— the fast float formulation behind CSR/ELL products '
        '(reference float path: brainevent/_csr/float.py, float_csrmv.cu).',
)
mxu_gather_mv_p.def_jax_kernel(_mxu_mv_jax_kernel)
mxu_gather_mv_p.def_pallas_kernel(_mxu_mv_pallas_kernel, asdefault=True)
mxu_gather_mv_p.def_jvp_rule2(None, None, None, _mxu_mv_jvp_w, _mxu_mv_jvp_x)
mxu_gather_mv_p.def_transpose_rule(_mxu_mv_transpose)
mxu_gather_mv_p.def_general_batching()
mxu_gather_mv_p.def_tags('csr', 'fcn', 'float', 'mv', 'mxu')


def mxu_gather_mv_p_call(meta, b0, rb, w_sorted, x, *, shape, nse, chunk,
                         row_block, win_blocks, n_rb, nbp,
                         backend: Optional[str] = None):
    """Bind the primitive on explicit plan arrays (see :func:`plan_matvec`
    for the ergonomic entry point)."""
    return mxu_gather_mv_p(
        meta, b0, rb, w_sorted, x.astype(jnp.float32),
        outs=[jax.ShapeDtypeStruct((shape[0],), jnp.float32)],
        shape=tuple(shape), nse=int(nse), chunk=int(chunk),
        row_block=int(row_block), win_blocks=int(win_blocks),
        n_rb=int(n_rb), nbp=int(nbp), backend=backend)


mxu_gather_mv_p.def_call(mxu_gather_mv_p_call)


def plan_matvec(plan: GatherPlan, w_sorted, x,
                backend: Optional[str] = None):
    """Differentiable MXU gather matvec through the registered primitive."""
    (out,) = mxu_gather_mv_p_call(
        plan.meta, plan.b0, plan.rb, w_sorted, x,
        shape=plan.shape, nse=plan.nse, chunk=plan.chunk,
        row_block=plan.row_block, win_blocks=plan.win_blocks,
        n_rb=plan.n_rb, nbp=plan.nbp, backend=backend)
    return out


def plan_aux(plan: GatherPlan) -> Tuple:
    """Static (hashable) view of a plan's layout, for LRU-cached makers."""
    return (plan.shape, plan.nse, plan.chunk, plan.row_block,
            plan.win_blocks, plan.n_rb, plan.nbp)


@functools.lru_cache(maxsize=None)
def _make_plan_mv_vjp(aux_f: Tuple, aux_b: Tuple, passes: int):
    """Matvec through a cached plan PAIR with a fast vector cotangent.

    Forward: ``y = gather_matvec(plan_f, w_f, v)``. Backward w.r.t. ``v``:
    the product over the TRANSPOSED plan, ``v_bar = gather_matvec(plan_b,
    w_b, ct)`` — both directions ride the MXU kernel, so ``jax.grad``
    through a class-level float product costs two plan kernels instead of
    XLA's 14 ns/element gather/scatter pair (measured at (10k,10k,1%):
    1.7 ms vs 21.1 ms for grad-through-``csrmv``, BENCH_NOTES r4).

    The weight operands are NON-differentiable here (zero cotangent): this
    route serves products whose weights are concrete cached views (the
    lazy-plan class route, ``csr/main.py``); traced-weight gradients stay
    on the XLA primitive, whose per-call nnz<->plan permutation would cost
    MORE than the XLA route it replaces (measured 7.4 ms/1M-element perm
    gather — BENCH_NOTES r4 "MXU permutation plans are a dead end").
    Training loops that need fast weight gradients hoist the permutation
    out of their scan instead (``models/training.py``).
    """

    def _f0(x):
        return np.zeros(np.shape(x), jax.dtypes.float0)

    @jax.custom_vjp
    def mv(meta, b0, rb, metaB, b0B, rbB, w_f, w_b, v):
        plan_f = GatherPlan(meta, b0, rb, None, *aux_f)
        return gather_matvec(plan_f, w_f, v, passes=passes)

    def fwd(meta, b0, rb, metaB, b0B, rbB, w_f, w_b, v):
        out = mv(meta, b0, rb, metaB, b0B, rbB, w_f, w_b, v)
        return out, (meta, b0, rb, metaB, b0B, rbB, w_f, w_b, v)

    def bwd(res, ct):
        meta, b0, rb, metaB, b0B, rbB, w_f, w_b, v = res
        plan_b = GatherPlan(metaB, b0B, rbB, None, *aux_b)
        v_bar = gather_matvec(plan_b, w_b, ct.astype(jnp.float32),
                              passes=passes).astype(v.dtype)
        return (_f0(meta), _f0(b0), _f0(rb), _f0(metaB), _f0(b0B),
                _f0(rbB), jnp.zeros_like(w_f), jnp.zeros_like(w_b), v_bar)

    mv.defvjp(fwd, bwd)
    return mv


def plan_matvec_vjp(plan_f: GatherPlan, plan_b: GatherPlan,
                    w_f, w_b, v, *, passes: int = 3):
    """Differentiable (w.r.t. ``v``) matvec over a cached plan pair.

    ``plan_b``/``w_b`` must describe the TRANSPOSED structure of
    ``plan_f``/``w_f`` (same nnz set with rows and columns swapped), so
    the vector cotangent is exact. See :func:`_make_plan_mv_vjp`.
    """
    fn = _make_plan_mv_vjp(plan_aux(plan_f), plan_aux(plan_b), passes)
    return fn(plan_f.meta, plan_f.b0, plan_f.rb,
              plan_b.meta, plan_b.b0, plan_b.rb, w_f, w_b, v)


def _mxu_mv_benchmark_data(*, platform):
    from .benchmark import BenchmarkConfig
    rng = np.random.default_rng(0)
    configs = []
    for n, conn in ((1000, 0.01), (1000, 0.1), (10000, 0.01)):
        nse = int(n * n * conn)
        rows = np.sort(rng.integers(0, n, nse))
        cols = rng.integers(0, n, nse)
        plan = build_gather_plan(rows, cols, (n, n))
        w = plan.sort_data(jnp.asarray(rng.normal(size=nse), jnp.float32))
        x = jnp.asarray(rng.normal(size=n), jnp.float32)
        configs.append(BenchmarkConfig(
            f'n={n},conn={conn}',
            (plan.meta, plan.b0, plan.rb, w, x),
            dict(shape=(n, n), nse=nse, chunk=plan.chunk,
                 row_block=plan.row_block, win_blocks=plan.win_blocks,
                 n_rb=plan.n_rb, nbp=plan.nbp),
            loop_arg=-1))
    return configs


mxu_gather_mv_p.def_benchmark_data(_mxu_mv_benchmark_data)


# =============================================================================
# Fused matvec + per-element pair product (the training backward kernel)
# =============================================================================

def plan_inverse_perm(plan: GatherPlan) -> jax.Array:
    """``inv (nse,) int32``: the plan slot (flat ``n_chunks*C`` index) of
    every flat-nnz element.  ``data_sorted.reshape(-1)[inv]`` is the
    inverse of :meth:`GatherPlan.sort_data` — a GATHER, so cotangents in
    plan order come back to nnz order without a scatter."""
    flat_perm = plan.perm.reshape(-1)
    slots = jnp.arange(flat_perm.shape[0], dtype=jnp.int32)
    inv = jnp.zeros((plan.nse,), jnp.int32)
    # padding slots carry perm == -1: route them out of bounds so the
    # 'drop' mode discards them instead of clobbering inv[0]
    idx = jnp.where(flat_perm >= 0, flat_perm, plan.nse)
    return inv.at[idx].set(slots, mode='drop')


def _make_mvdw_kernel(C: int, R: int, WB: int, passes: int):
    """Like :func:`_make_kernel` plus a second per-element output:
    ``dw[e] = s[row_e] * x[col_e]`` (``s`` gathered from a dense per-row
    operand on the MXU, sharing the lane one-hot with the x gather)."""
    S = R // _LANES

    def kernel(b0_ref, rb_ref, meta_ref, w_ref, xs_ref, srows_ref,
               out_ref, dw_ref):
        pid = pl.program_id(0)
        part = jnp.zeros((S, _LANES), jnp.float32)

        for s in range(_CPB):
            ch = pid * _CPB + s
            b0 = pl.multiple_of(b0_ref[ch], WB)
            rb = rb_ref[ch]
            meta = meta_ref[s:s + 1, :]                      # (1, C) int32
            col = meta & ((1 << _COL_BITS) - 1)
            row = (meta >> _COL_BITS) & ((1 << _ROW_BITS) - 1)
            blk = ((meta >> (_COL_BITS + _ROW_BITS))
                   & ((1 << _BLK_BITS) - 1))

            biota = jax.lax.broadcasted_iota(jnp.int32, (WB, C), 0)
            bhot = (biota == blk).astype(jnp.bfloat16)
            dn = (((0,), (0,)), ((), ()))
            g = jnp.zeros((_LANES, C), jnp.float32)
            for p in range(passes):
                slab = xs_ref[p, pl.ds(b0, WB), :]           # (WB, 128)
                g = g + jax.lax.dot_general(
                    slab, bhot, dn, preferred_element_type=jnp.float32)
            liota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, C), 0)
            lhot = (liota == col).astype(jnp.float32)
            val = jnp.sum(g * lhot, axis=0, keepdims=True)    # (1, C)

            # ---- per-element spike gather (0/1 values: exact in bf16) --
            sslab = srows_ref[pl.ds(rb * S, S), :]            # (S, 128)
            siota_s = jax.lax.broadcasted_iota(jnp.int32, (S, C), 0)
            shot = (siota_s == (row >> 7)).astype(jnp.bfloat16)
            gs = jax.lax.dot_general(
                sslab.astype(jnp.bfloat16), shot, dn,
                preferred_element_type=jnp.float32)           # (128, C)
            # row-LANE one-hot (row & 127), distinct from the x gather's
            # column-lane one-hot above
            rlhot = (liota == (row & (_LANES - 1))).astype(jnp.float32)
            sval = jnp.sum(gs * rlhot, axis=0, keepdims=True)  # (1, C)
            dw_ref[s:s + 1, :] = sval * val

            contrib = w_ref[s:s + 1, :] * val                 # (1, C)
            siota = jax.lax.broadcasted_iota(jnp.int32, (S, C), 0)
            c_s = jnp.where(siota == (row >> 7), contrib, 0.0)
            riota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, C), 0)
            rhot = (riota == (row & (_LANES - 1))).astype(jnp.bfloat16)
            nt = (((1,), (1,)), ((), ()))
            for c_p in _bf16_split(c_s, passes):
                part = part + jax.lax.dot_general(
                    c_p, rhot, nt, preferred_element_type=jnp.float32)

        prev = rb_ref[jnp.maximum(pid * _CPB - 1, 0)]
        first = jnp.logical_or(pid == 0, rb_ref[pid * _CPB] != prev)

        @pl.when(first)
        def _():
            out_ref[0] = part

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0] = out_ref[0] + part

    return kernel


def _srows_layout(plan: GatherPlan, s_vec: jax.Array) -> jax.Array:
    """Per-row operand as the ``(n_rb*S, 128)`` sublane grid the kernel
    indexes by ``rb`` (row blocks of ``row_block`` rows)."""
    S = plan.row_block // _LANES
    total = plan.n_rb * plan.row_block
    sp = jnp.zeros((total,), jnp.float32).at[: s_vec.shape[0]].set(
        s_vec.astype(jnp.float32))
    return sp.reshape(plan.n_rb * S, _LANES)


@functools.partial(jax.jit, static_argnames=('interpret', 'passes'))
def _matvec_dw_impl(plan: GatherPlan, w_sorted, s_vec, x, interpret: bool,
                    passes: int):
    C, R, WB = plan.chunk, plan.row_block, plan.win_blocks
    nbp = plan.nbp
    x_pad = jnp.zeros(nbp * _LANES, jnp.float32).at[: x.shape[0]].set(
        x.astype(jnp.float32))
    x2 = x_pad.reshape(nbp, _LANES)
    xs = jnp.stack(_bf16_split(x2, passes))
    srows = _srows_layout(plan, s_vec)

    S = R // _LANES
    grid = (plan.n_chunks // _CPB,)
    y, dw = pl.pallas_call(
        _make_mvdw_kernel(C, R, WB, passes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_CPB, C), lambda p, b0, rb: (p, 0)),
                pl.BlockSpec((_CPB, C), lambda p, b0, rb: (p, 0)),
                pl.BlockSpec((passes, nbp, _LANES),
                             lambda p, b0, rb: (0, 0, 0)),
                pl.BlockSpec((plan.n_rb * S, _LANES),
                             lambda p, b0, rb: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, S, _LANES),
                             lambda p, b0, rb: (rb[p * _CPB], 0, 0)),
                pl.BlockSpec((_CPB, C), lambda p, b0, rb: (p, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((plan.n_rb, S, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((plan.n_chunks, C), jnp.float32),
        ),
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
        interpret=interpret,
    )(plan.b0, plan.rb, plan.meta, w_sorted, xs, srows)
    return y.reshape(-1)[: plan.shape[0]], dw


def matvec_dw_xla(plan: GatherPlan, w_sorted, s_vec, x):
    """XLA decode oracle for :func:`plan_matvec_dw`."""
    m = plan.meta
    col = m & ((1 << _COL_BITS) - 1)
    row = (m >> _COL_BITS) & ((1 << _ROW_BITS) - 1)
    blk = (m >> (_COL_BITS + _ROW_BITS)) & ((1 << _BLK_BITS) - 1)
    gcol = (plan.b0[:, None] + blk) * _LANES + col
    grow = plan.rb[:, None] * plan.row_block + row
    valid = plan.perm >= 0
    xv = jnp.where(valid,
                   x.astype(jnp.float32)[jnp.clip(gcol, 0,
                                                  plan.shape[1] - 1)], 0.0)
    sv = jnp.where(valid,
                   s_vec.astype(jnp.float32)[
                       jnp.clip(grow, 0, plan.shape[0] - 1)], 0.0)
    dw = sv * xv
    y = jnp.zeros(plan.n_rb * plan.row_block, jnp.float32).at[
        grow.reshape(-1)].add((w_sorted * xv).reshape(-1))
    return y[: plan.shape[0]], dw


def plan_matvec_dw(plan: GatherPlan, w_sorted, s_vec, x,
                   *, force_xla: Optional[bool] = None, passes: int = 3):
    """Fused backward products of one sparsity structure, sharing a single
    MXU x-gather:

    - ``y[r]  = sum_{e in row r} w_sorted[e] * x[col_e]``  (row matvec)
    - ``dw[e] = s_vec[row_e] * x[col_e]``  (per-element pair product, in
      plan order — :func:`plan_inverse_perm` brings it back to nnz order)

    ``dw`` values at PADDING slots (``plan.perm < 0``) are undefined
    (padding metadata decodes to element (0, 0)); read ``dw`` only
    through the inverse permutation, which touches valid slots alone.

    This is the surrogate-training backward: ``x`` = the recurrent
    cotangent, ``s_vec`` = the step's spikes, ``y`` = dspk, ``dw`` = the
    weight gradient — rate-independent, no 14 ns/element XLA gathers
    (``models/training.py``; reference surrogate-linear contract
    ``brainevent/_csr/binary.py:656``)."""
    if force_xla is None:
        force_xla = plan.nbp * _LANES * 2 * passes > _VMEM_BUDGET // 2
    if force_xla:
        return matvec_dw_xla(plan, w_sorted, s_vec, x)
    return _matvec_dw_impl(plan, w_sorted, s_vec, x, interpret_mode(),
                           passes)


# =============================================================================
# Batched (mat-mat) MXU gather: the plan-based fast mm kernel
# =============================================================================
#
# ``out = A @ X`` with ``A`` sparse (the plan's structure) and ``X`` a
# ``(N, B)`` batch operand — the reference's first-class 5k/10k csrmm grid
# (``brainevent/_csr/binary.py:757-824``) at MXU rate instead of the
# 14 ns/element XLA gather floor. Design (BENCH_NOTES r5):
#
# - mm-tuned plan knobs ``(chunk=256, row_block=128, win_blocks=1)``: one
#   (128-row, 128-col) tile per chunk (v5e A/B: C=256 beats C=128 — wider
#   N on the stage-1 dot and half the programs: 1.85 vs 2.92 ms at
#   passes=2 on the 10k row).
# - the whole bf16-split operand stays VMEM-resident (``(passes, Np, Bp)``;
#   15.7 MB at the 10k/B=256 row) — per chunk the kernel reads a (128, Bp)
#   slab at a dynamic sublane offset, no HBM traffic in the loop.
# - per chunk: ``G(Bp, C) = Σ_p slab_pᵀ @ ghot`` (column one-hot, exact in
#   bf16), ``contrib = G ⊙ w``, ``acc(Bp, R) += Σ_q contrib_q @ rhotᵀ``
#   (row one-hot) — ~(passes+passes)·128·B MACs per entry ≈ 196k at B=256
#   exact-f32, ~1.3 ms at the (10k, 10k, 1%, B=256) row at MXU peak.

_MM_CHUNK = 256
_MM_RB = 128
_MM_WB = 1


def build_mm_plan(rows, cols, shape, *, chunk: int = _MM_CHUNK,
                  row_block: int = _MM_RB,
                  win_blocks: int = _MM_WB) -> GatherPlan:
    """Gather plan with the mm-tuned tile knobs (see module notes)."""
    return build_gather_plan(rows, cols, shape, chunk=chunk,
                             row_block=row_block, win_blocks=win_blocks)


def gather_matmat_xla(plan: GatherPlan, w_sorted, X):
    """Decode the plan with XLA gathers — the mm correctness oracle."""
    m = plan.meta
    col = m & ((1 << _COL_BITS) - 1)
    row = (m >> _COL_BITS) & ((1 << _ROW_BITS) - 1)
    blk = (m >> (_COL_BITS + _ROW_BITS)) & ((1 << _BLK_BITS) - 1)
    gcol = (plan.b0[:, None] + blk) * _LANES + col
    grow = plan.rb[:, None] * plan.row_block + row
    Xf = X.astype(jnp.float32)
    xv = jnp.where((plan.perm >= 0)[..., None],
                   Xf[jnp.clip(gcol, 0, plan.shape[1] - 1)], 0.0)
    out = jnp.zeros((plan.n_rb * plan.row_block, X.shape[1]), jnp.float32)
    out = out.at[grow.reshape(-1)].add(
        (w_sorted[..., None] * xv).reshape(-1, X.shape[1]), mode='drop')
    return out[: plan.shape[0]]


def _make_mm_kernel(C: int, R: int, WB: int, Bp: int, px: int, pq: int):
    W = WB * _LANES

    def kernel(b0_ref, rb_ref, meta_ref, w_ref, xs_ref, out_ref):
        pid = pl.program_id(0)
        acc = jnp.zeros((Bp, R), jnp.float32)

        # pass-concatenated iotas (chunk-invariant): ONE K=passes*W dot
        # per stage instead of `passes` separate dots — the mantissa
        # passes ride the contracted dimension, cutting dot issues 3x.
        # px (gather) and pq (scatter) split independently: a 0/1 event
        # operand is exact at px=1 while f32 weights still need pq=3.
        giota = jax.lax.broadcasted_iota(jnp.int32, (px * W, C), 0) % W
        riota = jax.lax.broadcasted_iota(jnp.int32, (R, pq * C), 0)

        for s in range(_CPB):
            ch = pid * _CPB + s
            off = pl.multiple_of(b0_ref[ch] * _LANES, _LANES)
            meta = meta_ref[s:s + 1, :]                      # (1, C) int32
            col = meta & ((1 << _COL_BITS) - 1)
            row = (meta >> _COL_BITS) & ((1 << _ROW_BITS) - 1)
            blk = ((meta >> (_COL_BITS + _ROW_BITS))
                   & ((1 << _BLK_BITS) - 1))
            colw = blk * _LANES + col                        # (1, C)

            # column one-hot tiled over the mantissa passes: exact bf16
            ghot = (giota == colw).astype(jnp.bfloat16)      # (px*W, C)
            slab_cat = jnp.concatenate(
                [xs_ref[p, pl.ds(off, W), :] for p in range(px)],
                axis=0)                                      # (px*W, Bp)
            dn_tn = (((0,), (0,)), ((), ()))
            g = jax.lax.dot_general(
                slab_cat, ghot, dn_tn,
                preferred_element_type=jnp.float32)          # (Bp, C)
            contrib = g * w_ref[s:s + 1, :]                  # (Bp, C) f32

            # row one-hot tiled along the contracted dim: one NT dot
            row_cat = jnp.concatenate([row] * pq, axis=1)
            rhot = (riota == row_cat).astype(jnp.bfloat16)   # (R, pq*C)
            c_cat = jnp.concatenate(_bf16_split(contrib, pq),
                                    axis=1)                  # (Bp, pq*C)
            nt = (((1,), (1,)), ((), ()))
            acc = acc + jax.lax.dot_general(
                c_cat, rhot, nt, preferred_element_type=jnp.float32)

        prev = rb_ref[jnp.maximum(pid * _CPB - 1, 0)]
        first = jnp.logical_or(pid == 0, rb_ref[pid * _CPB] != prev)

        @pl.when(first)
        def _():
            out_ref[0] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0] = out_ref[0] + acc

    return kernel


def _mm_passes(passes) -> Tuple[int, int]:
    """Normalize ``passes`` to ``(px, pq)`` — gather / scatter split
    depths. An int applies to both stages."""
    if isinstance(passes, tuple):
        px, pq = passes
    else:
        px = pq = int(passes)
    return int(px), int(pq)


def _mm_vmem_ok(plan: GatherPlan, n_batch: int, passes) -> bool:
    px, _ = _mm_passes(passes)
    Bp = _ceil_to(max(n_batch, _LANES), _LANES)
    return plan.nbp * _LANES * Bp * 2 * px <= _VMEM_BUDGET // 2


@functools.partial(jax.jit, static_argnames=('interpret', 'passes'))
def _gather_matmat_impl(plan: GatherPlan, w_sorted, X, interpret: bool,
                        passes):
    px, pq = _mm_passes(passes)
    C, R, WB = plan.chunk, plan.row_block, plan.win_blocks
    nbp = plan.nbp
    Np = nbp * _LANES
    n, B = X.shape
    Bp = _ceil_to(max(B, _LANES), _LANES)
    Xp = jnp.zeros((Np, Bp), jnp.float32).at[:n, :B].set(
        X.astype(jnp.float32))
    xs = jnp.stack(_bf16_split(Xp, px))          # (px, Np, Bp) bf16

    grid = (plan.n_chunks // _CPB,)
    out = pl.pallas_call(
        _make_mm_kernel(C, R, WB, Bp, px, pq),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_CPB, C), lambda p, b0, rb: (p, 0)),
                pl.BlockSpec((_CPB, C), lambda p, b0, rb: (p, 0)),
                pl.BlockSpec((px, Np, Bp),
                             lambda p, b0, rb: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Bp, R),
                                   lambda p, b0, rb: (rb[p * _CPB], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_rb, Bp, R), jnp.float32),
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
        interpret=interpret,
    )(plan.b0, plan.rb, plan.meta, w_sorted, xs)
    out = out.transpose(0, 2, 1).reshape(plan.n_rb * R, Bp)
    return out[: plan.shape[0], :B]


def gather_matmat(plan: GatherPlan, w_sorted, X,
                  *, force_xla: Optional[bool] = None, passes=3):
    """``out[r, :] = Σ_{e in row r} w[e] · X[col[e], :]`` over the plan.

    ``w_sorted`` must be :meth:`GatherPlan.sort_data` output. ``passes``
    is the bf16 split depth of both MXU stages (3 = exact f32, 2 trades
    ~2^-16 relative error for a third less MXU work), or a
    ``(gather, scatter)`` tuple — 0/1 EVENT operands are exact at
    ``(1, 3)`` (measured 10k/B=256 v5e: 3.7 ms exact float, 2.35 ms at
    passes=2, 1.4 ms binary). Falls back to the XLA oracle when the
    padded operand exceeds the VMEM budget.
    """
    if force_xla is None:
        force_xla = not _mm_vmem_ok(plan, X.shape[1], passes)
    if force_xla:
        return gather_matmat_xla(plan, w_sorted, X)
    return _gather_matmat_impl(plan, w_sorted, X, interpret_mode(), passes)


@functools.lru_cache(maxsize=None)
def _make_plan_mm_vjp(aux_f: Tuple, aux_b: Tuple, passes: int):
    """Mat-mat through a cached plan PAIR with a fast batch cotangent —
    the mm analog of :func:`_make_plan_mv_vjp` (same weight-view
    contract: weights are non-differentiable concrete views; the batch
    cotangent rides the TRANSPOSED plan's mm kernel)."""

    def _f0(x):
        return np.zeros(np.shape(x), jax.dtypes.float0)

    @jax.custom_vjp
    def mm(meta, b0, rb, metaB, b0B, rbB, w_f, w_b, X):
        plan_f = GatherPlan(meta, b0, rb, None, *aux_f)
        return gather_matmat(plan_f, w_f, X, passes=passes)

    def fwd(meta, b0, rb, metaB, b0B, rbB, w_f, w_b, X):
        out = mm(meta, b0, rb, metaB, b0B, rbB, w_f, w_b, X)
        return out, (meta, b0, rb, metaB, b0B, rbB, w_f, w_b, X)

    def bwd(res, ct):
        meta, b0, rb, metaB, b0B, rbB, w_f, w_b, X = res
        plan_b = GatherPlan(metaB, b0B, rbB, None, *aux_b)
        X_bar = gather_matmat(plan_b, w_b, ct.astype(jnp.float32),
                              passes=passes).astype(X.dtype)
        return (_f0(meta), _f0(b0), _f0(rb), _f0(metaB), _f0(b0B),
                _f0(rbB), jnp.zeros_like(w_f), jnp.zeros_like(w_b), X_bar)

    mm.defvjp(fwd, bwd)
    return mm


def plan_matmat_vjp(plan_f: GatherPlan, plan_b: GatherPlan,
                    w_f, w_b, X, *, passes: int = 3):
    """Differentiable (w.r.t. ``X``) mat-mat over a cached plan pair."""
    fn = _make_plan_mm_vjp(plan_aux(plan_f), plan_aux(plan_b), passes)
    return fn(plan_f.meta, plan_f.b0, plan_f.rb,
              plan_b.meta, plan_b.b0, plan_b.rb, w_f, w_b, X)
