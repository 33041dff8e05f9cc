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

"""Factory building one complete JIT-connectivity operator family.

The reference triplicates ~25k LoC across ``_jit_scalar``/``_jit_normal``/
``_jit_uniform``; here each family is one :func:`make_family` call over the
shared walk engine, differing only in its weight law:

- scalar : ``w``                                  (1 param)
- normal : ``w_loc + normal01(seed,r,c)*w_scale`` (2 params)
- uniform: ``w_low + uniform01(seed,r,c)*(w_high-w_low)`` (2 params)

Each family provides 8 primitives (materialize, mv, mm, binary mv/mm,
csr count/fill — reference §2.10) plus the high-level wrappers
(``jit*``, ``jit*mv``, ``jit*mm``, ``binary_jit*mv/mm``, ``jit*_to_csr``,
``jit*mv_dt2t``).
"""

import dataclasses
from types import SimpleNamespace
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .._compat import ad
from .._misc import (
    _MM_STRIDE, _MV_STRIDE, _initialize_conn_length, _is_static_zero,
    _normalize_chunk_size, _normalize_matrix_mode,
)
from ..ops.core import XLACustomKernel
from ..ops.util import general_batching_rule
from ..ops.benchmark import BenchmarkConfig
from ..units import maybe_unit, split_mantissa_unit
from . import engine

__all__ = ['JITCFamilySpec', 'make_family']


@dataclasses.dataclass(frozen=True)
class JITCFamilySpec:
    """Weight-law specification of one family."""
    tag: str                       # 's' / 'n' / 'u'
    name: str                      # registry tag, e.g. 'jit_normal'
    n_params: int                  # number of weight parameters
    # weight_fn(params, seed, rows_u32, cols_u32) -> f32 weights
    weight_fn: Callable
    # basis probes for the transpose rule: d/dparam_i realized by evaluating
    # the op at params = basis[i]
    param_basis: Tuple[Tuple[float, ...], ...]


def _initialize_seed(seed):
    if seed is None:
        seed = int(np.random.randint(0, 2 ** 31 - 1))
    return jnp.atleast_1d(jnp.asarray(seed, dtype=jnp.uint32))


def _prep_clen(prob_or_clen):
    """High-level ops take ``prob``; primitives take ``clen ~ 2/prob``."""
    return _initialize_conn_length(prob_or_clen)


def make_family(spec: JITCFamilySpec) -> SimpleNamespace:
    """Build all primitives + wrappers of one family; returns a namespace."""
    t = spec.tag
    npar = spec.n_params

    def wfn(params, seed):
        return lambda s, rows, cols: spec.weight_fn(params, s, rows, cols)

    def split_args(args):
        """(params..., clen, operand, seed) -> (params, clen, operand, seed)"""
        params = args[:npar]
        clen, operand, seed = args[npar], args[npar + 1], args[npar + 2]
        return params, clen, operand, seed

    def walk_dims(shape, transpose):
        out_len = shape[1] if transpose else shape[0]
        in_len = shape[0] if transpose else shape[1]
        return out_len, in_len

    # ------------------------------------------------------------------
    # materialize (jit{t}_p)
    # ------------------------------------------------------------------

    def _dense_kernel(*, shape, transpose, corder, matrix_mode='mv', **kw):
        stride = _MV_STRIDE if _normalize_matrix_mode(
            matrix_mode) == 'mv' else _MM_STRIDE

        def kernel(*args):
            params = args[:npar]
            clen, seed = args[npar], args[npar + 1]
            out_len, in_len = walk_dims(shape, transpose)
            dense = engine.walk_todense(
                wfn(params, seed), seed[0], clen[0], (out_len, in_len),
                corder=corder, stride=stride, out_dtype=kw['outs'][0].dtype)
            return (dense,)
        return kernel

    def _dense_pallas_kernel(*, shape, transpose, corder, matrix_mode='mv',
                             **kw):
        """Real Mosaic materialize: the slot scan writes dense tiles (no
        scatter) in both lane layouts — stride-32 row-per-sublane for
        ``'mv'``, stride-4 row-packed for ``'mm'`` — falling back to the
        XLA walk outside the envelope (x64, VMEM)."""
        from .pallas_kernels import (jitc_todense_pallas,
                                     jitc_todense_pallas_mm)
        jax_k = _dense_kernel(shape=shape, transpose=transpose,
                              corder=corder, matrix_mode=matrix_mode, **kw)
        todense = (jitc_todense_pallas
                   if _normalize_matrix_mode(matrix_mode) == 'mv'
                   else jitc_todense_pallas_mm)

        def kernel(*args):
            params = args[:npar]
            clen, seed = args[npar], args[npar + 1]
            out_len, in_len = walk_dims(shape, transpose)
            out = todense(
                spec.weight_fn, npar, params, seed[0], clen[0],
                (out_len, in_len), corder=corder,
                out_dtype=kw['outs'][0].dtype)
            if out is None:
                return jax_k(*args)
            return (out,)
        return kernel

    dense_p = XLACustomKernel(
        f'jit{t}',
        doc=f'Materialize the implicit {spec.name} matrix '
            f'(reference brainevent/_{spec.name}/float.py).',
    )
    dense_p.def_jax_kernel(_dense_kernel, asdefault=True)
    dense_p.def_pallas_kernel(_dense_pallas_kernel)
    # measured on a v5e (BENCH_PRIMS_r03 r3f rows): slot-scan materialize
    # 457 vs 5904 us at (1k,1k,10%), 853 vs 16272 us at (2k,2k,10%),
    # 3523 vs 34719 us at (5k,5k,1%) — 8-23x over the XLA walk
    dense_p.set_default('tpu', 'pallas')
    dense_p.def_general_batching()
    dense_p.def_tags(spec.name, 'float')

    def dense_p_call(*args, shape, transpose=False, corder=True,
                     matrix_mode='mv', backend: Optional[str] = None):
        params = tuple(jnp.atleast_1d(jnp.asarray(a)) for a in args[:npar])
        clen, seed = args[npar], args[npar + 1]
        out_len, in_len = walk_dims(shape, transpose)
        return dense_p(
            *params, jnp.atleast_1d(clen), _initialize_seed(seed),
            outs=[jax.ShapeDtypeStruct((out_len, in_len), params[0].dtype)],
            shape=tuple(shape), transpose=bool(transpose),
            corder=bool(corder),
            matrix_mode=_normalize_matrix_mode(matrix_mode), backend=backend,
            weight_info=jax.ShapeDtypeStruct(params[0].shape, params[0].dtype),
        )

    dense_p.def_call(dense_p_call)

    # Materialization is LINEAR in the weight parameters: M = sum_i p_i B_i
    # where basis B_i regenerates the same structure with unit parameter i
    # (the weight law is scalar w*mask / normal loc*mask + scale*Zmask /
    # uniform low*(1-U)mask + high*U*mask). The reference registers the same
    # rules (``brainevent/_jit_normal/float.py:721-722``).
    def _dense_rebind(params_list, clen, seed, kw):
        return dense_p_call(
            *params_list, clen, seed, shape=kw['shape'],
            transpose=kw['transpose'], corder=kw['corder'],
            matrix_mode=kw['matrix_mode'], backend=kw.get('backend'))

    def _dense_jvp_param(i):
        def rule(p_dot, *primals, **kw):
            zeros = [jnp.zeros_like(p) for p in primals[:npar]]
            zeros[i] = jnp.atleast_1d(p_dot)
            return _dense_rebind(zeros, primals[npar], primals[npar + 1], kw)
        return rule

    def _dense_transpose(ct, *primals, **kw):
        ct0 = ct[0]
        grads = []
        for i in range(npar):
            if ad.is_undefined_primal(primals[i]):
                basis_params = [jnp.zeros((1,), ct0.dtype)
                                for _ in range(npar)]
                basis_params[i] = jnp.ones((1,), ct0.dtype)
                (basis,) = _dense_rebind(basis_params, primals[npar],
                                         primals[npar + 1], kw)
                grads.append(jnp.sum(ct0 * basis).reshape(1))
            else:
                grads.append(primals[i])
        return (*grads, primals[npar], primals[npar + 1])

    dense_p.def_jvp_rule2(*[_dense_jvp_param(i) for i in range(npar)],
                          None, None)
    dense_p.def_transpose_rule(_dense_transpose)

    def dense_fn(*args, shape, transpose=False, corder=True,
                 matrix_mode='mv', backend: Optional[str] = None):
        """Materialize the dense matrix (``jit{t}``); unit-aware.

        Signature: ``jit{t}(*weight_params, prob, seed, *, shape, ...)``.
        """
        raw = args[:npar]
        prob, seed = args[npar], args[npar + 1]
        units = [split_mantissa_unit(a) for a in raw]
        params = [m for m, _ in units]
        unit = units[0][1]
        if _is_static_zero(prob):
            out_len, in_len = walk_dims(shape, transpose)
            return maybe_unit(
                jnp.zeros((out_len, in_len),
                          jnp.asarray(params[0]).dtype), unit)
        (out,) = dense_p_call(*params, _prep_clen(prob), seed, shape=shape,
                              transpose=transpose, corder=corder,
                              matrix_mode=matrix_mode, backend=backend)
        return maybe_unit(out, unit)

    # ------------------------------------------------------------------
    # mv / mm (float + binary), one kernel generator parametrized by mode
    # ------------------------------------------------------------------

    def _mv_kernel(event):
        def gen(*, shape, transpose, corder, **kw):
            def kernel(*args):
                params, clen, v, seed = split_args(args)
                out_len, _ = walk_dims(shape, transpose)
                out = engine.walk_matvec(
                    wfn(params, seed), seed[0], clen[0], v, out_len,
                    corder=corder, logical_cols=shape[1],
                    stride=_MV_STRIDE, event=event,
                    out_dtype=kw['outs'][0].dtype)
                return (out,)
            return kernel
        return gen

    def _mv_pallas_kernel(event):
        """Real Mosaic mv kernel: the lockstep slot scan
        (``jitc/pallas_kernels.py``), falling back to the XLA walk when
        the shape is outside the kernel envelope (x64, VMEM)."""
        def gen(*, shape, transpose, corder, **kw):
            from .pallas_kernels import jitc_matvec_pallas
            jax_k = _mv_kernel(event)(shape=shape, transpose=transpose,
                                      corder=corder, **kw)

            def kernel(*args):
                params, clen, v, seed = split_args(args)
                out_len, _ = walk_dims(shape, transpose)
                out = jitc_matvec_pallas(
                    spec.weight_fn, npar, params, seed[0], clen[0], v,
                    out_len, corder=corder, logical_cols=shape[1],
                    event=event, out_dtype=kw['outs'][0].dtype)
                if out is None:
                    return jax_k(*args)
                return (out,)
            return kernel
        return gen

    def _mm_kernel(event):
        def gen(*, shape, transpose, corder, matrix_mode='mm', **kw):
            stride = _MV_STRIDE if _normalize_matrix_mode(
                matrix_mode) == 'mv' else _MM_STRIDE

            def kernel(*args):
                params, clen, B, seed = split_args(args)
                out_len, _ = walk_dims(shape, transpose)
                out = engine.walk_matmat(
                    wfn(params, seed), seed[0], clen[0], B, out_len,
                    corder=corder, logical_cols=shape[1],
                    stride=stride, event=event,
                    out_dtype=kw['outs'][0].dtype)
                return (out,)
            return kernel
        return gen

    def _mm_pallas_kernel(event):
        """Batched Mosaic slot scan in both lane layouts: stride-32
        row-per-sublane for ``matrix_mode='mv'`` (the classes' ``@``
        route with a 1-D operand), stride-4 row-packed for ``'mm'``
        (the default mat-mat mode); x64 and VMEM overflows fall back to
        the XLA walk."""
        def gen(*, shape, transpose, corder, matrix_mode='mm', **kw):
            from .pallas_kernels import (jitc_matmat_pallas,
                                         jitc_matmat_pallas_mm)
            jax_k = _mm_kernel(event)(shape=shape, transpose=transpose,
                                      corder=corder,
                                      matrix_mode=matrix_mode, **kw)
            matmat = (jitc_matmat_pallas
                      if _normalize_matrix_mode(matrix_mode) == 'mv'
                      else jitc_matmat_pallas_mm)

            def kernel(*args):
                params, clen, B, seed = split_args(args)
                out_len, _ = walk_dims(shape, transpose)
                out = matmat(
                    spec.weight_fn, npar, params, seed[0], clen[0], B,
                    out_len, corder=corder, logical_cols=shape[1],
                    event=event, out_dtype=kw['outs'][0].dtype)
                if out is None:
                    return jax_k(*args)
                return (out,)
            return kernel
        return gen

    mv_p = XLACustomKernel(
        f'jit{t}mv',
        doc=f'Implicit {spec.name} mat-vec (reference brainevent/_{spec.name}/float.py).')
    mv_p.def_jax_kernel(_mv_kernel(event=False), asdefault=True)
    mv_p.def_pallas_kernel(_mv_pallas_kernel(event=False))
    # measured on a v5e (BENCH_NOTES.md round 3): slot scan 410 us vs
    # 3315 us at (1k,1k,10%), 6.1 ms vs 62 ms at (10k,10k,1%)
    mv_p.set_default('tpu', 'pallas')
    mv_p.def_tags(spec.name, 'float', 'mv')

    mm_p = XLACustomKernel(
        f'jit{t}mm',
        doc=f'Implicit {spec.name} mat-mat (reference brainevent/_{spec.name}/float.py).')
    mm_p.def_jax_kernel(_mm_kernel(event=False), asdefault=True)
    mm_p.def_pallas_kernel(_mm_pallas_kernel(event=False))
    # measured on a v5e (BENCH_NOTES.md r3g/r3f): stride-4 mm-layout slot
    # scan wins every grid row — e.g. jitsmm (2k,2k,p=0.02) 290 vs 787 us,
    # (200,300,p=0.1) 39-54 vs 87-99 us; nb=1 72x. Default flipped in r4
    # after the defaults-vs-measurements audit (tests/test_default_audit.py).
    mm_p.set_default('tpu', 'pallas')
    mm_p.def_tags(spec.name, 'float', 'mm')

    bmv_p = XLACustomKernel(
        f'binary_jit{t}mv',
        doc=f'Event implicit {spec.name} mat-vec (reference brainevent/_{spec.name}/binary.py).')
    bmv_p.def_jax_kernel(_mv_kernel(event=True), asdefault=True)
    bmv_p.def_pallas_kernel(_mv_pallas_kernel(event=True))
    bmv_p.set_default('tpu', 'pallas')
    bmv_p.def_tags(spec.name, 'binary', 'mv')

    bmm_p = XLACustomKernel(
        f'binary_jit{t}mm',
        doc=f'Event implicit {spec.name} mat-mat (reference brainevent/_{spec.name}/binary.py).')
    bmm_p.def_jax_kernel(_mm_kernel(event=True), asdefault=True)
    bmm_p.def_pallas_kernel(_mm_pallas_kernel(event=True))
    # same audit flip as mm_p: binary_jit*mm pallas wins 1.5-2.8x on every
    # BENCH_PRIMS_r04.json row (e.g. binary_jitsmm (2k,2k) 286 vs 790 us)
    bmm_p.set_default('tpu', 'pallas')
    bmm_p.def_tags(spec.name, 'binary', 'mm')

    # ------------------------------------------------------------------
    # walk-plan primitives (TPU extension): the same mv-mode products
    # with the stream setup hoisted out of the call.
    #
    # walk_setup's stationary-q rejection sampler runs lockstep over ALL
    # streams and costs 836 us of the 991 us jitnmv call at (2000, 2000)
    # on a v5e — 84% (BENCH_NOTES: jitc walk-plan probe). The setup is a
    # pure function of (seed, clen, walk dims), so a matrix with fixed
    # seed/shape computes it ONCE (build_plan_setup / the classes'
    # build_walk_plan) and passes it in as operands. Same sampled matrix
    # by construction: the jax_raw backend IGNORES the setup operands and
    # recomputes internally, so the backend sweep proves stream equality.
    # The reference re-draws per call inside SIMT threads where rejection
    # divergence is cheap (brainevent/_jit_normal/float.py:729); lockstep
    # rejection is a real cost on the VPU, so the plan binds it at the
    # data-structure layer — the CSR.build_mxu_plan() move.
    #
    # Plans are mode-locked to the stride-32 mv walk: the plan mm product
    # applies the SAME matrix as mv to every operand column (unlike the
    # classes' `@` on 2-D operands, which samples the reference's
    # stride-4 mm-mode matrix).
    # ------------------------------------------------------------------

    def split_plan_args(args):
        params = args[:npar]
        clen, operand, seed = args[npar], args[npar + 1], args[npar + 2]
        setup = args[npar + 3:npar + 6]
        return params, clen, operand, seed, setup

    def _mv_plan_kernel(*, shape, transpose, corder, event=False, **kw):
        def kernel(*args):
            params, clen, v, seed, _setup = split_plan_args(args)
            out_len, _ = walk_dims(shape, transpose)
            out = engine.walk_matvec(
                wfn(params, seed), seed[0], clen[0], v, out_len,
                corder=corder, logical_cols=shape[1],
                stride=_MV_STRIDE, event=event,
                out_dtype=kw['outs'][0].dtype)
            return (out,)
        return kernel

    def _mv_plan_pallas_kernel(*, shape, transpose, corder, event=False,
                               scan_rounds=None, event_cap=None,
                               row_cap=None, **kw):
        from .pallas_kernels import jitc_matvec_pallas
        jax_k = _mv_plan_kernel(shape=shape, transpose=transpose,
                                corder=corder, event=event, **kw)

        def kernel(*args):
            params, clen, v, seed, setup = split_plan_args(args)
            state2, q2, clarr = setup
            out_len, in_len = walk_dims(shape, transpose)
            out_dtype = kw['outs'][0].dtype

            def lockstep():
                out = jitc_matvec_pallas(
                    spec.weight_fn, npar, params, seed[0], clen[0], v,
                    out_len, corder=corder, logical_cols=shape[1],
                    event=event, out_dtype=out_dtype,
                    setup=(state2, q2, clarr[0]))
                return out if out is not None else jax_k(*args)[0]

            # event-compacted scatter route: only the spiking rows' plan
            # streams walk (corder=False is the scatter direction — the
            # operand indexes the walk-row axis)
            if (event and not corder and scan_rounds
                    and jnp.dtype(out_dtype) != jnp.float64
                    and state2.shape[0] == in_len):
                from ..config import get_jitc_event_fallback
                from ..fcn.binary import event_capacity
                from .event_route import jitc_event_matvec_plan
                chunk = _normalize_chunk_size(shape[1], None)
                cap = (int(event_cap) if event_cap
                       else event_capacity(in_len))
                cap = min(cap, in_len)
                rc = None if row_cap is None else int(row_cap)
                fb = (lockstep if get_jitc_event_fallback() == 'lockstep'
                      else (lambda: jax_k(*args)[0]))

                def route(cap_k, rounds_k, rc_k, fallback_k):
                    return lambda: jitc_event_matvec_plan(
                        spec.weight_fn, npar, params, seed[0], v,
                        out_len, n_rows=in_len, chunk_size=chunk,
                        setup=(state2, q2, clarr[0]),
                        scan_rounds=rounds_k, cap=cap_k,
                        fallback=fallback_k, out_dtype=out_dtype,
                        row_cap=rc_k)

                # two-level escalation: bursts (e.g. an initial
                # synchronization transient) hit a 4x-capacity pass of
                # the same XLA route, and only beyond that the final
                # fallback — measured at 80k: the final route firing
                # ~0.6% of steps costs +1.9 ms/step amortized via the
                # engine vs +25 min of Mosaic compile via the lockstep
                # kernel; the escalation pass costs neither.
                cap2 = min(4 * cap, in_len)
                r1 = int(scan_rounds)
                r2 = min(2 * r1 + 4, 64)
                rc2 = None if rc is None else 2 * rc
                if cap2 > cap or r2 > r1:
                    fb = route(cap2, r2, rc2, fb)
                return (route(cap, r1, rc, fb)(),)
            return (lockstep(),)
        return kernel

    def _mm_plan_kernel(*, shape, transpose, corder, event=False, **kw):
        def kernel(*args):
            params, clen, B, seed, _setup = split_plan_args(args)
            out_len, _ = walk_dims(shape, transpose)
            out = engine.walk_matmat(
                wfn(params, seed), seed[0], clen[0], B, out_len,
                corder=corder, logical_cols=shape[1],
                stride=_MV_STRIDE, event=event,
                out_dtype=kw['outs'][0].dtype)
            return (out,)
        return kernel

    def _mm_plan_pallas_kernel(*, shape, transpose, corder, event=False,
                               **kw):
        from .pallas_kernels import jitc_matmat_pallas
        jax_k = _mm_plan_kernel(shape=shape, transpose=transpose,
                                corder=corder, event=event, **kw)

        def kernel(*args):
            params, clen, B, seed, setup = split_plan_args(args)
            state2, q2, clarr = setup
            out_len, _ = walk_dims(shape, transpose)
            out = jitc_matmat_pallas(
                spec.weight_fn, npar, params, seed[0], clen[0], B,
                out_len, corder=corder, logical_cols=shape[1],
                event=event, out_dtype=kw['outs'][0].dtype,
                setup=(state2, q2, clarr[0]))
            if out is None:
                return jax_k(*args)
            return (out,)
        return kernel

    pmv_p = XLACustomKernel(
        f'jit{t}mv_plan',
        doc=f'Implicit {spec.name} mat-vec over a precomputed walk plan '
            f'(TPU extension; same sampled matrix as jit{t}mv — the '
            f'stationary-q setup, 84% of the mv call at (2k, 2k) on v5e, '
            f'is hoisted to build time).')
    pmv_p.def_jax_kernel(_mv_plan_kernel, asdefault=True)
    pmv_p.def_pallas_kernel(_mv_plan_pallas_kernel)
    pmv_p.set_default('tpu', 'pallas')
    pmv_p.def_tags(spec.name, 'float', 'mv', 'plan')

    pmm_p = XLACustomKernel(
        f'jit{t}mm_plan',
        doc=f'Implicit {spec.name} mat-mat over a precomputed walk plan '
            f'(TPU extension; mode-locked to the stride-32 mv walk: every '
            f'operand column sees the SAME matrix as jit{t}mv).')
    pmm_p.def_jax_kernel(_mm_plan_kernel, asdefault=True)
    pmm_p.def_pallas_kernel(_mm_plan_pallas_kernel)
    pmm_p.set_default('tpu', 'pallas')
    pmm_p.def_tags(spec.name, 'float', 'mm', 'plan')

    def _plan_p_call(prim, is_mm):
        def call(*args, shape, transpose=False, corder=True, event=False,
                 scan_rounds: Optional[int] = None,
                 event_cap: Optional[int] = None,
                 row_cap: Optional[int] = None,
                 backend: Optional[str] = None):
            params = tuple(jnp.atleast_1d(jnp.asarray(a))
                           for a in args[:npar])
            clen = jnp.atleast_1d(jnp.asarray(args[npar]))
            operand = args[npar + 1]
            seed = _initialize_seed(args[npar + 2])
            state2 = jnp.asarray(args[npar + 3])
            q2 = jnp.asarray(args[npar + 4])
            clarr = jnp.atleast_1d(
                jnp.asarray(args[npar + 5]).astype(jnp.uint32))
            out_len, in_len = walk_dims(shape, transpose)
            assert operand.shape[0] == in_len, (
                f'operand length {operand.shape[0]} != {in_len} '
                f'(shape={shape}, transpose={transpose})')
            if is_mm:
                outs = [jax.ShapeDtypeStruct((out_len, operand.shape[1]),
                                             params[0].dtype)]
            else:
                outs = [jax.ShapeDtypeStruct((out_len,), params[0].dtype)]
            return prim(
                *params, clen, operand, seed, state2, q2, clarr,
                outs=outs, shape=tuple(shape), transpose=bool(transpose),
                corder=bool(corder), event=bool(event),
                scan_rounds=(None if scan_rounds is None
                             else int(scan_rounds)),
                event_cap=(None if event_cap is None else int(event_cap)),
                row_cap=(None if row_cap is None else int(row_cap)),
                backend=backend,
                weight_info=jax.ShapeDtypeStruct(params[0].shape,
                                                 params[0].dtype))
        return call

    pmv_p_call = _plan_p_call(pmv_p, is_mm=False)
    pmm_p_call = _plan_p_call(pmm_p, is_mm=True)
    pmv_p.def_call(pmv_p_call)
    pmm_p.def_call(pmm_p_call)

    def _mk_plan_param_jvp(call, i):
        def rule(p_dot, *args, **kw):
            params, clen, operand, seed, setup = split_plan_args(args)
            new_params = tuple(p_dot if j == i else jnp.zeros_like(p)
                               for j, p in enumerate(params))
            return call(*new_params, clen, operand, seed, *setup,
                        shape=kw['shape'], transpose=kw['transpose'],
                        corder=kw['corder'], event=kw.get('event', False),
                        backend=kw.get('backend'))
        return rule

    def _plan_operand_jvp(call):
        def rule(o_dot, *args, **kw):
            params, clen, operand, seed, setup = split_plan_args(args)
            # operand tangents route through the float product (the
            # surrogate-linear contract of the event ops)
            return call(*params, clen, o_dot, seed, *setup,
                        shape=kw['shape'], transpose=kw['transpose'],
                        corder=kw['corder'], event=False,
                        backend=kw.get('backend'))
        return rule

    def _mk_plan_transpose(call):
        def rule(ct, *args, **kw):
            params, clen, operand, seed, setup = split_plan_args(args)
            ct = ct[0]
            shape, transpose, corder = (kw['shape'], kw['transpose'],
                                        kw['corder'])
            event = kw.get('event', False)
            backend = kw.get('backend')
            # the flipped direction keeps the SAME walk geometry
            # (transpose and corder flip together), so the plan's setup
            # serves the cotangent products too
            if ad.is_undefined_primal(operand):
                o_bar = call(*params, clen, ct, seed, *setup,
                             shape=shape, transpose=not transpose,
                             corder=not corder, event=False,
                             backend=backend)[0]
                return (*params, clen, o_bar, seed, *setup)
            dtype = ct.dtype
            if event:
                op_eff = (operand.astype(dtype)
                          if operand.dtype == jnp.bool_
                          else (operand > 0).astype(dtype))
            else:
                op_eff = operand.astype(dtype)
            grads = []
            for basis in spec.param_basis:
                probe = tuple(jnp.full((1,), b, dtype) for b in basis)
                r = call(*probe, clen, ct, seed, *setup,
                         shape=shape, transpose=not transpose,
                         corder=not corder, event=False,
                         backend=backend)[0]
                grads.append(jnp.sum(r * op_eff).reshape(1))
            out = [grads[i] if ad.is_undefined_primal(p) else p
                   for i, p in enumerate(params)]
            return (*out, clen, operand, seed, *setup)
        return rule

    for prim, call in ((pmv_p, pmv_p_call), (pmm_p, pmm_p_call)):
        rules = [_mk_plan_param_jvp(call, i) for i in range(npar)]
        prim.def_jvp_rule2(*rules, None, _plan_operand_jvp(call), None,
                           None, None, None)
        prim.def_transpose_rule(_mk_plan_transpose(call))
        prim.def_general_batching()

    def build_plan_setup(prob, seed, shape, transpose=False, corder=True):
        """Precompute ``(clen, state2, q2, cl)`` for the plan primitives'
        walk geometry (shared by the product and its AD flips)."""
        from .pallas_kernels import walk_plan_setup
        out_len, in_len = walk_dims(shape, transpose)
        n_rows, n_cols = ((out_len, in_len) if corder
                          else (in_len, out_len))
        chunk = _normalize_chunk_size(shape[1], None)
        clen = jnp.atleast_1d(jnp.asarray(_prep_clen(prob)))
        seed = _initialize_seed(seed)
        state2, q2, cl = walk_plan_setup(seed[0], clen[0], n_rows, n_cols,
                                         chunk)
        return clen, state2, q2, jnp.atleast_1d(cl)

    def _wrap_plan(call, is_mm):
        def fn(*args, shape, transpose=False, corder=True, event=False,
               scan_rounds: Optional[int] = None,
               event_cap: Optional[int] = None,
               row_cap: Optional[int] = None,
               backend: Optional[str] = None):
            raw = args[:npar]
            clen, operand, seed = (args[npar], args[npar + 1],
                                   args[npar + 2])
            setup = args[npar + 3:npar + 6]
            units = [split_mantissa_unit(a) for a in raw]
            params = [m for m, _ in units]
            unit = units[0][1]
            operand, o_unit = split_mantissa_unit(operand)
            (out,) = call(*params, clen, operand, seed, *setup,
                          shape=shape, transpose=transpose, corder=corder,
                          event=event, scan_rounds=scan_rounds,
                          event_cap=event_cap, row_cap=row_cap,
                          backend=backend)
            return maybe_unit(out, unit, o_unit)
        fn.__name__ = f'jit{spec.tag}{"mm" if is_mm else "mv"}_plan'
        return fn

    pmv_fn = _wrap_plan(pmv_p_call, is_mm=False)
    pmm_fn = _wrap_plan(pmm_p_call, is_mm=True)

    def _plan_bench(*, platform):
        n, prob = 1000, 0.1
        base = [1.0, 0.1][:npar]
        params = tuple(jnp.full((1,), b, jnp.float32) for b in base)
        seed = jnp.asarray([42], jnp.uint32)
        configs = []
        for transpose in (False, True):
            clen, state2, q2, cl = build_plan_setup(
                prob, seed, (n, n), transpose=transpose, corder=True)
            v = jnp.asarray(np.random.randn(n), jnp.float32)
            configs.append(BenchmarkConfig(
                f'{"T" if transpose else "NT"},corder',
                (*params, clen, v, seed, state2, q2, cl),
                {'shape': (n, n), 'transpose': transpose, 'corder': True},
                loop_arg=npar + 1))
        return configs

    pmv_p.def_benchmark_data(_plan_bench)

    def _plan_mm_bench(*, platform):
        n, prob, nb = 1000, 0.1, 8
        base = [1.0, 0.1][:npar]
        params = tuple(jnp.full((1,), b, jnp.float32) for b in base)
        seed = jnp.asarray([42], jnp.uint32)
        clen, state2, q2, cl = build_plan_setup(prob, seed, (n, n))
        B = jnp.asarray(np.random.randn(n, nb), jnp.float32)
        return [BenchmarkConfig(
            f'NT,corder,B={nb}',
            (*params, clen, B, seed, state2, q2, cl),
            {'shape': (n, n), 'transpose': False, 'corder': True},
            loop_arg=npar + 1)]

    pmm_p.def_benchmark_data(_plan_mm_bench)

    def _p_call(prim, is_mm):
        def call(*args, shape, transpose=False, corder=True,
                 matrix_mode='mm', backend: Optional[str] = None):
            params = tuple(jnp.atleast_1d(jnp.asarray(a)) for a in args[:npar])
            clen = jnp.atleast_1d(jnp.asarray(args[npar]))
            operand = args[npar + 1]
            seed = _initialize_seed(args[npar + 2])
            out_len, in_len = walk_dims(shape, transpose)
            assert operand.shape[0] == in_len, (
                f'operand length {operand.shape[0]} != {in_len} '
                f'(shape={shape}, transpose={transpose})')
            if is_mm:
                outs = [jax.ShapeDtypeStruct((out_len, operand.shape[1]),
                                             params[0].dtype)]
                extra = dict(matrix_mode=matrix_mode)
            else:
                outs = [jax.ShapeDtypeStruct((out_len,), params[0].dtype)]
                extra = {}
            return prim(
                *params, clen, operand, seed,
                outs=outs, shape=tuple(shape), transpose=bool(transpose),
                corder=bool(corder), backend=backend,
                weight_info=jax.ShapeDtypeStruct(params[0].shape,
                                                 params[0].dtype),
                **extra,
            )
        return call

    mv_p_call = _p_call(mv_p, is_mm=False)
    mm_p_call = _p_call(mm_p, is_mm=True)
    bmv_p_call = _p_call(bmv_p, is_mm=False)
    bmm_p_call = _p_call(bmm_p, is_mm=True)
    mv_p.def_call(mv_p_call)
    mm_p.def_call(mm_p_call)
    bmv_p.def_call(bmv_p_call)
    bmm_p.def_call(bmm_p_call)

    # -- AD rules ---------------------------------------------------------

    def _mk_param_jvp(call, i):
        def rule(p_dot, *args, **kw):
            params, clen, operand, seed = split_args(args)
            new_params = tuple(
                p_dot if j == i else jnp.zeros_like(p)
                for j, p in enumerate(params))
            return call(*new_params, clen, operand, seed,
                        shape=kw['shape'], transpose=kw['transpose'],
                        corder=kw['corder'], backend=kw.get('backend'))
        return rule

    def _operand_jvp(call):
        def rule(o_dot, *args, **kw):
            params, clen, operand, seed = split_args(args)
            return call(*params, clen, o_dot, seed,
                        shape=kw['shape'], transpose=kw['transpose'],
                        corder=kw['corder'], backend=kw.get('backend'))
        return rule

    def _mk_transpose_rule(call, event=False):
        def rule(ct, *args, **kw):
            params, clen, operand, seed = split_args(args)
            ct = ct[0]
            shape, transpose, corder = kw['shape'], kw['transpose'], kw['corder']
            backend = kw.get('backend')
            if ad.is_undefined_primal(operand):
                o_bar = call(*params, clen, ct, seed,
                             shape=shape, transpose=not transpose,
                             corder=not corder, backend=backend)[0]
                return (*params, clen, o_bar, seed)
            # cotangent w.r.t. the differentiable weight params via basis
            # probes: d(out)/dparam_i contracted with ct
            dtype = ct.dtype
            if event:
                op_eff = (operand.astype(dtype) if operand.dtype == jnp.bool_
                          else (operand > 0).astype(dtype))
            else:
                op_eff = operand.astype(dtype)
            grads = []
            for basis in spec.param_basis:
                probe = tuple(jnp.full((1,), b, dtype) for b in basis)
                r = call(*probe, clen, ct, seed,
                         shape=shape, transpose=not transpose,
                         corder=not corder, backend=backend)[0]
                grads.append(jnp.sum(r * op_eff).reshape(1))
            out = [grads[i] if ad.is_undefined_primal(p) else p
                   for i, p in enumerate(params)]
            return (*out, clen, operand, seed)
        return rule

    for prim, call in ((mv_p, mv_p_call), (mm_p, mm_p_call)):
        rules = [_mk_param_jvp(call, i) for i in range(npar)]
        prim.def_jvp_rule2(*rules, None, _operand_jvp(call), None)
        prim.def_transpose_rule(_mk_transpose_rule(call))

    # binary ops: gradient w.r.t. operand routes through the float op
    for prim, call, fcall in ((bmv_p, bmv_p_call, mv_p_call),
                              (bmm_p, bmm_p_call, mm_p_call)):
        rules = [_mk_param_jvp(call, i) for i in range(npar)]
        prim.def_jvp_rule2(*rules, None, _operand_jvp(fcall), None)
        prim.def_transpose_rule(_mk_transpose_rule(fcall, event=True))

    # -- batching: mv with a batched operand reroutes to mm ------------------

    def _mv_batching(call_mm, prim):
        def rule(args, axes, **kw):
            operand_axis = axes[npar + 1]
            rest_none = all(a is None for i, a in enumerate(axes)
                            if i != npar + 1)
            if rest_none and operand_axis in (0, 1) and args[npar + 1].ndim == 2:
                operand = args[npar + 1]
                if operand_axis == 0:
                    operand = operand.T
                new_args = args[:npar + 1] + (operand,) + args[npar + 2:]
                r = call_mm(*new_args, shape=kw['shape'],
                            transpose=kw['transpose'], corder=kw['corder'],
                            matrix_mode='mm', backend=kw.get('backend'))
                return r, [1]
            return general_batching_rule(prim, args, axes, **kw)
        return rule

    mv_p.def_batching_rule(_mv_batching(mm_p_call, mv_p))
    bmv_p.def_batching_rule(_mv_batching(bmm_p_call, bmv_p))
    mm_p.def_general_batching()
    bmm_p.def_general_batching()

    # ------------------------------------------------------------------
    # CSR count / fill
    # ------------------------------------------------------------------

    def _count_kernel(*, shape, corder, matrix_mode, **kw):
        stride = _MV_STRIDE if matrix_mode == 'mv' else _MM_STRIDE

        def kernel(*args):
            clen, seed = args[npar], args[npar + 1]
            counts = engine.walk_count(seed[0], clen[0], tuple(shape),
                                       corder=corder, stride=stride)
            return (counts,)
        return kernel

    count_p = XLACustomKernel(
        f'jit{t}_csr_count',
        doc=f'Per-row hit counts of the implicit {spec.name} matrix '
            f'(reference brainevent/_{spec.name}/csr.py).')
    count_p.def_jax_kernel(_count_kernel, asdefault=True)
    count_p.def_pallas_kernel(lambda **kw: _count_kernel(**kw),
                              alias_of='jax_raw', note='the vectorized whole-array walk (jitc/engine.py) is the TPU formulation; serial geometric skips are VPU-hostile (BENCH_NOTES.md: JITC walk)')
    count_p.def_general_batching()
    count_p.def_tags(spec.name, 'csr')

    def count_p_call(*args, shape, corder=True, matrix_mode='mv',
                     backend: Optional[str] = None):
        params = tuple(jnp.atleast_1d(jnp.asarray(a)) for a in args[:npar])
        clen = jnp.atleast_1d(jnp.asarray(args[npar]))
        seed = _initialize_seed(args[npar + 1])
        return count_p(
            *params, clen, seed,
            outs=[jax.ShapeDtypeStruct((shape[0],), jnp.int32)],
            shape=tuple(shape), corder=bool(corder),
            matrix_mode=_normalize_matrix_mode(matrix_mode), backend=backend)

    count_p.def_call(count_p_call)

    def _fill_kernel(*, shape, corder, matrix_mode, nse, **kw):
        stride = _MV_STRIDE if matrix_mode == 'mv' else _MM_STRIDE

        def kernel(*args):
            params = args[:npar]
            clen, seed = args[npar], args[npar + 1]
            data, indices, indptr = engine.walk_collect(
                wfn(params, seed), seed[0], clen[0], tuple(shape), nse,
                corder=corder, stride=stride,
                out_dtype=kw['outs'][0].dtype)
            return (data, indices, indptr)
        return kernel

    fill_p = XLACustomKernel(
        f'jit{t}_csr_fill',
        doc=f'Materialize the canonical column-sorted CSR of the implicit '
            f'{spec.name} matrix (reference brainevent/_{spec.name}/csr.py).')
    fill_p.def_jax_kernel(_fill_kernel, asdefault=True)
    fill_p.def_pallas_kernel(lambda **kw: _fill_kernel(**kw),
                             alias_of='jax_raw', note='the vectorized whole-array walk (jitc/engine.py) is the TPU formulation; serial geometric skips are VPU-hostile (BENCH_NOTES.md: JITC walk)')
    fill_p.def_general_batching()
    fill_p.def_tags(spec.name, 'csr')

    def fill_p_call(*args, shape, nse, corder=True, matrix_mode='mv',
                    backend: Optional[str] = None):
        params = tuple(jnp.atleast_1d(jnp.asarray(a)) for a in args[:npar])
        clen = jnp.atleast_1d(jnp.asarray(args[npar]))
        seed = _initialize_seed(args[npar + 1])
        nse = int(nse)
        return fill_p(
            *params, clen, seed,
            outs=[jax.ShapeDtypeStruct((max(nse, 1),), params[0].dtype),
                  jax.ShapeDtypeStruct((max(nse, 1),), jnp.int32),
                  jax.ShapeDtypeStruct((shape[0] + 1,), jnp.int32)],
            shape=tuple(shape), nse=nse, corder=bool(corder),
            matrix_mode=_normalize_matrix_mode(matrix_mode), backend=backend)

    fill_p.def_call(fill_p_call)

    def to_csr(*args, shape, corder=True, matrix_mode='mv',
               backend: Optional[str] = None):
        """Materialize the implicit matrix as a CSR (host-side: the nse is
        data-dependent, so this cannot run under ``jit``)."""
        from ..csr.main import CSR
        raw = args[:npar]
        prob, seed = args[npar], args[npar + 1]
        units = [split_mantissa_unit(a) for a in raw]
        params = [m for m, _ in units]
        unit = units[0][1]
        seed = _initialize_seed(seed)
        clen = _prep_clen(prob)
        (counts,) = count_p_call(*params, clen, seed, shape=shape,
                                 corder=corder, matrix_mode=matrix_mode,
                                 backend=backend)
        nse = int(jnp.sum(counts))
        data, indices, indptr = fill_p_call(
            *params, clen, seed, shape=shape, nse=nse, corder=corder,
            matrix_mode=matrix_mode, backend=backend)
        if nse == 0:
            data = data[:0]
            indices = indices[:0]
        return CSR((maybe_unit(data, unit), indices, indptr), shape=tuple(shape))

    # ------------------------------------------------------------------
    # High-level wrappers
    # ------------------------------------------------------------------

    def _wrap(call, event):
        def fn(*args, shape, transpose=False, corder=True,
               backend: Optional[str] = None, **extra):
            raw = args[:npar]
            prob, operand, seed = args[npar], args[npar + 1], args[npar + 2]
            units = [split_mantissa_unit(a) for a in raw]
            params = [m for m, _ in units]
            unit = units[0][1]
            operand, o_unit = split_mantissa_unit(operand)
            if _is_static_zero(prob):
                out_len, _ = walk_dims(shape, transpose)
                o_shape = ((out_len,) if operand.ndim == 1
                           else (out_len, operand.shape[1]))
                return maybe_unit(
                    jnp.zeros(o_shape, jnp.asarray(params[0]).dtype),
                    unit, o_unit)
            (out,) = call(*params, _prep_clen(prob), operand, seed,
                          shape=shape, transpose=transpose, corder=corder,
                          backend=backend, **extra)
            return maybe_unit(out, unit, o_unit)
        kind = 'event (binary-operand)' if event else 'float'
        fn.__doc__ = (
            f'{kind.capitalize()} implicit {spec.name} mat-vec: the '
            f'connectivity (prob ``conn_prob``) and weights regenerate '
            f'from ``seed`` per call — no stored matrix (unit-aware; '
            f'reference ``brainevent/_{spec.name}/'
            f'{"binary" if event else "float"}.py``).')
        fn.__name__ = f'{"binary_" if event else ""}jit{spec.tag}mv'
        return fn

    mv_fn = _wrap(mv_p_call, event=False)
    bmv_fn = _wrap(bmv_p_call, event=True)

    def mm_fn(*args, shape, transpose=False, corder=True,
              matrix_mode='mm', backend: Optional[str] = None):
        return _wrap(mm_p_call, False)(
            *args, shape=shape, transpose=transpose, corder=corder,
            backend=backend, matrix_mode=matrix_mode)

    def bmm_fn(*args, shape, transpose=False, corder=True,
               matrix_mode='mm', backend: Optional[str] = None):
        return _wrap(bmm_p_call, True)(
            *args, shape=shape, transpose=transpose, corder=corder,
            backend=backend, matrix_mode=matrix_mode)

    mm_fn.__doc__ = (
        f'Float implicit {spec.name} mat-mat: connectivity and weights '
        f'regenerate from ``seed`` per call — no stored matrix '
        f'(unit-aware; reference ``brainevent/_{spec.name}/float.py``).')
    mm_fn.__name__ = f'jit{spec.tag}mm'
    bmm_fn.__doc__ = (
        f'Event (binary-operand) implicit {spec.name} mat-mat '
        f'(unit-aware; reference ``brainevent/_{spec.name}/binary.py``).')
    bmm_fn.__name__ = f'binary_jit{spec.tag}mm'

    # ------------------------------------------------------------------
    # dt2t: fused per-synapse ``w * y`` fill (true primitive — the
    # reference's fused fill, brainevent/_{name}/dt2t.py:121-291; weights
    # are regenerated in-kernel, no CSR is ever materialized)
    # ------------------------------------------------------------------

    def _dt2t_kernel(*, shape, transpose, corder, nse, **kw):
        def kernel(*args):
            params = args[:npar]
            clen, y, seed = args[npar], args[npar + 1], args[npar + 2]
            out = engine.walk_dt2t(
                wfn(params, seed), seed[0], clen[0], y, tuple(shape), nse,
                transpose=transpose, corder=corder, stride=_MV_STRIDE,
                out_dtype=kw['outs'][0].dtype)
            return (out[:nse],)
        return kernel

    dt2t_p = XLACustomKernel(
        f'jit{t}mv_dt2t',
        doc=f'Fused per-synapse ``w * y`` fill of the implicit {spec.name} '
            f'(mv) matrix in canonical CSR flat order — weights regenerated '
            f'in-kernel (reference brainevent/_{spec.name}/dt2t.py:121-291).')
    dt2t_p.def_jax_kernel(_dt2t_kernel, asdefault=True)
    dt2t_p.def_pallas_kernel(
        lambda **kw: _dt2t_kernel(**kw),
        alias_of='jax_raw',
        note='the vectorized whole-array walk (jitc/engine.py) is the TPU '
             'formulation; serial geometric skips are VPU-hostile '
             '(BENCH_NOTES.md: JITC walk)')
    dt2t_p.def_general_batching()
    dt2t_p.def_tags(spec.name, 'dt2t')

    def dt2t_p_call(*args, nse, shape, transpose=False, corder=True,
                    backend: Optional[str] = None):
        """Bind the fused dt2t primitive. ``nse`` is the static structural
        non-zero count (from the count primitive); returns ``(data (nse,),)``."""
        params = tuple(jnp.atleast_1d(jnp.asarray(a)) for a in args[:npar])
        clen = jnp.atleast_1d(jnp.asarray(args[npar]))
        y = jnp.asarray(args[npar + 1])
        seed = _initialize_seed(args[npar + 2])
        nse = int(nse)
        out_len, in_len = walk_dims(shape, False)
        expect = in_len if transpose else out_len
        assert y.ndim == 1 and y.shape[0] == expect, (
            f'y length {y.shape} != {expect} (shape={shape}, '
            f'transpose={transpose})')
        return dt2t_p(
            *params, clen, y, seed,
            outs=[jax.ShapeDtypeStruct((nse,), params[0].dtype)],
            shape=tuple(shape), nse=nse, transpose=bool(transpose),
            corder=bool(corder), backend=backend,
            weight_info=jax.ShapeDtypeStruct(params[0].shape,
                                             params[0].dtype))

    dt2t_p.def_call(dt2t_p_call)

    def dt2t_fn(*args, shape, transpose=False, corder=True,
                backend: Optional[str] = None):
        """Per-synapse ``w * y`` in canonical (column-sorted mv) CSR order
        (reference ``brainevent/_{name}/dt2t.py``). Host-side: the nse is
        data-dependent, so this cannot run under ``jit`` — use
        ``dt2t_p_call`` with a precomputed ``nse`` inside traced code."""
        raw = args[:npar]
        prob, y, seed = args[npar], args[npar + 1], args[npar + 2]
        y, y_unit = split_mantissa_unit(y)
        units = [split_mantissa_unit(a) for a in raw]
        params = [m for m, _ in units]
        unit = units[0][1]
        if _is_static_zero(prob):
            return maybe_unit(
                jnp.zeros(0, jnp.asarray(params[0]).dtype), unit, y_unit)
        seed = _initialize_seed(seed)
        clen = _prep_clen(prob)
        (counts,) = count_p_call(*params, clen, seed, shape=shape,
                                 corder=corder, matrix_mode='mv',
                                 backend=backend)
        nse = int(jnp.sum(counts))
        if nse == 0:
            return maybe_unit(
                jnp.zeros(0, jnp.asarray(params[0]).dtype), unit, y_unit)
        (data,) = dt2t_p_call(*params, clen, y, seed, nse=nse, shape=shape,
                              transpose=transpose, corder=corder,
                              backend=backend)
        return maybe_unit(data, unit, y_unit)

    # benchmark data
    def _bench(*, platform):
        n, prob = 1000, 0.1
        base = [1.0, 0.1][:npar]
        params = tuple(jnp.full((1,), b, jnp.float32) for b in base)
        clen = _prep_clen(prob)
        seed = jnp.asarray([42], jnp.uint32)
        configs = []
        for transpose in (False, True):
            for corder in (True, False):
                v = jnp.asarray(np.random.randn(n), jnp.float32)
                configs.append(BenchmarkConfig(
                    f'{"T" if transpose else "NT"},'
                    f'{"corder" if corder else "rorder"}',
                    (*params, clen, v, seed),
                    {'shape': (n, n), 'transpose': transpose,
                     'corder': corder},
                    loop_arg=-2))
        return configs

    mv_p.def_benchmark_data(_bench)
    bmv_p.def_benchmark_data(_bench)

    return SimpleNamespace(
        spec=spec,
        dense_p=dense_p, dense_p_call=dense_p_call, dense_fn=dense_fn,
        mv_p=mv_p, mv_p_call=mv_p_call, mv_fn=mv_fn,
        mm_p=mm_p, mm_p_call=mm_p_call, mm_fn=mm_fn,
        bmv_p=bmv_p, bmv_p_call=bmv_p_call, bmv_fn=bmv_fn,
        bmm_p=bmm_p, bmm_p_call=bmm_p_call, bmm_fn=bmm_fn,
        count_p=count_p, count_p_call=count_p_call,
        fill_p=fill_p, fill_p_call=fill_p_call,
        to_csr=to_csr,
        dt2t_p=dt2t_p, dt2t_p_call=dt2t_p_call, dt2t_fn=dt2t_fn,
        plan_mv_p=pmv_p, plan_mv_fn=pmv_fn,
        plan_mm_p=pmm_p, plan_mm_fn=pmm_fn,
        build_plan_setup=build_plan_setup,
    )
