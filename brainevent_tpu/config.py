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

"""Global configuration for brainevent-tpu.

Capability parity with the reference config module
(``brainevent/config.py:45-421``): numba threading knobs, LFSR algorithm
selection, and the per-platform global backend map — plus TPU-first
additions: Pallas interpret-mode forcing (for CPU CI) and tile-size /
scatter-strategy tuning knobs that replace the reference's CUDA hybrid
scheduler constants (``brainevent/_csr/hybrid_config.py``).
"""

import os
from typing import Optional

__all__ = [
    # numba (parity; inert unless numba is installed)
    'set_numba_parallel', 'get_numba_parallel', 'get_numba_num_threads',
    # LFSR algorithm
    'set_lfsr_algorithm', 'get_lfsr_algorithm',
    # global per-platform backend
    'set_backend', 'get_backend', 'clear_backends',
    # CUDA toolchain preferences (parity; inert on TPU hosts)
    'prefer_system_nvcc', 'set_compute_capability', 'get_compute_capability',
    # TPU-first additions
    'set_pallas_interpret', 'get_pallas_interpret',
    'set_mxu_scatter_limit', 'get_mxu_scatter_limit',
    'set_event_capacity_divisor', 'get_event_capacity_divisor',
    'set_scatter_passes', 'get_scatter_passes',
    'set_windowed_scatter_min_out', 'get_windowed_scatter_min_out',
    'set_jitc_event_fallback', 'get_jitc_event_fallback',
    'set_jitc_auto_plan', 'get_jitc_auto_plan',
    'set_auto_mxu_plan', 'get_auto_mxu_plan',
    'set_mxu_plan_min_nse', 'get_mxu_plan_min_nse',
    'set_dense_mm_max_bytes', 'get_dense_mm_max_bytes',
    'set_compilation_cache', 'get_compilation_cache',
    'set_mm_passes', 'get_mm_passes',
]

# Platforms the backend map accepts; mirrors reference
# ``brainevent/config.py:220-324``.
_KNOWN_PLATFORMS = ('cpu', 'gpu', 'cuda', 'tpu')

_LFSR_ALGORITHMS = ('lfsr88', 'lfsr113', 'lfsr128')

_state = {
    'numba_parallel': True,
    'numba_num_threads': None,  # None = numba default
    'lfsr_algorithm': 'lfsr88',
    'backends': {},  # platform -> backend name or None
    'prefer_system_nvcc': False,
    'compute_capability': None,
    # None = auto (interpret when the default JAX backend is not TPU);
    # True/False force it globally.
    'pallas_interpret': None,
    # Above this many output elements, event scatter-add switches from the
    # MXU one-hot-matmul strategy to XLA scatter (see ops/scatter.py).
    # default measured by init_csr_config on a TPU v5e (BENCH_NOTES.md:
    # MXU one-hot beats XLA scatter at n=4k AND n=40k at every event rate;
    # the v5e tuning JSON persists the same value per device kind)
    'mxu_scatter_limit': int(os.environ.get('BRAINEVENT_MXU_SCATTER_LIMIT', 40960)),
    # Lazy MXU gather-plan auto-build on CSR/FCN float products:
    # 'auto' = on TPU only, True = everywhere, False = never.
    'auto_mxu_plan': 'auto',
    'mxu_plan_min_nse': int(
        os.environ.get('BRAINEVENT_MXU_PLAN_MIN_NSE', 65536)),
    # cached-dense mat-mat route budget (bytes; 0 = off). Default 128 MB:
    # a jit that closure-captures the matrix embeds the dense mirror as a
    # program CONSTANT, and relay-attached chips reject oversized compile
    # requests (HTTP 413 — the mxu6 conn-table trap); ~5k-square f32
    # fits, 10k-square (400 MB) stays on the sparse route.
    'dense_mm_max_bytes': int(
        os.environ.get('BRAINEVENT_DENSE_MM_MAX_BYTES', 128 * 1024 * 1024)),
    # Event-driven scatter kernels size their static active-spike capacity as
    # n_pre // divisor (>= 128). Overflow falls back to a full scatter via
    # lax.cond, so results stay exact at any firing rate.
    'event_capacity_divisor': int(
        os.environ.get('BRAINEVENT_EVENT_CAPACITY_DIVISOR', 32)),
    # Final exact fallback of the JITC event-compacted route (a
    # 4x-capacity escalation pass absorbs bursts first, so this fires
    # almost never): 'engine' = the XLA walk (no extra Mosaic compile —
    # measured 80k JITCNet: compile 1415 -> 144 s, step 3341 -> 2142
    # us), 'lockstep' = the Mosaic slot-scan kernel (faster final-
    # fallback steps, minutes of extra compile at large shapes).
    'jitc_event_fallback': os.environ.get(
        'BRAINEVENT_JITC_EVENT_FALLBACK', 'engine'),
    # JITC matrix classes transparently build + cache a walk plan on the
    # first concrete 1-D product and reuse it (the stationary-q setup is
    # ~70% of every per-call product; measured 7.5x at (2k,2k)).
    'jitc_auto_plan': os.environ.get(
        'BRAINEVENT_JITC_AUTO_PLAN', '1') not in ('0', 'false', 'False'),
    # bf16 split depth of the MXU one-hot scatter's value factor
    # (ops/scatter.py). The index factor is an exact 0/1 one-hot, so
    # only the VALUE operand needs mantissa passes: 3 reconstructs f32
    # exactly in half the MXU passes of a HIGHEST (6-pass) f32 dot.
    # Measured (scripts/tpu_scatter_passes_ab.py, v5e): the route is NOT
    # MXU-pass-bound — p3 ties p6 at (E=92k, n=80k) 613 vs 609 us and
    # LOSES at (40k, 20k) 104 vs 84; only the lossy p2 wins (73 vs 113
    # at 40k/40k, ~2^-16 rel err). Default stays the exact HIGHEST dot;
    # set 2 to trade mantissa for ~1.3-1.5x at mid shapes.
    'scatter_passes': int(os.environ.get('BRAINEVENT_SCATTER_PASSES', 6)),
    # Outputs at or above this switch event scatter-add to the sorted
    # windowed strategy (ops/scatter.py _windowed_scatter_add) when the
    # stream is dense enough: sort by block + per-chunk W-block dots
    # replace the (B, E) one-hot whose build/traffic dominates at large
    # B. Measured v5e crossover vs the one-hot route is below 81920
    # (612 -> 293 us at E=92160); 0 disables.
    'windowed_scatter_min_out': int(
        os.environ.get('BRAINEVENT_WINDOWED_SCATTER_MIN_OUT', 65536)),
    # bf16 split depth of BOTH MXU stages of the plan-based mm kernel
    # (ops/mxu_gather.gather_matmat): 3 = exact f32 (default; 4.2 ms at
    # the (10k,10k,1%,B=256) row vs 16.5 ms segment-sum), 2 = ~2^-16
    # relative error at ~2.5 ms (BENCH_NOTES r5).
    'mm_passes': int(os.environ.get('BRAINEVENT_MM_PASSES', 3)),
    # Persistent XLA compilation cache directory (None = disabled). The
    # TPU analog of the reference's kernix content-hash artifact cache
    # (``brainevent/_op/kernix_cache.py:41``): the expensive artifacts
    # here are the 85-160 s Mosaic mega-kernel compiles, and this makes
    # every process after the first reuse the serialized executable.
    # Wired at package import from ``BRAINEVENT_COMPILATION_CACHE``
    # ('' / '0' / 'off' disable; a path overrides; unset = default
    # ``~/.cache/brainevent_tpu/xla_cache``).
    'compilation_cache_dir': None,
}


def set_mm_passes(n: int) -> None:
    """Set the bf16 mantissa-pass depth of the plan-based mm kernel
    (3 = exact f32, 2 = ~2^-16 relative error, one third less MXU work)."""
    n = int(n)
    if n not in (1, 2, 3):
        raise ValueError(f'mm_passes must be 1, 2 or 3, got {n}.')
    _state['mm_passes'] = n


def get_mm_passes() -> int:
    """Return the mm kernel's bf16 mantissa-pass depth."""
    return _state['mm_passes']


def set_compilation_cache(path: "Optional[str]" = '',
                          *, min_compile_time_secs: float = 1.0) -> None:
    """Enable (or disable) JAX's persistent compilation cache.

    TPU-native replacement for the reference's on-disk kernel artifact
    cache (``brainevent/_op/kernix_cache.py:41`` — pay nvcc once per
    content hash): here the expensive artifact is the serialized XLA
    executable (Mosaic mega-kernels compile in minutes at 400k-neuron
    scale), and JAX's persistent cache keys it by HLO/compile-options
    hash so subsequent *processes* skip the compile entirely.

    Parameters
    ----------
    path : str or None
        Cache directory. ``''`` (default) selects
        ``~/.cache/brainevent_tpu/xla_cache``; ``None`` disables the
        cache.
    min_compile_time_secs : float
        Only compiles at least this slow are persisted (keeps the cache
        free of trivially recompilable programs). Pass ``0.0`` to
        persist everything (useful in tests).
    """
    import jax

    if path is None:
        _state['compilation_cache_dir'] = None
        try:
            jax.config.update('jax_compilation_cache_dir', None)
        except Exception:
            pass
        return
    if path == '':
        path = os.path.join(os.path.expanduser('~'), '.cache',
                            'brainevent_tpu', 'xla_cache')
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    try:
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          float(min_compile_time_secs))
    except Exception:  # knob renamed/absent in some jax versions
        pass
    try:
        # Persist even small executables once they pass the time bar.
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:
        pass
    _state['compilation_cache_dir'] = path


def get_compilation_cache() -> "Optional[str]":
    """Return the persistent compilation cache directory (or ``None``)."""
    return _state['compilation_cache_dir']


def _init_compilation_cache_from_env() -> None:
    """Wire the persistent cache at import time from the environment.

    ``BRAINEVENT_COMPILATION_CACHE``: unset -> default cache dir; a path
    -> that dir; '', '0', 'off', 'false' -> disabled. Never raises (a
    read-only home dir simply leaves the cache off).
    """
    raw = os.environ.get('BRAINEVENT_COMPILATION_CACHE')
    if raw is not None and raw.strip().lower() in ('', '0', 'off', 'false', 'none'):
        return
    try:
        # 5 s floor: keeps cheap (and occasionally machine-feature-fussy)
        # CPU executables out of the cache while capturing every
        # expensive TPU kernel; explicit set_compilation_cache() calls
        # choose their own floor.
        set_compilation_cache(raw if raw is not None else '',
                              min_compile_time_secs=5.0)
    except Exception:
        _state['compilation_cache_dir'] = None


# ----------------------------------------------------------------------------
# Numba threading (parity with reference brainevent/config.py:45-119).
# ----------------------------------------------------------------------------

def set_numba_parallel(parallel: bool = True, num_threads: Optional[int] = None) -> None:
    """Configure Numba CPU-kernel parallelism.

    Kept for API parity with the reference; it only takes effect when numba
    is installed and numba-backed kernels are used. On TPU-only deployments
    this is inert.
    """
    if num_threads is not None:
        num_threads = int(num_threads)
        if num_threads <= 0:
            raise ValueError(f'num_threads must be positive, got {num_threads}.')
        try:
            import numba  # noqa: F401
            numba.set_num_threads(num_threads)
        except ImportError:
            pass
    _state['numba_parallel'] = bool(parallel)
    _state['numba_num_threads'] = num_threads


def get_numba_parallel() -> bool:
    """Return whether Numba CPU kernels should use ``prange`` parallelism."""
    return _state['numba_parallel']


def get_numba_num_threads() -> Optional[int]:
    """Return the configured Numba thread count (``None`` = numba default)."""
    return _state['numba_num_threads']


# ----------------------------------------------------------------------------
# LFSR algorithm selection (parity with reference brainevent/config.py:155-190).
# ----------------------------------------------------------------------------

def set_lfsr_algorithm(algorithm: str) -> None:
    """Select the LFSR family used by the Pallas RNG classes.

    One of ``'lfsr88'``, ``'lfsr113'``, ``'lfsr128'``. Affects
    :func:`brainevent_tpu.get_pallas_lfsr_rng_class`.
    """
    algorithm = str(algorithm).lower()
    if algorithm not in _LFSR_ALGORITHMS:
        raise ValueError(
            f'Unknown LFSR algorithm {algorithm!r}; expected one of {_LFSR_ALGORITHMS}.'
        )
    _state['lfsr_algorithm'] = algorithm


def get_lfsr_algorithm() -> str:
    """Return the currently selected LFSR algorithm name."""
    return _state['lfsr_algorithm']


# ----------------------------------------------------------------------------
# Global per-platform backend map (parity with brainevent/config.py:220-324).
# ----------------------------------------------------------------------------

def set_backend(platform: str, backend: Optional[str]) -> None:
    """Set the global default backend for *platform*.

    Backend-selection priority (highest first), identical to the reference
    (``brainevent/_op/main.py:504-548``)::

        per-call backend= kwarg  >  config.set_backend(platform, backend)
        >  per-primitive default  >  first registered backend

    Passing ``backend=None`` clears the global choice for *platform*.
    """
    platform = str(platform).lower()
    if platform not in _KNOWN_PLATFORMS:
        raise ValueError(
            f'Unknown platform {platform!r}; expected one of {_KNOWN_PLATFORMS}.'
        )
    if platform == 'cuda':
        platform = 'gpu'
    if backend is None:
        _state['backends'].pop(platform, None)
    else:
        _state['backends'][platform] = str(backend)


def get_backend(platform: str) -> Optional[str]:
    """Return the globally configured backend for *platform* (or ``None``)."""
    platform = str(platform).lower()
    if platform == 'cuda':
        platform = 'gpu'
    return _state['backends'].get(platform)


def clear_backends() -> None:
    """Clear every globally configured per-platform backend."""
    _state['backends'] = {}


# ----------------------------------------------------------------------------
# CUDA toolchain preferences — API parity only; inert on TPU hosts
# (reference brainevent/config.py:366-421).
# ----------------------------------------------------------------------------

def prefer_system_nvcc(enable: bool = True) -> None:
    """Prefer a system-installed nvcc over pip-bundled toolchains.

    Parity shim: stored and honored by the CUDA pipeline when CUDA is
    available; a no-op on TPU/CPU-only machines.
    """
    _state['prefer_system_nvcc'] = bool(enable)


def set_compute_capability(value: "str | list[str] | None" = None) -> None:
    """Override the GPU compute capabilities targeted by CUDA compilation.

    Parity shim (reference ``brainevent/config.py:387``); stored but unused
    on TPU/CPU-only machines.
    """
    if value is None:
        _state['compute_capability'] = None
    elif isinstance(value, str):
        _state['compute_capability'] = [value]
    else:
        _state['compute_capability'] = [str(v) for v in value]


def get_compute_capability() -> "list[str] | None":
    """Return the configured compute-capability override (or ``None``)."""
    return _state['compute_capability']


# ----------------------------------------------------------------------------
# TPU-first additions.
# ----------------------------------------------------------------------------

def set_pallas_interpret(value: Optional[bool]) -> None:
    """Force Pallas kernels into interpreter mode (CPU-executable).

    ``True`` forces interpret mode everywhere, ``False`` forbids it, ``None``
    (default) auto-selects: compiled on TPU, interpreted elsewhere. This is
    how the full TPU kernel suite runs on CPU-only CI, replacing the
    reference's "recording fake ffi_call" trick
    (``brainevent/_csr/_test_util.py:357``).
    """
    if value is not None:
        value = bool(value)
    _state['pallas_interpret'] = value


def get_pallas_interpret() -> Optional[bool]:
    """Return the Pallas interpret-mode override (``None`` = auto)."""
    return _state['pallas_interpret']


def set_mxu_scatter_limit(n: int) -> None:
    """Set the output-size threshold for the MXU one-hot scatter strategy.

    Event scatter-adds with ``n_out`` at or below this limit are computed as
    one-hot matmuls on the MXU (no atomics needed — the TPU-native
    replacement for the reference's CUDA hybrid atomics/task-queue kernels,
    ``brainevent/_csr/binary_csrmv_hybrid.cu``); larger outputs use XLA
    scatter.
    """
    n = int(n)
    if n < 0:
        raise ValueError(f'mxu_scatter_limit must be >= 0, got {n}.')
    _state['mxu_scatter_limit'] = n


def get_mxu_scatter_limit() -> int:
    """Return the MXU one-hot scatter output-size threshold."""
    return _state['mxu_scatter_limit']


def set_event_capacity_divisor(n: int) -> None:
    """Set the static active-spike capacity divisor of event scatter kernels.

    The transpose (scatter) direction of the fixed-connectivity event
    products compacts spikes into a static buffer of
    ``max(128, n_pre // divisor)`` entries and falls back to a full scatter
    (``lax.cond``) if more neurons fire. Smaller divisors = more headroom,
    larger = faster steady state. Results are exact either way.
    """
    n = int(n)
    if n < 1:
        raise ValueError(f'divisor must be >= 1, got {n}.')
    _state['event_capacity_divisor'] = n


def get_event_capacity_divisor() -> int:
    """Return the event-capacity divisor (see :func:`set_event_capacity_divisor`)."""
    return _state['event_capacity_divisor']


def set_jitc_event_fallback(route: str) -> None:
    """Choose the exact overflow fallback of the JITC event route.

    A 4x-capacity escalation pass of the same XLA route absorbs bursts
    before this final fallback, so it fires almost never. ``'engine'``
    (default) falls back to the XLA walk — no extra Mosaic compile
    (measured 80k JITCNet: compile 1415 -> 144 s, step 3341 -> 2142
    us/step). ``'lockstep'`` falls back to the Mosaic slot-scan kernel
    — faster final-fallback steps at minutes of extra compile at large
    shapes. Read at trace time.
    """
    if route not in ('lockstep', 'engine'):
        raise ValueError(
            f"route must be 'lockstep' or 'engine', got {route!r}")
    _state['jitc_event_fallback'] = route


def get_jitc_event_fallback() -> str:
    """Return the JITC event-route fallback (see
    :func:`set_jitc_event_fallback`)."""
    return _state['jitc_event_fallback']


def set_jitc_auto_plan(enabled: bool) -> None:
    """Enable/disable transparent walk-plan caching on the JITC classes.

    When on (default), the first 1-D product of a matrix with concrete
    buffers builds a :class:`~brainevent_tpu.jitc.JITCWalkPlan` and
    every later 1-D product reuses it — same sampled matrix, the
    stationary-q setup paid once. 2-D products keep the direct route
    (they sample the mm-mode matrix by contract). Off restores
    per-call setup everywhere.
    """
    _state['jitc_auto_plan'] = bool(enabled)


def get_jitc_auto_plan() -> bool:
    """Return whether JITC auto-plan caching is on (see
    :func:`set_jitc_auto_plan`)."""
    return _state['jitc_auto_plan']


def set_auto_mxu_plan(mode) -> None:
    """Control lazy auto-building of the MXU gather plans on CSR/FCN.

    ``'auto'`` (default): the first float 1-D product of a matrix with
    concrete structure builds and caches the blocked one-hot plan pair
    (``ops/mxu_gather.py``) when the default platform is TPU and
    ``nse >= mxu_plan_min_nse`` — the lazy-mirror pattern of the
    reference (``brainevent/_csr/main.py:1321``), no manual
    ``build_mxu_plan()`` call needed. ``True``: auto-build on every
    platform (CPU runs the plan kernels in interpreter mode — test use
    only). ``False``: never auto-build; explicit ``build_mxu_plan()``
    still works.
    """
    if mode not in ('auto', True, False):
        raise ValueError(f"auto_mxu_plan must be 'auto', True or False, "
                         f"got {mode!r}.")
    _state['auto_mxu_plan'] = mode


def get_auto_mxu_plan():
    """Return the auto-plan mode (see :func:`set_auto_mxu_plan`)."""
    return _state['auto_mxu_plan']


def set_dense_mm_max_bytes(n: int) -> None:
    """Byte budget for the cached-dense mat-mat route on CSR/FCN classes
    (default 128 MB, 0 = off): with concrete data on TPU, a 2-D product
    whose dense form fits the budget runs as a cached dense matmul on
    the MXU — measured ~17-25x over the segment-sum route at the
    reference's 5k/10k mm rows (BENCH_NOTES r4f); at ~1% density the
    MXU retires the 100x MAC overhead far faster than XLA's serialized
    gathers retire the sparse formulation. Raising it past ~128 MB is
    safe only outside closure-capturing jits (the dense mirror embeds as
    a program constant; relay compile requests reject at ~hundreds of
    MB with HTTP 413)."""
    n = int(n)
    if n < 0:
        raise ValueError(f'dense_mm_max_bytes must be >= 0, got {n}.')
    _state['dense_mm_max_bytes'] = n


def get_dense_mm_max_bytes() -> int:
    """Return the cached-dense mm byte budget (see
    :func:`set_dense_mm_max_bytes`)."""
    return _state['dense_mm_max_bytes']


def set_mxu_plan_min_nse(n: int) -> None:
    """Minimum nnz for lazy MXU-plan auto-build (default 65536): below
    it the XLA gather route is already cheap and the host-side plan
    build (an O(nse log nse) lexsort) is not worth paying."""
    n = int(n)
    if n < 0:
        raise ValueError(f'mxu_plan_min_nse must be >= 0, got {n}.')
    _state['mxu_plan_min_nse'] = n


def get_mxu_plan_min_nse() -> int:
    """Return the auto-build nnz threshold (see
    :func:`set_mxu_plan_min_nse`)."""
    return _state['mxu_plan_min_nse']


def set_scatter_passes(passes: int) -> None:
    """Set the bf16 split depth of the MXU one-hot scatter value factor.

    The one-hot scatter (:func:`brainevent_tpu.ops.scatter.event_scatter_add`)
    contracts an exact 0/1 index one-hot against a value factor on the
    MXU. Only the value operand carries mantissa, so splitting IT into
    bf16 components and running one full-rate bf16 pass per component
    replaces the legacy HIGHEST (6-pass) f32 dot:

    - ``6`` (default): one HIGHEST f32 dot (values stay f32) — exact.
    - ``3``: reconstructs f32 exactly in half the MXU passes; measured
      a TIE at large shapes on v5e (the route is bound by the one-hot
      factor build/traffic, not MXU passes — see
      ``scripts/tpu_scatter_passes_ab.py``).
    - ``2``: ~16 mantissa bits (relative error ~2^-16); the only
      setting with a measured win (~1.3-1.5x at 20k-40k outputs).
    - ``1``: raw bf16 (relative error ~2^-8).
    """
    passes = int(passes)
    if passes not in (1, 2, 3, 6):
        raise ValueError(f'scatter passes must be 1, 2, 3 or 6, got {passes}')
    _state['scatter_passes'] = passes


def get_scatter_passes() -> int:
    """Return the MXU scatter bf16 split depth (see
    :func:`set_scatter_passes`)."""
    return _state['scatter_passes']


def set_windowed_scatter_min_out(n: int) -> None:
    """Set the output size at which event scatter-add switches to the
    sorted windowed strategy.

    Above this many output elements (and for dense-enough event
    streams), :func:`~brainevent_tpu.ops.scatter.event_scatter_add`
    sorts events by 128-lane output block and contracts each sorted
    chunk against only a small block window, instead of materializing
    the ``(n_out/128, E)`` one-hot factor whose build/traffic dominates
    at large outputs. Measured ~2x at ``n_out`` 80k-160k on v5e
    (``scripts/tpu_windowed_scatter_proto.py``). ``0`` disables the
    route everywhere.
    """
    _state['windowed_scatter_min_out'] = int(n)


def get_windowed_scatter_min_out() -> int:
    """Return the windowed-scatter activation threshold (see
    :func:`set_windowed_scatter_min_out`)."""
    return _state['windowed_scatter_min_out']
