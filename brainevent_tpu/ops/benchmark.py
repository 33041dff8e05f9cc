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

"""Benchmark harness (capability parity with ``brainevent/_op/benchmark.py``).

Times jitted callables with warmup + ``block_until_ready``, groups records by
fixed/vary keys, computes baseline speedups, and exports CSV/JSON/pickle.
Plotting (matplotlib/seaborn) is optional and gated.
"""

import dataclasses
import json
import pickle
import statistics
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

__all__ = [
    'BenchmarkConfig',
    'BenchmarkRecord',
    'BenchmarkResult',
    'benchmark_function',
]


@dataclasses.dataclass
class BenchmarkConfig:
    """One benchmark point: a name, positional args, and static kwargs
    (reference ``brainevent/_op/benchmark.py:42``).

    ``loop_arg`` names the positional argument that carries the fused-loop
    dependence when benchmarking with ``iterations > 1`` (see
    :func:`benchmark_function`); it should be the op's dense operand.
    """
    name: str
    args: Tuple = ()
    kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    loop_arg: int = -1


@dataclasses.dataclass
class BenchmarkRecord:
    """Timing record for one (function, config) pair
    (reference ``brainevent/_op/benchmark.py:79``)."""
    name: str
    mean_ms: float
    std_ms: float
    min_ms: float
    max_ms: float
    n_runs: int
    throughput: Optional[float] = None
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)
    iterations: int = 1

    @property
    def us_per_call(self) -> float:
        """Time per op application in microseconds.

        Prefers the relay-corrected differenced estimate
        (``metadata['us_per_call_diff']``, see :func:`benchmark_function`)
        when present; otherwise mean total / iterations."""
        if self.metadata and 'us_per_call_diff' in self.metadata:
            return self.metadata['us_per_call_diff']
        return self.mean_ms * 1e3 / max(1, self.iterations)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d['us_per_call'] = self.us_per_call
        return d


class BenchmarkResult:
    """A collection of :class:`BenchmarkRecord` with grouping, baseline
    comparison, pretty-printing, and export
    (reference ``brainevent/_op/benchmark.py:125``)."""

    def __init__(self, records: Sequence[BenchmarkRecord]):
        self.records: List[BenchmarkRecord] = list(records)

    # -- analysis ------------------------------------------------------

    def group_by(self, key_fn: Callable[[BenchmarkRecord], Any]) -> Dict[Any, 'BenchmarkResult']:
        groups: Dict[Any, List[BenchmarkRecord]] = {}
        for rec in self.records:
            groups.setdefault(key_fn(rec), []).append(rec)
        return {k: BenchmarkResult(v) for k, v in groups.items()}

    def compare_by(self, baseline_name: str) -> Dict[str, float]:
        """Speedup of every record relative to the record named *baseline_name*."""
        base = next((r for r in self.records if r.name == baseline_name), None)
        if base is None:
            raise KeyError(
                f'No record named {baseline_name!r}; have '
                f'{[r.name for r in self.records]}.'
            )
        return {r.name: base.mean_ms / r.mean_ms for r in self.records}

    def best(self) -> BenchmarkRecord:
        return min(self.records, key=lambda r: r.mean_ms)

    # -- export --------------------------------------------------------

    def to_json(self, path: Optional[str] = None) -> str:
        payload = json.dumps([r.to_dict() for r in self.records], indent=2)
        if path:
            with open(path, 'w') as f:
                f.write(payload)
        return payload

    def to_csv(self, path: Optional[str] = None) -> str:
        header = 'name,mean_ms,std_ms,min_ms,max_ms,n_runs,throughput'
        lines = [header] + [
            f'{r.name},{r.mean_ms},{r.std_ms},{r.min_ms},{r.max_ms},'
            f'{r.n_runs},{r.throughput if r.throughput is not None else ""}'
            for r in self.records
        ]
        payload = '\n'.join(lines)
        if path:
            with open(path, 'w') as f:
                f.write(payload)
        return payload

    def to_pickle(self, path: str) -> None:
        with open(path, 'wb') as f:
            pickle.dump(self.records, f)

    def plot(self, **kwargs):  # pragma: no cover - optional dependency
        """Bar plot of mean times; requires matplotlib."""
        try:
            import matplotlib.pyplot as plt
        except ImportError:
            raise ImportError('Plotting requires matplotlib.') from None
        names = [r.name for r in self.records]
        means = [r.mean_ms for r in self.records]
        stds = [r.std_ms for r in self.records]
        fig, ax = plt.subplots(figsize=kwargs.pop('figsize', (10, 4)))
        ax.barh(names, means, xerr=stds)
        ax.set_xlabel('mean time (ms)')
        fig.tight_layout()
        return fig

    def __repr__(self):
        lines = [f'BenchmarkResult({len(self.records)} records)']
        for r in sorted(self.records, key=lambda r: r.mean_ms):
            lines.append(
                f'  {r.name:<60s} {r.mean_ms:10.4f} ms '
                f'(±{r.std_ms:.4f}, min {r.min_ms:.4f})'
            )
        return '\n'.join(lines)


def _looped(fn, iterations: int, loop_arg: int, kwargs):
    """Wrap *fn* in a ``fori_loop`` applying it *iterations* times inside ONE
    jitted computation.

    Hosts that reach the accelerator through a relay pay ~30-40 ms per
    device call, so timing a microsecond-scale op per-call measures only the
    transport. The loop injects a loop-carried dependence through
    ``args[loop_arg]`` (adding/xoring a runtime-false perturbation derived
    from the previous output) so XLA can neither hoist the loop-invariant op
    out of the loop nor CSE the iterations away; the injected term is exact
    zero for bool/int operands and below f32 resolution for floats.
    """
    import jax.numpy as jnp

    def call(*a):
        la = loop_arg % len(a)
        x0 = a[la]

        def body(_, acc):
            gate = acc < jnp.float32(-1e30)            # runtime-false
            if x0.dtype == jnp.bool_:
                x = x0 ^ gate
            elif jnp.issubdtype(x0.dtype, jnp.integer):
                x = x0 + gate.astype(x0.dtype)
            else:
                x = x0 + (acc * jnp.asarray(1e-38, x0.dtype)
                          ).astype(x0.dtype)
            out = fn(*a[:la], x, *a[la + 1:], **kwargs)
            first = out[0] if isinstance(out, (tuple, list)) else out
            # depend on EVERY output element: a single-element carry lets
            # XLA dead-code the rest of the iteration's work
            return jnp.sum(first).astype(jnp.float32)

        return jax.lax.fori_loop(0, iterations, body, jnp.float32(0))

    return call


def benchmark_function(
    fn: Callable,
    *args,
    name: Optional[str] = None,
    n_warmup: int = 3,
    n_runs: int = 10,
    verbose: bool = True,
    jit: bool = True,
    iterations: int = 1,
    loop_arg: int = -1,
    vary_runs: bool = True,
    **kwargs,
) -> BenchmarkResult:
    """Time ``fn(*args, **kwargs)`` with warmup and ``block_until_ready``
    (reference ``brainevent/_op/benchmark.py:1514``).

    The callable is jitted once (unless ``jit=False``), warmed up
    *n_warmup* times, then timed *n_runs* times. With ``iterations > 1``
    the op is applied that many times inside one fused loop per device
    call (see :func:`_looped`) and recorded times stay TOTAL —
    ``BenchmarkRecord.us_per_call`` divides them out.

    ``vary_runs`` times every run on a DISTINCT input (``args[loop_arg]``
    rolled by the run index, pre-staged on device before the clock
    starts). Relay-attached accelerators on this host cache byte-identical
    execute calls — repeating the warm-up call times the cache, not the op
    (measured: a 37 ms fused loop reading as 0.05 ms).
    """
    import jax.numpy as jnp

    name = name or getattr(fn, '__name__', 'fn')
    if iterations > 1:
        call = jax.jit(_looped(fn, iterations, loop_arg, kwargs))
    else:
        call = jax.jit(lambda *a: fn(*a, **kwargs)) if jit else (lambda *a: fn(*a, **kwargs))

    n_runs = max(1, n_runs)
    la = loop_arg % len(args) if args else 0
    variants = [args]
    if vary_runs and args and hasattr(args[la], 'ndim') and args[la].ndim >= 1 \
            and args[la].shape[0] > 1:
        variants = []
        dim0 = args[la].shape[0]
        for k in range(n_runs):
            # Never let a roll wrap to 0 (mod dim0): that variant would be
            # byte-identical to the warm-up input — the relay-cache trap
            # vary_runs exists to avoid.
            rolled = jnp.roll(args[la], (k % (dim0 - 1)) + 1, axis=0)
            variants.append(args[:la] + (rolled,) + args[la + 1:])

    def timed(c, v):
        """Milliseconds for one device call, forced by a scalar read."""
        t0 = time.perf_counter()
        out = c(*v)
        first = out[0] if isinstance(out, (tuple, list)) else out
        float(first.ravel()[0])
        return (time.perf_counter() - t0) * 1e3

    for _ in range(max(0, n_warmup)):
        timed(call, args)
    if len(variants) > 1:
        # one untimed pass per variant: forces each rolled input onto the
        # device (and past the relay) before the clock starts
        for v in variants:
            timed(call, v)

    times_ms = [timed(call, variants[r % len(variants)])
                for r in range(n_runs)]
    meta = {}
    if iterations > 1:
        # relay-attached hosts add a large per-call constant (latency +
        # transfer + read); difference the K-loop against a 1-loop so the
        # constant cancels and us_per_call reflects the op alone.
        call1 = jax.jit(_looped(fn, 1, loop_arg, kwargs))
        timed(call1, args)      # compile + warm
        t1 = [timed(call1, variants[r % len(variants)])
              for r in range(n_runs)]
        t1_ms = statistics.fmean(t1)
        meta['base_ms'] = t1_ms
        meta['us_per_call_diff'] = max(
            0.0, (statistics.fmean(times_ms) - t1_ms)
            / (iterations - 1) * 1e3)
        if statistics.fmean(times_ms) - t1_ms < max(
                statistics.stdev(times_ms) if len(times_ms) > 1 else 0.0,
                statistics.stdev(t1) if len(t1) > 1 else 0.0):
            # the K-vs-1 difference is inside the noise band: K iterations
            # of this op sit below the relay's per-call floor (~35 ms) and
            # us_per_call is unresolved (often exactly 0.0). Seen in the
            # r03 mm/dt2t/plasticity grids at iterations=20.
            import warnings
            warnings.warn(
                f'{name}: differenced per-call time is below measurement '
                f'noise at iterations={iterations}; increase iterations '
                f'(e.g. 1000) to resolve sub-ms ops through the relay.',
                stacklevel=2)
            meta['unresolved'] = True

    rec = BenchmarkRecord(
        name=name,
        mean_ms=statistics.fmean(times_ms),
        std_ms=statistics.stdev(times_ms) if len(times_ms) > 1 else 0.0,
        min_ms=min(times_ms),
        max_ms=max(times_ms),
        n_runs=len(times_ms),
        iterations=max(1, iterations),
        metadata=meta,
    )
    if verbose:
        extra = (f', {rec.us_per_call:.3f} us/call'
                 if 'us_per_call_diff' not in meta else
                 f', {meta["us_per_call_diff"]:.3f} us/call '
                 f'(diff vs base {meta["base_ms"]:.3f} ms)')
        print(f'{rec.name}: {rec.mean_ms:.4f} ms (±{rec.std_ms:.4f}, '
              f'min {rec.min_ms:.4f}{extra})', flush=True)
    return BenchmarkResult([rec])
