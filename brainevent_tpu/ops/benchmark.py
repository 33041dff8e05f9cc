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

__all__ = [
    'BenchmarkConfig',
    'BenchmarkRecord',
    'BenchmarkResult',
    'benchmark_function',
]


@dataclasses.dataclass
class BenchmarkConfig:
    """One benchmark point: a name, positional args, and static kwargs
    (reference ``brainevent/_op/benchmark.py:42``)."""
    name: str
    args: Tuple = ()
    kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)


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

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


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


def benchmark_function(
    fn: Callable,
    *args,
    name: Optional[str] = None,
    n_warmup: int = 3,
    n_runs: int = 10,
    verbose: bool = True,
    jit: bool = True,
    **kwargs,
) -> BenchmarkResult:
    """Time ``fn(*args, **kwargs)`` with warmup and ``block_until_ready``
    (reference ``brainevent/_op/benchmark.py:1514``).

    The callable is jitted once (unless ``jit=False``), warmed up
    *n_warmup* times, then timed *n_runs* times.
    """
    name = name or getattr(fn, '__name__', 'fn')
    call = jax.jit(lambda *a: fn(*a, **kwargs)) if jit else (lambda *a: fn(*a, **kwargs))

    for _ in range(max(0, n_warmup)):
        jax.block_until_ready(call(*args))

    times_ms = []
    for _ in range(max(1, n_runs)):
        t0 = time.perf_counter()
        jax.block_until_ready(call(*args))
        times_ms.append((time.perf_counter() - t0) * 1e3)

    rec = BenchmarkRecord(
        name=name,
        mean_ms=statistics.fmean(times_ms),
        std_ms=statistics.stdev(times_ms) if len(times_ms) > 1 else 0.0,
        min_ms=min(times_ms),
        max_ms=max(times_ms),
        n_runs=len(times_ms),
    )
    if verbose:
        print(f'{rec.name}: {rec.mean_ms:.4f} ms (±{rec.std_ms:.4f}, min {rec.min_ms:.4f})')
    return BenchmarkResult([rec])
