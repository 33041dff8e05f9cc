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

"""CSR strategy auto-tuner (reference ``brainevent/_csr/initialize.py``).

``init_csr_config`` benchmarks the transpose (scatter-direction) event SpMV
on the live chip across candidate MXU-scatter limits, picks the winner, and
persists it per device generation — the TPU counterpart of the reference's
hybrid-CUDA-kernel auto-tuner.
"""

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .. import config as global_config
from .block_config import HybridConfig, get_hybrid_config, save_hybrid_config
from .binary import binary_csrmv_p_call

__all__ = ['run_benchmark', 'init_csr_config']


def _bench_once(n: int, conn: float, rate: float, limit: int,
                iterations: int = 1000, n_runs: int = 5) -> float:
    """Seconds per op application of the transpose event SpMV at one
    scatter limit, measured with the fused-loop harness (*iterations*
    applications per device call) so relay-attached hosts time the op, not
    the transport."""
    from ..ops.benchmark import benchmark_function

    rng = np.random.default_rng(0)
    nse = max(1, int(n * n * conn))
    indices = jnp.asarray(rng.integers(0, n, nse), dtype=jnp.int32)
    counts = np.full(n, nse // n)
    counts[: nse % n] += 1
    indptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]), dtype=jnp.int32)
    w = jnp.asarray(rng.normal(size=nse), dtype=jnp.float32)
    v = jnp.asarray(rng.random(n) < rate)

    old = global_config.get_mxu_scatter_limit()
    global_config.set_mxu_scatter_limit(limit)
    try:
        res = benchmark_function(
            lambda *a, **kw: binary_csrmv_p_call(*a, **kw)[0],
            w, indices, indptr, v,
            name=f'n={n},limit={limit}', shape=(n, n), transpose=True,
            n_warmup=1, n_runs=n_runs, verbose=False,
            iterations=iterations, loop_arg=3)
        return res.records[0].us_per_call * 1e-6
    finally:
        global_config.set_mxu_scatter_limit(old)


def run_benchmark(n: int = 4096, conn: float = 0.02, rate: float = 0.01,
                  limits: Sequence[int] = (0, 16384, 65536, 262144),
                  verbose: bool = True, iterations: int = 1000):
    """Benchmark candidate MXU-scatter limits; returns ``{limit: seconds}``
    per op application."""
    results = {}
    for limit in limits:
        results[limit] = _bench_once(n, conn, rate, limit,
                                     iterations=iterations)
        if verbose:
            print(f'  mxu_scatter_limit={limit:>8d}: '
                  f'{results[limit]*1e6:9.2f} us/call', flush=True)
    return results


def init_csr_config(ns: Sequence[int] = (4096, 40960, 409600),
                    rates: Sequence[float] = (0.001, 0.01, 0.1),
                    conn_per_row: int = 80,
                    verbose: bool = True,
                    persist: bool = True,
                    iterations: int = 1000) -> HybridConfig:
    """Auto-tune the MXU-scatter crossover on the live device and persist it.

    For each output size in *ns* (at the reference workload's ~80
    connections/row, ``/root/reference/examples/COBA_2005.py``), times the
    transpose event SpMV with the one-hot-MXU strategy forced on vs off
    across *rates*; ``mxu_scatter_limit`` is set to the largest output size
    where the MXU strategy still wins at every rate. The winner persists
    per device kind (the TPU counterpart of the reference's per-GPU hybrid
    JSON, ``brainevent/_csr/hybrid_config.py:230-296``). Returns the
    applied :class:`HybridConfig`.
    """
    huge = 1 << 30
    best_limit = 0
    table = {}
    for n in sorted(ns):
        conn = min(1.0, conn_per_row / n)
        mxu_wins = True
        for rate in rates:
            t_mxu = _bench_once(n, conn, rate, huge, iterations=iterations)
            t_xla = _bench_once(n, conn, rate, 0, iterations=iterations)
            table[(n, rate)] = (t_mxu, t_xla)
            if verbose:
                print(f'  n={n:>7d} rate={rate:6.3f}: mxu '
                      f'{t_mxu*1e6:9.2f} us  xla {t_xla*1e6:9.2f} us  -> '
                      f'{"mxu" if t_mxu <= t_xla else "xla"}', flush=True)
            mxu_wins &= t_mxu <= t_xla
        if not mxu_wins:
            # The persisted limit means "MXU wins for every size <= limit";
            # a loss at this size caps it even if some larger size would
            # win again (the crossover need not be monotone — do not enable
            # MXU over a measured losing region).
            break
        best_limit = max(best_limit, int(n))
    cfg = get_hybrid_config()
    cfg = HybridConfig(block_size=cfg.block_size,
                       mxu_scatter_limit=best_limit,
                       nse_chunk=cfg.nse_chunk)
    global_config.set_mxu_scatter_limit(best_limit)
    if persist:
        save_hybrid_config(cfg)
    if verbose:
        print(f'init_csr_config: picked mxu_scatter_limit={best_limit}')
    return cfg
