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

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as global_config
from .block_config import HybridConfig, get_hybrid_config, save_hybrid_config
from .binary import binary_csrmv_p_call

__all__ = ['run_benchmark', 'init_csr_config']


def _bench_once(n: int, conn: float, rate: float, limit: int,
                n_iters: int = 20) -> float:
    """Median seconds/call of the transpose event SpMV at one scatter limit."""
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
        fn = jax.jit(lambda *a: binary_csrmv_p_call(
            *a, shape=(n, n), transpose=True)[0])
        jax.block_until_ready(fn(w, indices, indptr, v))
        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(w, indices, indptr, v))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))
    finally:
        global_config.set_mxu_scatter_limit(old)


def run_benchmark(n: int = 4096, conn: float = 0.02, rate: float = 0.01,
                  limits: Sequence[int] = (0, 16384, 65536, 262144),
                  verbose: bool = True):
    """Benchmark candidate MXU-scatter limits; returns ``{limit: seconds}``."""
    results = {}
    for limit in limits:
        results[limit] = _bench_once(n, conn, rate, limit)
        if verbose:
            print(f'  mxu_scatter_limit={limit:>8d}: {results[limit]*1e6:9.1f} us')
    return results


def init_csr_config(n: int = 4096, conn: float = 0.02, rate: float = 0.01,
                    verbose: bool = True,
                    persist: bool = True) -> HybridConfig:
    """Auto-tune the CSR scatter strategy on the live device and persist it.

    Returns the winning :class:`HybridConfig` (also applied globally).
    """
    results = run_benchmark(n=n, conn=conn, rate=rate, verbose=verbose)
    best_limit = min(results, key=results.get)
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
