# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Test configuration: force an 8-device virtual CPU mesh.

The full suite — including every Pallas TPU kernel (interpret mode) and the
multi-chip sharding tests — runs on CPU-only CI, mirroring the reference's
CPU-CI strategy (``/root/reference/.github/workflows/CI.yml``). Real-TPU
execution is covered separately by ``bench.py`` and the driver's compile
checks.
"""

import os

# Must be set before the CPU client is created.
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
)

# Keep the persistent compilation cache out of CPU CI: XLA:CPU AOT
# reload warns about machine-feature mismatches (SIGILL risk) and the
# suite's compiles are cheap anyway. test_compile_cache.py exercises the
# cache explicitly in subprocesses with its own directories.
os.environ.setdefault('BRAINEVENT_COMPILATION_CACHE', '0')

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS set post-startup; the config
# update below reliably forces CPU.
jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Auto-mark slow backends, mirroring reference ``conftest.py:36-59``."""
    for item in items:
        params = getattr(item, 'callspec', None)
        if params is None:
            continue
        backend = params.params.get('backend')
        if backend in ('numba', 'numba_cuda', 'warp', 'taichi'):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Bound compiler-state growth over the full suite.

    The suite compiles thousands of distinct XLA programs in one process;
    letting the executable/tracing caches accumulate across all ~27
    modules has produced an XLA CPU compiler segfault late in the run
    (in ``backend_compile_and_load``, ~80% through, while each module
    passes in isolation). Dropping the caches at module boundaries keeps
    the process at single-module footprint; cross-module cache reuse is
    minimal anyway (modules exercise disjoint primitives)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    import numpy as np
    return np.random.default_rng(20260816)
