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

"""Persistent XLA compilation cache wiring (config.set_compilation_cache).

TPU analog of the reference's kernix artifact cache
(``brainevent/_op/kernix_cache.py:41`` — pay the expensive compile once
per content hash, every later process loads the artifact). Here the
artifact is the serialized XLA executable; the cross-*process* test
below proves a second process gets a real cache hit (via jax's
``/jax/compilation_cache/cache_hits`` monitoring event) on the same
program that the first process compiled and persisted.
"""

import os
import subprocess
import sys
import textwrap

import pytest

import brainevent_tpu as be

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(prog: str, **env_extra):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = _REPO + os.pathsep + env.get('PYTHONPATH', '')
    env.update(env_extra)
    return subprocess.run([sys.executable, '-c', prog], capture_output=True,
                          text=True, env=env, timeout=240)


def test_import_wires_cache_by_default():
    # The package import wired the cache (unless the env disabled it or
    # the home dir is unwritable — in which case the getter is None and
    # this environment can't assert more).
    raw = os.environ.get('BRAINEVENT_COMPILATION_CACHE')
    if raw is not None and raw.strip().lower() in ('', '0', 'off', 'false', 'none'):
        assert be.config.get_compilation_cache() is None
    else:
        d = be.config.get_compilation_cache()
        assert d is not None and os.path.isdir(d)
        import jax
        assert jax.config.jax_compilation_cache_dir == d


def test_env_disable(tmp_path):
    r = _run(
        "import brainevent_tpu as be; import jax; "
        "assert be.config.get_compilation_cache() is None; "
        "assert not jax.config.jax_compilation_cache_dir; print('OK')",
        BRAINEVENT_COMPILATION_CACHE='0')
    assert r.returncode == 0 and 'OK' in r.stdout, r.stderr


def test_env_path_override(tmp_path):
    d = str(tmp_path / 'cachedir')
    r = _run(
        "import brainevent_tpu as be, os; "
        "d = be.config.get_compilation_cache(); "
        "assert d and os.path.isdir(d); print('DIR', d)",
        BRAINEVENT_COMPILATION_CACHE=d)
    assert r.returncode == 0, r.stderr
    assert os.path.realpath(d) in r.stdout or d in r.stdout


def test_set_none_disables():
    prev = be.config.get_compilation_cache()
    try:
        be.config.set_compilation_cache(None)
        assert be.config.get_compilation_cache() is None
    finally:
        if prev is not None:
            be.config.set_compilation_cache(prev)


@pytest.mark.slow
def test_second_process_hits_cache(tmp_path):
    """Process 1 compiles + persists; process 2 must get a cache HIT."""
    d = str(tmp_path / 'xc')
    prog = textwrap.dedent("""
        import os, sys
        import brainevent_tpu as be
        be.config.set_compilation_cache(os.environ['BE_TEST_CACHE'],
                                        min_compile_time_secs=0.0)
        import jax, jax.monitoring, numpy as np, jax.numpy as jnp
        hits = []
        jax.monitoring.register_event_listener(
            lambda event, **kw: hits.append(event)
            if 'compilation_cache/cache_hits' in event else None)
        x = np.ones((256, 256), np.float32)
        csr = be.CSR.fromdense(jnp.where(x * np.random.default_rng(0)
                                         .random((256, 256)) > .99, x, 0.))
        f = jax.jit(lambda v: csr @ v)
        f(np.ones(256, np.float32)).block_until_ready()
        print('HITS', len(hits))
    """)
    r1 = _run(prog, BE_TEST_CACHE=d, BRAINEVENT_COMPILATION_CACHE='0')
    assert r1.returncode == 0, r1.stderr
    assert os.path.isdir(d) and len(os.listdir(d)) >= 1, (
        'first process persisted nothing', r1.stdout, r1.stderr)
    r2 = _run(prog, BE_TEST_CACHE=d, BRAINEVENT_COMPILATION_CACHE='0')
    assert r2.returncode == 0, r2.stderr
    n_hits = int(r2.stdout.strip().rsplit('HITS', 1)[1])
    assert n_hits >= 1, ('second process missed the cache',
                         r2.stdout, r2.stderr)
