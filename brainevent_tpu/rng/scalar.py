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

"""Scalar (NumPy/Numba-compatible) RNG ports
(reference ``brainevent/_numba_random.py``).

These are the CPU scalar twins of :mod:`brainevent_tpu.rng.lfsr` and
:mod:`brainevent_tpu.rng.light`: plain-Python functions over NumPy uint32
scalars with C-style wraparound, suitable for ``numba.njit(inline='always')``
compilation when Numba is installed (``get_numba_lfsr_funcs`` /
``get_numba_light_rng_funcs``). They double as the independent conformance
oracle for the vectorized JAX implementations (see ``tests/test_rng.py``).
"""

import math
from typing import Callable, Dict

import numpy as np

from .. import config

__all__ = [
    'lfsr88_seed', 'lfsr88_next_key', 'lfsr88_randint', 'lfsr88_rand',
    'lfsr88_randn', 'lfsr88_uniform', 'lfsr88_normal', 'lfsr88_random_integers',
    'lfsr113_seed', 'lfsr113_next_key', 'lfsr113_randint', 'lfsr113_rand',
    'lfsr113_randn', 'lfsr113_uniform', 'lfsr113_normal',
    'lfsr113_random_integers',
    'lfsr128_seed', 'lfsr128_next_key', 'lfsr128_randint', 'lfsr128_rand',
    'lfsr128_randn', 'lfsr128_uniform', 'lfsr128_normal',
    'lfsr128_random_integers',
    'light_rng_mix32', 'light_rng_bounded', 'light_rng_next',
    'light_rng_init', 'light_rng_uniform01', 'light_rng_normal01',
    'light_rng_initial_q',
    'get_numba_lfsr_funcs', 'get_numba_light_rng_funcs',
]

_U32 = np.uint32
_MASK = np.uint64(0xFFFFFFFF)
_2POW_M32 = 2.3283064365386963e-10


# ---------------------------------------------------------------------------
# LFSR88
# ---------------------------------------------------------------------------

def lfsr88_seed(seed):
    """``(4,) uint32`` state ``[s+2, s+8, s+16, 0]``."""
    state = np.empty(4, dtype=np.uint32)
    state[0] = _U32(seed + 2)
    state[1] = _U32(seed + 8)
    state[2] = _U32(seed + 16)
    state[3] = _U32(0)
    return state


def lfsr88_next_key(state):
    """Advance the LFSR88 state in place."""
    s1, s2, s3 = state[0], state[1], state[2]
    b = ((s1 << _U32(13)) ^ s1) >> _U32(19)
    s1 = ((s1 & _U32(0xFFFFFFFE)) << _U32(12)) ^ b
    b = ((s2 << _U32(2)) ^ s2) >> _U32(25)
    s2 = ((s2 & _U32(0xFFFFFFF8)) << _U32(4)) ^ b
    b = ((s3 << _U32(3)) ^ s3) >> _U32(11)
    s3 = ((s3 & _U32(0xFFFFFFF0)) << _U32(17)) ^ b
    state[0], state[1], state[2], state[3] = s1, s2, s3, b


def lfsr88_randint(state):
    lfsr88_next_key(state)
    return state[0] ^ state[1] ^ state[2]


def lfsr88_rand(state):
    return np.float64(lfsr88_randint(state)) * _2POW_M32


def lfsr88_randn(state, epsilon=1e-10):
    u1 = max(lfsr88_rand(state), epsilon)
    u2 = lfsr88_rand(state)
    return math.sqrt(-2.0 * math.log(u1)) * math.sin(2.0 * math.pi * u2)


def lfsr88_uniform(state, low, high):
    return lfsr88_rand(state) * (high - low) + low


def lfsr88_normal(state, mu, sigma, epsilon=1e-10):
    return mu + sigma * lfsr88_randn(state, epsilon)


def lfsr88_random_integers(state, low, high):
    return np.int64(lfsr88_randint(state) % _U32(high + 1 - low)) + low


# ---------------------------------------------------------------------------
# LFSR113
# ---------------------------------------------------------------------------

def lfsr113_seed(seed):
    state = np.empty(4, dtype=np.uint32)
    state[0] = _U32(seed + 2)
    state[1] = _U32(seed + 8)
    state[2] = _U32(seed + 16)
    state[3] = _U32(seed + 128)
    return state


def lfsr113_next_key(state):
    z1, z2, z3, z4 = state[0], state[1], state[2], state[3]
    b = ((z1 << _U32(6)) ^ z1) >> _U32(13)
    z1 = ((z1 & _U32(0xFFFFFFFE)) << _U32(18)) ^ b
    b = ((z2 << _U32(2)) ^ z2) >> _U32(27)
    z2 = ((z2 & _U32(0xFFFFFFF8)) << _U32(2)) ^ b
    b = ((z3 << _U32(13)) ^ z3) >> _U32(21)
    z3 = ((z3 & _U32(0xFFFFFFF0)) << _U32(7)) ^ b
    b = ((z4 << _U32(3)) ^ z4) >> _U32(12)
    z4 = ((z4 & _U32(0xFFFFFF80)) << _U32(13)) ^ b
    state[0], state[1], state[2], state[3] = z1, z2, z3, z4


def lfsr113_randint(state):
    lfsr113_next_key(state)
    return state[0] ^ state[1] ^ state[2] ^ state[3]


def lfsr113_rand(state):
    return np.float64(lfsr113_randint(state)) * _2POW_M32


def lfsr113_randn(state, epsilon=1e-10):
    u1 = max(lfsr113_rand(state), epsilon)
    u2 = lfsr113_rand(state)
    return math.sqrt(-2.0 * math.log(u1)) * math.sin(2.0 * math.pi * u2)


def lfsr113_uniform(state, low, high):
    return lfsr113_rand(state) * (high - low) + low


def lfsr113_normal(state, mu, sigma, epsilon=1e-10):
    return mu + sigma * lfsr113_randn(state, epsilon)


def lfsr113_random_integers(state, low, high):
    return np.int64(lfsr113_randint(state) % _U32(high + 1 - low)) + low


# ---------------------------------------------------------------------------
# LFSR128
# ---------------------------------------------------------------------------

def lfsr128_seed(seed):
    s = _U32(seed)
    state = np.empty(4, dtype=np.uint32)
    # modular uint32 wraparound is the spec here — silence numpy's
    # scalar-overflow RuntimeWarning, it is not an error
    with np.errstate(over='ignore'):
        state[0] = s + _U32(123)
        state[1] = s ^ _U32(0xFEDC7890)
        state[2] = (s << _U32(3)) + _U32(0x1A2B3C4D)
        state[3] = ~(s + _U32(0x5F6E7D8C))
    return state


def lfsr128_next_key(state):
    z1, z2, z3, z4 = state[0], state[1], state[2], state[3]
    b = ((z1 << _U32(7)) ^ z1) >> _U32(9)
    z1 = ((z1 & _U32(0xFFFFFFFE)) << _U32(15)) ^ b
    b = ((z2 << _U32(5)) ^ z2) >> _U32(23)
    z2 = ((z2 & _U32(0xFFFFFFF0)) << _U32(6)) ^ b
    b = ((z3 << _U32(11)) ^ z3) >> _U32(17)
    z3 = ((z3 & _U32(0xFFFFFF80)) << _U32(8)) ^ b
    b = ((z4 << _U32(13)) ^ z4) >> _U32(7)
    z4 = ((z4 & _U32(0xFFFFFFE0)) << _U32(10)) ^ b
    state[0], state[1], state[2], state[3] = z1, z2, z3, z4


def lfsr128_randint(state):
    lfsr128_next_key(state)
    return state[0] ^ state[1] ^ state[2] ^ state[3]


def lfsr128_rand(state):
    return np.float64(lfsr128_randint(state)) * _2POW_M32


def lfsr128_randn(state, epsilon=1e-10):
    u1 = max(lfsr128_rand(state), epsilon)
    u2 = lfsr128_rand(state)
    return math.sqrt(-2.0 * math.log(u1)) * math.sin(2.0 * math.pi * u2)


def lfsr128_uniform(state, low, high):
    return lfsr128_rand(state) * (high - low) + low


def lfsr128_normal(state, mu, sigma, epsilon=1e-10):
    return mu + sigma * lfsr128_randn(state, epsilon)


def lfsr128_random_integers(state, low, high):
    return np.int64(lfsr128_randint(state) % _U32(high + 1 - low)) + low


# ---------------------------------------------------------------------------
# light-RNG scalar twins (same constants as rng/light.py)
# ---------------------------------------------------------------------------

def light_rng_mix32(x):
    x = _U32(x)
    x = _U32(x ^ (x >> _U32(16)))
    x = _U32((np.uint64(x) * np.uint64(0x7FEB352D)) & _MASK)
    x = _U32(x ^ (x >> _U32(15)))
    x = _U32((np.uint64(x) * np.uint64(0x846CA68B)) & _MASK)
    return _U32(x ^ (x >> _U32(16)))


def light_rng_bounded(r, bound):
    return _U32((np.uint64(r) * np.uint64(bound)) >> np.uint64(32))


def light_rng_next(state):
    x = _U32(state)
    x = _U32(x ^ _U32((np.uint64(x) << np.uint64(13)) & _MASK))
    x = _U32(x ^ (x >> _U32(17)))
    x = _U32(x ^ _U32((np.uint64(x) << np.uint64(5)) & _MASK))
    return _U32(0x6D2B79F5) if x == 0 else x


def light_rng_init(seed, row, chunk_id, lane):
    x = _U32(_U32(seed) ^ _U32(0xD1B54A35))
    x = _U32(x ^ _U32((np.uint64(_U32(row)) * np.uint64(0x85EBCA6B)) & _MASK))
    x = _U32(x ^ _U32((np.uint64(_U32(chunk_id)) * np.uint64(0xC2B2AE35)) & _MASK))
    x = _U32(x ^ _U32((np.uint64(_U32(lane)) * np.uint64(0x27D4EB2D)) & _MASK))
    x = light_rng_mix32(x)
    return _U32(0x6D2B79F5) if x == 0 else x


def light_rng_uniform01(seed, row, col):
    h = _U32(_U32(seed) ^ _U32(0xA0761D65))
    h = _U32(h ^ _U32((np.uint64(_U32(row)) * np.uint64(0xE7037ED1)) & _MASK))
    h = _U32(h ^ _U32((np.uint64(_U32(col)) * np.uint64(0x8EBC6AF1)) & _MASK))
    h = light_rng_mix32(h)
    return np.float32((h & _U32(0x00FFFFFF)) * np.float32(1.0 / 16777216.0))


def light_rng_normal01(seed, row, col):
    """Acklam inverse-CDF normal of the 24-bit uniform (float32)."""
    import numpy as np  # local for numba-compat closure capture
    u = np.float32(light_rng_uniform01(seed, row, col))
    u = min(max(u, np.float32(1e-10)), np.float32(1.0 - 1e-10))
    a = (-39.696830, 220.94609, -275.92851, 138.35775, -30.664799, 2.5066283)
    b = (-54.476099, 161.58584, -155.69898, 66.801312, -13.280681)
    c = (-0.007784894, -0.32239646, -2.4007583, -2.5497325, 4.3746641, 2.9381640)
    d = (0.007784696, 0.32246713, 2.4451342, 3.7544087)
    f32 = np.float32
    if u < f32(0.02425):
        v = f32(math.sqrt(-2.0 * math.log(u)))
        z = f32((((((f32(c[0]) * v + f32(c[1])) * v + f32(c[2])) * v + f32(c[3]))
                  * v + f32(c[4])) * v + f32(c[5])) /
                ((((f32(d[0]) * v + f32(d[1])) * v + f32(d[2])) * v + f32(d[3]))
                 * v + f32(1.0)))
        return f32(-z)
    if u > f32(0.97575):
        v = f32(math.sqrt(-2.0 * math.log(1.0 - float(u))))
        return f32((((((f32(c[0]) * v + f32(c[1])) * v + f32(c[2])) * v
                      + f32(c[3])) * v + f32(c[4])) * v + f32(c[5])) /
                   ((((f32(d[0]) * v + f32(d[1])) * v + f32(d[2])) * v
                     + f32(d[3])) * v + f32(1.0)))
    v = f32(u - f32(0.5))
    r = f32(v * v)
    return f32((((((f32(a[0]) * r + f32(a[1])) * r + f32(a[2])) * r + f32(a[3]))
                 * r + f32(a[4])) * r + f32(a[5])) * v /
               (((((f32(b[0]) * r + f32(b[1])) * r + f32(b[2])) * r + f32(b[3]))
                 * r + f32(b[4])) * r + f32(1.0)))


def light_rng_initial_q(state, cl):
    """Stationary residual draw; two advances per rejection round."""
    n = _U32(_U32(cl) - _U32(1))
    while True:
        state = light_rng_next(state)
        q = light_rng_bounded(state, n)
        state = light_rng_next(state)
        gate = light_rng_bounded(state, n)
        if gate < _U32(n - q):
            return q, state


# ---------------------------------------------------------------------------
# Numba dispatch tables (compiled on first request; plain Python otherwise)
# ---------------------------------------------------------------------------

_compiled: Dict[str, Callable] = {}


def _maybe_njit(fn):
    try:
        import numba
        return numba.njit(inline='always')(fn)
    except ImportError:
        return fn


def get_numba_lfsr_funcs() -> Dict[str, Callable]:
    """LFSR functions of the configured family, njit-compiled if possible."""
    algo = config.get_lfsr_algorithm()
    key = f'lfsr_{algo}'
    if key not in _compiled:
        g = globals()
        _compiled[key] = {
            name: _maybe_njit(g[f'{algo}_{name}'])
            for name in ('seed', 'next_key', 'randint', 'rand', 'randn',
                         'uniform', 'normal', 'random_integers')
        }
    return _compiled[key]


def get_numba_light_rng_funcs() -> Dict[str, Callable]:
    """light-RNG function bundle, njit-compiled if possible."""
    if 'light' not in _compiled:
        _compiled['light'] = {
            'mix32': _maybe_njit(light_rng_mix32),
            'bounded': _maybe_njit(light_rng_bounded),
            'next': _maybe_njit(light_rng_next),
            'init': _maybe_njit(light_rng_init),
            'uniform01': _maybe_njit(light_rng_uniform01),
            'normal01': _maybe_njit(light_rng_normal01),
            'initial_q': _maybe_njit(light_rng_initial_q),
        }
    return _compiled['light']
