# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""RNG subsystem: Pallas-friendly LFSR generators and the light-RNG
connectivity sampler (reference ``brainevent/_pallas_random.py`` and
``brainevent/_numba_random.py``)."""

from .lfsr import (
    LFSRBase,
    PallasLFSR88RNG,
    PallasLFSR113RNG,
    PallasLFSR128RNG,
    PallasLFSRRNG,
    get_pallas_lfsr_rng_class,
)
from .light import (
    light_rng_mix32,
    light_rng_bounded,
    light_rng_next,
    light_rng_init,
    light_rng_uniform01,
    light_rng_normal01,
    light_rng_initial_q,
)

__all__ = [
    'LFSRBase',
    'PallasLFSR88RNG', 'PallasLFSR113RNG', 'PallasLFSR128RNG',
    'PallasLFSRRNG', 'get_pallas_lfsr_rng_class',
    'light_rng_mix32', 'light_rng_bounded', 'light_rng_next',
    'light_rng_init', 'light_rng_uniform01', 'light_rng_normal01',
    'light_rng_initial_q',
]

from . import scalar
from .scalar import get_numba_lfsr_funcs, get_numba_light_rng_funcs

__all__ += ['scalar', 'get_numba_lfsr_funcs', 'get_numba_light_rng_funcs']
