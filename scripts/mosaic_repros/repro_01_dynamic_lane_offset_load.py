# Mosaic limitation #1: dynamic-sublane load with a non-zero LANE offset.
#
# A `(1, 128)` VMEM load at a dynamic sublane index (`x_ref[pl.ds(s, 1), :]`)
# is the proven slot-scan pattern and compiles fine. The SAME load with a
# static non-zero lane offset (`x_ref[pl.ds(s, 1), 128:256]`) fails Mosaic
# with "dynamic load with unaligned indices" — the lane offset is 128-aligned
# and static, so the program is well-tiled; only the combination
# (dynamic sublane x nonzero lane base) is rejected.
#
# In-tree workaround: stack batch items on the SUBLANE axis so every dynamic
# read is a full-lane row at lane 0 (`jitc/pallas_kernels.py::_make_mm_kernel`
# docstring; `models/pallas_sim.py` rowbufT event-block stacking).

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, __file__.rsplit('/', 1)[0])
from _util import assert_close, run  # noqa: E402

S, LANES = 8, 256  # two 128-lane tiles per row


def kernel(x_ref, o_ref):
    def body(s, acc):
        # dynamic sublane + static lane offset 128: the rejected shape
        row = x_ref[pl.ds(s, 1), 128:256]            # (1, 128)
        return acc + row

    acc = jax.lax.fori_loop(0, S, body, jnp.zeros((1, 128), jnp.float32))
    o_ref[:] = acc


def build(interpret):
    x = jnp.arange(S * LANES, dtype=jnp.float32).reshape(S, LANES)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=interpret,
    )
    return functools.partial(call, x)


def check(res):
    x = np.arange(S * LANES, dtype=np.float32).reshape(S, LANES)
    assert_close(res, x[:, 128:256].sum(axis=0, keepdims=True))


if __name__ == '__main__':
    run('dynamic-sublane load with non-zero lane offset', build, check,
        'unaligned indices')

# Measured 2026-08-19, v5 lite (remote-compile relay), jax 0.8.x:
#   interpret: OK (numerics correct)
#   real backend: FAILED AS DOCUMENTED -> ... dynamic load with unaligned
#   indices ...
