# Mosaic limitation #4: 1-row async-copy slice of a multi-tile-wide HBM ref.
#
# `pltpu.make_async_copy(hbm_ref.at[pl.ds(i, 1), :], vmem_row, sem)` only
# compiles when the HBM ref's row is exactly ONE 128-lane tile wide.
# With a (N, 256) ref the same copy fails:
#   "Slice shape along dimension 0 must be aligned to tiling (8)"
# even though the slice itself is identical in both cases. The library
# therefore flattens (N, k*128) synapse tables to (N*k, 128) so every row
# DMA is single-tile (`models/pallas_sim.py::mxu6_conn_table`).

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit('/', 1)[0])
from _util import assert_close, run  # noqa: E402

N, W = 64, 256  # W = two 128-lane tiles: the failing width


def kernel(idx_ref, x_hbm_ref, o_ref, row_ref, sem):
    def body(k, acc):
        i = idx_ref[k, 0]
        cp = pltpu.make_async_copy(
            x_hbm_ref.at[pl.ds(i, 1), :], row_ref, sem)
        cp.start()
        cp.wait()
        return acc + row_ref[:]

    o_ref[:] = jax.lax.fori_loop(0, 8, body, jnp.zeros((1, W), jnp.float32))


def build(interpret):
    idx = (jnp.arange(8, dtype=jnp.int32) * 5 % N).reshape(8, 1)
    x = jnp.arange(N * W, dtype=jnp.float32).reshape(N, W)
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # stays in HBM
        ],
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )
    return functools.partial(call, idx, x)


def check(res):
    idx = np.arange(8) * 5 % N
    x = np.arange(N * W, dtype=np.float64).reshape(N, W)
    assert_close(res, x[idx].sum(axis=0, keepdims=True))


if __name__ == '__main__':
    run('single-row DMA slice of a multi-tile-wide HBM ref', build, check,
        'must be aligned to tiling')

# Measured 2026-08-19, v5 lite (remote-compile relay), jax 0.8.x:
#   interpret: OK
#   real backend: FAILED AS DOCUMENTED -> "Slice shape along dimension 0
#   must be aligned to tiling (8)"; the same program with W=128 compiles
#   and matches.
