# Mosaic limitation #3 (context-dependent): dynamic-sublane load of an
# int32 in-kernel transpose.
#
# During round-3 development, mxu3/mxu5's fori-mode factor phase — store
# `jnp.swapaxes(int32_block, 0, 1)` into an int32 VMEM scratch, then read
# rows back at a DYNAMIC sublane index — hit a Mosaic INTERNAL lowering
# error at the 400k configuration; holding the transposed buffer in f32
# (ids < 2^24, exact) fixed the compile (commit 0e3b1b3,
# `models/pallas_sim.py`).
#
# This script is the minimization attempt: it runs the pattern in
# ISOLATION (square and as-deployed-rectangular shapes, static and dynamic
# trip counts, input-block and scratch-fill sources) — and ALL variants
# compile and are correct on the measured toolchain. The failure therefore
# needs the surrounding mega-kernel context (register/layout pressure from
# the rest of the program), and this probe documents that negative result:
# exit 0 = still compiles in isolation (workaround stays, since the f32
# buffer costs nothing); exit 1 = a variant now fails in isolation too,
# i.e. a true minimal repro has appeared — file it upstream.

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def trial(R, C, dyn_trips, label):
    def kernel(n_ref, x_ref, o_ref, t_ref):
        t_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)
        n = n_ref[0, 0] if dyn_trips else R

        def body(k, acc):
            row = t_ref[pl.ds(k, 1), :]
            return acc + row.astype(jnp.float32)

        o_ref[:] = jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((1, C), jnp.float32))

    n = jnp.array([[R]], jnp.int32)
    x = (jnp.arange(C * R, dtype=jnp.int32) % 997).reshape(C, R)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((C, R), lambda: (0, 0))],
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, C), jnp.int32)])
    try:
        out = jax.block_until_ready(call(n, x))
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).splitlines() if 'rror' in ln][:1]
        print(f'{label}: FAILED {lines} — minimal repro appeared, '
              f'file upstream')
        return False
    want = (np.arange(C * R, dtype=np.int64) % 997).reshape(C, R).T.sum(0)
    ok = np.allclose(np.asarray(out)[0], want)
    print(f'{label}: compiled, correct={ok}')
    return ok


def main():
    print('devices:', jax.devices())
    ok = True
    ok &= trial(128, 128, False, 'int32 T (128x128) static trips')
    ok &= trial(256, 896, True, 'int32 T (896x256)->(256,896) dyn trips')
    if ok:
        print('probe: pattern compiles in isolation — the 0e3b1b3 failure '
              'is context-dependent (full mxu3 kernel); workaround kept.')
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()

# Measured 2026-08-19, v5 lite (remote-compile relay), jax 0.8.x:
#   both variants (and a scratch-fill-source variant) compile and match —
#   the int32-transpose lowering failure needs the full mxu3 program.
