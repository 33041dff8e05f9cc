# Mosaic limitation #2: i1 eq-mask relayout in a BF16 broadcast select.
#
# Building a (128, 128) one-hot as `jnp.where(eq, val, 0)` — where
# `eq = (iota(128,1) == idx(1,128))` is a BROADCAST i1 mask and `val` a
# (1, 128) **bfloat16** row — fails Mosaic with
#   Invalid relayout: Non-singleton logical dimension is replicated in
#   destination but not in source for 'vector<128x128xi1>':
#   "16,{0,0},(8,128)" -> "16,{*,0},(16,128)"
# i.e. the broadcast i1 mask (native (8, 128) tiling) cannot be relaid
# into the 16-sublane bf16 tiling the select needs. The IDENTICAL program
# with f32 branches compiles (same (8, 128) tiling — no relayout), and the
# mathematically identical two-step form `eq.astype(bf16) * val` compiles
# at any dtype.
#
# The select form would save one full (128, 128) VPU pass per one-hot build
# (the widest object in the mxu6 factor phase, `models/pallas_sim.py`
# `m1_fuse` knob) — measured-blocked, knob documented interpret-only.

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, __file__.rsplit('/', 1)[0])
from _util import assert_close, run  # noqa: E402


def kernel(idx_ref, val_ref, o_ref):
    lanecol = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    idx = idx_ref[:]                                   # (1, 128) int32
    val = val_ref[:].astype(jnp.bfloat16)              # (1, 128) bf16
    eq = idx == lanecol                                # (128, 128) i1
    # the failing form: select a bf16 row under the broadcast i1 mask
    m1 = jnp.where(eq, val, jnp.zeros((), jnp.bfloat16))
    o_ref[:] = m1.astype(jnp.float32)


def build(interpret):
    idx = (jnp.arange(128, dtype=jnp.int32) * 7 % 128).reshape(1, 128)
    val = (jnp.arange(128, dtype=jnp.float32) + 1.0).reshape(1, 128)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        interpret=interpret,
    )
    return functools.partial(call, idx, val)


def check(res):
    idx = np.arange(128, dtype=np.int64) * 7 % 128
    val = np.arange(128, dtype=np.float32) + 1.0
    want = np.where(idx[None, :] == np.arange(128)[:, None],
                    val[None, :], 0.0)
    assert_close(res, want)


if __name__ == '__main__':
    run('broadcast i1 eq-mask feeding a bf16 jnp.where', build, check,
        'Invalid relayout')

# Measured 2026-08-19, v5 lite (remote-compile relay), jax 0.8.x:
#   interpret: OK
#   real backend: FAILED AS DOCUMENTED -> Invalid relayout: Non-singleton
#   logical dimension is replicated in destination but not in source for
#   'vector<128x128xi1>': "16,{0,0},(8,128)" -> "16,{*,0},(16,128)"
#   (same text as the 400k m1_fuse failure, BENCH_NOTES.md round 3c; the
#   f32-branch variant of this kernel compiles and matches).
