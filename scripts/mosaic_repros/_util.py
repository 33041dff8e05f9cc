# Shared driver for the Mosaic-limitation repros.
#
# Protocol: run the kernel in interpret mode (must be numerically correct),
# then compile+run it for real. Each repro declares what the *documented*
# real-backend outcome is (an error containing a marker string, or a wrong
# value); exit 0 iff the documented behavior reproduces, exit 1 if it has
# changed (fixed upstream or failing differently).

import sys
import traceback

import numpy as np


def drive(name: str, build, check, expect_error_marker: str):
    """build(interpret: bool) -> callable returning arrays;
    check(result) -> None or raises AssertionError.
    expect_error_marker: substring expected in the real-backend error."""
    import jax

    print(f'== {name} ==')
    print('devices:', jax.devices())

    res = jax.block_until_ready(build(True)())
    check(res)
    print('interpret: OK (numerics correct)')

    try:
        res = jax.block_until_ready(build(False)())
    except Exception as e:  # noqa: BLE001 - we classify the failure text
        msg = f'{type(e).__name__}: {e}'
        first = msg.splitlines()[0][:200]
        if expect_error_marker and expect_error_marker in msg:
            hit = next(ln for ln in msg.splitlines()
                       if expect_error_marker in ln)
            print(f'real backend: FAILED AS DOCUMENTED -> '
                  f'{hit.strip()[:200]}')
            print('repro: CONFIRMED')
            return 0
        print(f'real backend: failed with a DIFFERENT error -> {first}')
        traceback.print_exc(limit=3)
        print('repro: CHANGED (re-evaluate the workaround)')
        return 1
    # Compiled: either the limitation is fixed (values correct) or it
    # miscompiles (values wrong).
    try:
        check(res)
    except AssertionError as e:
        print(f'real backend: compiled but WRONG VALUES -> {e}')
        print('repro: CONFIRMED (miscompile form)' if not expect_error_marker
              else 'repro: CHANGED (error became a miscompile)')
        return 0 if not expect_error_marker else 1
    print('real backend: compiled AND correct — limitation appears FIXED')
    return 1


def assert_close(got, want, tol=1e-5):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    err = np.max(np.abs(got - want)) if got.size else 0.0
    assert err <= tol, f'max abs err {err} > {tol}'


def run(name, build, check, marker):
    sys.exit(drive(name, build, check, marker))
