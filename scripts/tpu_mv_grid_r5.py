# Round-5 (VERDICT item 4): re-measure the audit's blind spots with the
# current stack + relay-corrected protocol, producing rows to merge into
# the unified best-known grid:
#   - the event/float mv family (binary_csrmv, csrmv, binary_densemv,
#     binary_fcnmv, fcnmv) — last measured r02, pre-correction;
#   - the 8 compact-encoder primitives;
#   - jit*mm / binary_jit*mm / jit*mv_dt2t at the NEW >=5k config
#     (weak #4: TPU defaults were flipped from <=2k rows only).
# Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_mv_grid_r5.py [out.json]
import functools
import json
import sys

import brainevent_tpu as be
be.config.set_compilation_cache('')   # default cache dir: reuse compiles

import jax  # noqa: E402
from brainevent_tpu.ops.benchmark import benchmark_function  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/mv_grid_r5.json'
print('devices:', jax.devices(), flush=True)

PLAN = [
    # (primitive, config-name filter: None = all, >=substring match)
    ('binary_csrmv', None),
    ('csrmv', None),
    ('binary_densemv', None),
    ('binary_fcnmv', None),
    ('fcnmv', None),
    ('binary_1d_array_index', None),
    ('binary_2d_compact_only', None),
    ('binary_2d_array_index', None),
    ('binary_2d_pair_stream_encode', None),
    ('binary_2d_row_sparse_encode', None),
    ('binary_2d_csr_row_count', None),
    ('binary_2d_csr_fill', None),
    ('binary_2d_csc_encode', None),
    ('jitsmm', '5120'),
    ('jitnmm', '5120'),
    ('jitumm', '5120'),
    ('binary_jitsmm', '5120'),
    ('binary_jitnmm', '5120'),
    ('binary_jitumm', '5120'),
    ('jitsmv_dt2t', '5120'),
    ('jitnmv_dt2t', '5120'),
    ('jitumv_dt2t', '5120'),
]

rows = []
reg = be.get_registry()
for name, filt in PLAN:
    prim = reg[name]
    try:
        cfgs = prim._benchmark_data_fn(platform='tpu')
    except Exception as e:
        print(f'{name}: no benchmark data ({e})', flush=True)
        continue
    if filt:
        cfgs = [c for c in cfgs if filt in c.name]
    for cfg in cfgs:
        for backend in prim.real_backends('tpu'):
            label = f'{name}[{cfg.name}][{backend}]'
            try:
                r = benchmark_function(
                    functools.partial(prim._call_fn, backend=backend,
                                      **cfg.kwargs),
                    *cfg.args, name=label, iterations=50,
                    loop_arg=cfg.loop_arg, n_runs=3, n_warmup=2)
                d = r.records[0].to_dict()
                rows.append(d)
                print(f'{label}: {d.get("us_per_call", "?")} us/call',
                      flush=True)
            except Exception as e:
                rows.append({'name': label, 'error': str(e)[:300]})
                print(f'{label}: ERROR {str(e)[:160]}', flush=True)
        json.dump(rows, open(OUT, 'w'), indent=1)
print('wrote', OUT, len(rows), 'rows', flush=True)
