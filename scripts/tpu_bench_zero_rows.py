# Targeted ultra-high-iteration rerun of the 4 BENCH_PRIMS rows still at
# 0.0 us/call after the r3d/r3e reruns: these ops are so fast that even
# 40k fused iterations stay under the ~35 ms relay-call floor, so the
# K-vs-1 differencing nets to noise. Each row gets its own iteration
# count sized to push the fused loop well past the floor.
#
# Writes /tmp/bench_prims_r3/zero_rows.json (merge_bench_prims_r3.py
# picks it up; same record schema as the CLI).
import functools
import json
import os

import brainevent_tpu as be
from brainevent_tpu.ops.benchmark import benchmark_function

# (primitive, config-name, backend, fused iterations)
SCALE = float(os.environ.get('BE_ZR_SCALE', '1'))  # CPU smoke: 0.001
ROWS = [
    ('binary_densemm', 'n=1000,rate=0.01,T', 'jax_raw', 500_000),
    ('csrmm_dt2t', 'm=200,k=300,dens=0.05,T', 'jax_raw', 500_000),
    ('jitsmv_plan', 'NT,corder', 'pallas', 100_000),
    ('jitumv_plan', 'T,corder', 'pallas', 100_000),
]
ROWS = [(p, c, b, max(2, int(i * SCALE))) for p, c, b, i in ROWS]

out = []
reg = be.get_primitives_by_tags(set())
for pname, cname, backend, iters in ROWS:
    prim = reg[pname]
    cfgs = [c for c in prim._benchmark_data_fn(platform='tpu')
            if c.name == cname]
    if not cfgs:
        print(f'MISSING config {pname}[{cname}]')
        continue
    cfg = cfgs[0]
    res = benchmark_function(
        functools.partial(prim._call_fn, backend=backend, **cfg.kwargs),
        *cfg.args,
        name=f'{pname}[{cname}][{backend}]',
        n_warmup=1, n_runs=3, verbose=True,
        iterations=iters, loop_arg=cfg.loop_arg)
    out.extend(r.to_dict() for r in res.records)

os.makedirs('/tmp/bench_prims_r3', exist_ok=True)
path = '/tmp/bench_prims_r3/zero_rows.json'
json.dump(out, open(path, 'w'), indent=2)
print(f'wrote {len(out)} records to {path}')
