# Reference-scale mm rows (VERDICT r3 item 6): csr/fcn/dense mm at
# 5k/10k with batch 128-512.
import json
import brainevent_tpu as be

rows = []
for name in ('csrmm', 'binary_csrmm', 'fcnmm', 'binary_fcnmm',
             'binary_densemm'):
    prim = be.get_registry()[name]
    cfgs = prim._benchmark_data_fn(platform='tpu')
    big = [c for c in cfgs if 'B=' in c.name]
    print(name, 'big configs:', [c.name for c in big], flush=True)
    from brainevent_tpu.ops.benchmark import benchmark_function
    import functools
    for cfg in big:
        for backend in prim.real_backends('tpu'):
            r = benchmark_function(
                functools.partial(prim._call_fn, backend=backend,
                                  **cfg.kwargs),
                *cfg.args, name=f'{name}[{cfg.name}][{backend}]',
                iterations=50, loop_arg=cfg.loop_arg, n_runs=3,
                n_warmup=2)
            rows.append(r.records[0].to_dict())
json.dump(rows, open('/tmp/mm_scale_rows.json', 'w'), indent=1)
