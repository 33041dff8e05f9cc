# Merge the /tmp/bench_prims_r3/*.json group files into BENCH_PRIMS_r03.json.
# The *_hi.json reruns (1000 fused iterations) supersede the 20-iteration
# rows of the same benchmark name: 20 iterations of a us-scale op sit below
# the ~35 ms relay call floor and difference to 0.0 us/call.
import json
import os

OUT = '/root/repo/BENCH_PRIMS_r03.json'
SRC = '/tmp/bench_prims_r3'
ORDER = ['mm', 'jitn_mv', 'jits_mv', 'jitu_mv', 'dt2t', 'plasticity',
         'mm_hi', 'dt2t_hi', 'plasticity_hi',
         'jitn_mv_hi', 'jits_mv_hi', 'jitu_mv_hi',
         # r3d 20000/10000-iteration reruns of the rows still at the
         # relay floor after the 1000-iteration pass
         'densemm_hi2', 'denseplast_hi2', 'csrdt2t_hi2',
         # r3e 40000/20000-iteration reruns of the two T rows that
         # --max-configs 1 skipped in r3d
         'densemm_hi3', 'csrdt2t_hi3',
         # r3f re-measure of the jit* mm rows after the stride-4
         # mm-layout slot-scan kernels landed
         'jit_normal_mm_r3f', 'jit_scalar_mm_r3f', 'jit_uniform_mm_r3f',
         # targeted ultra-high-iteration rerun of the 4 rows still at the
         # relay floor (tpu_bench_zero_rows.py)
         'zero_rows']

rows = {}
# Seed from the already-merged file: /tmp is wiped between sessions, so
# the earlier group files may be gone — without this seed a partial rerun
# (e.g. the r3f mm refresh alone) would REPLACE the merged grid with only
# its own rows.
if os.path.exists(OUT):
    for rec in json.load(open(OUT)):
        rows[rec['name']] = rec
for stem in ORDER:
    path = os.path.join(SRC, stem + '.json')
    if not os.path.exists(path):
        print(f'missing: {path}')
        continue
    for rec in json.load(open(path)):
        rows[rec['name']] = rec   # later (hi-iteration) files win

merged = [rows[k] for k in sorted(rows)]
json.dump(merged, open(OUT, 'w'), indent=1)
unresolved = [r['name'] for r in merged if not r.get('us_per_call')]
print(f'{len(merged)} rows -> {OUT}; unresolved (us_per_call 0): '
      f'{len(unresolved)}')
for n in unresolved:
    print(' ', n)
