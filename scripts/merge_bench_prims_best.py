# Merge every measured BENCH_PRIMS round into ONE best-known grid
# (VERDICT r4 item 4): rows keyed by their full '[prim][config][backend]'
# name; the NEWEST round wins a key (later rounds use the relay-corrected
# protocol and the current kernel stack). Each surviving row is tagged
# with the round it came from so the audit can state provenance.
#
# Usage: python scripts/merge_bench_prims_best.py [extra_rows.json ...]
# Writes BENCH_PRIMS_BEST.json at the repo root.
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCES = [
    ('r02', 'BENCH_PRIMS_r02.json'),
    ('r03', 'BENCH_PRIMS_r03.json'),
    ('r04', 'BENCH_PRIMS_r04.json'),
]

merged = {}
for tag, fname in SOURCES:
    path = os.path.join(REPO, fname)
    if not os.path.exists(path):
        continue
    for row in json.load(open(path)):
        if 'name' not in row:
            continue
        row = dict(row)
        row['round'] = tag
        merged[row['name']] = row          # later rounds overwrite

for extra in sys.argv[1:]:
    for row in json.load(open(extra)):
        if 'name' not in row or 'error' in row:
            continue
        row = dict(row)
        row['round'] = 'r05'
        merged[row['name']] = row

rows = [merged[k] for k in sorted(merged)]
out = os.path.join(REPO, 'BENCH_PRIMS_BEST.json')
json.dump(rows, open(out, 'w'), indent=1)
by_round = {}
for r in rows:
    by_round[r['round']] = by_round.get(r['round'], 0) + 1
print(f'wrote {out}: {len(rows)} rows, by round {by_round}')
