#!/bin/bash
# BENCH_PRIMS_r03 part 5: the last 2 rows still reading 0.0 us/call —
# the T (transpose) configs of binary_densemm and csrmm_dt2t. r3d used
# --max-configs 1, which reran only the first (NT) config of each
# group; the T rows need max-configs 2 plus 40k fused iterations to
# clear the ~35 ms relay floor at ~1 us/call.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
OUT=/tmp/bench_prims_r3
mkdir -p $OUT
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data dense mm --n-runs 3 --n-warmup 1 --iterations 40000 \
  --max-configs 2 --output $OUT/densemm_hi3.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data csr dt2t --n-runs 3 --n-warmup 1 --iterations 20000 \
  --max-configs 2 --output $OUT/csrdt2t_hi3.json 2>&1 | grep -v WARNING
python scripts/merge_bench_prims_r3.py
echo "BENCH PRIMS R3E DONE"
