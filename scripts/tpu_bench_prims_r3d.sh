#!/bin/bash
# BENCH_PRIMS_r03 part 4: resolve the 7 rows still reading 0.0 us/call
# after the r3b 1000-iteration pass — ns/us-scale ops need ~20000 fused
# iterations to clear the ~35 ms relay floor, and the jit_scalar /
# jit_uniform mv pallas rows never got their high-iteration rerun.
# Narrow tag intersections keep the ms-scale rows of the same groups
# (42 s/call at 20000 iterations) out of the rerun.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
OUT=/tmp/bench_prims_r3
mkdir -p $OUT
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data dense mm --n-runs 3 --n-warmup 1 --iterations 20000 \
  --max-configs 1 --output $OUT/densemm_hi2.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data dense plasticity --n-runs 3 --n-warmup 1 --iterations 20000 \
  --max-configs 1 --output $OUT/denseplast_hi2.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data csr dt2t --n-runs 3 --n-warmup 1 --iterations 10000 \
  --max-configs 1 --output $OUT/csrdt2t_hi2.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mv jit_scalar --n-runs 3 --n-warmup 1 --iterations 1000 \
  --max-configs 2 --output $OUT/jits_mv_hi.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mv jit_uniform --n-runs 3 --n-warmup 1 --iterations 1000 \
  --max-configs 2 --output $OUT/jitu_mv_hi.json 2>&1 | grep -v WARNING
python scripts/merge_bench_prims_r3.py
echo "BENCH PRIMS R3D DONE"
