#!/bin/bash
# BENCH_PRIMS_r03 part 2: the groups whose 20-iteration fused loops were
# below the ~35 ms relay floor (us_per_call read 0.0) rerun with 1000
# fused iterations, plus the jit_scalar/jit_uniform mv groups the first
# pass never reached. Merge with scripts/merge_bench_prims_r3.py.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
OUT=/tmp/bench_prims_r3
mkdir -p $OUT
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mv jit_scalar --n-runs 3 --n-warmup 1 --iterations 20 \
  --max-configs 2 --output $OUT/jits_mv.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mv jit_uniform --n-runs 3 --n-warmup 1 --iterations 20 \
  --max-configs 2 --output $OUT/jitu_mv.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mm --n-runs 3 --n-warmup 1 --iterations 1000 --max-configs 2 \
  --output $OUT/mm_hi.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data dt2t --n-runs 3 --n-warmup 1 --iterations 1000 --max-configs 1 \
  --output $OUT/dt2t_hi.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data plasticity --n-runs 3 --n-warmup 1 --iterations 1000 \
  --max-configs 1 --output $OUT/plasticity_hi.json 2>&1 | grep -v WARNING
echo "BENCH PRIMS R3B DONE"
