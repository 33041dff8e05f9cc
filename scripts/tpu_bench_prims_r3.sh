#!/bin/bash
# BENCH_PRIMS_r03: per-primitive TPU microbenchmarks via the CLI
# (relay-proof fused loops; --max-configs bounds remote-compile cost).
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
OUT=/tmp/bench_prims_r3
mkdir -p $OUT
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mm --n-runs 3 --n-warmup 1 --iterations 20 --max-configs 2 \
  --output $OUT/mm.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mv jit_normal --n-runs 3 --n-warmup 1 --iterations 20 \
  --max-configs 2 --output $OUT/jitn_mv.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mv jit_scalar --n-runs 3 --n-warmup 1 --iterations 20 \
  --max-configs 2 --output $OUT/jits_mv.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data mv jit_uniform --n-runs 3 --n-warmup 1 --iterations 20 \
  --max-configs 2 --output $OUT/jitu_mv.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data dt2t --n-runs 3 --n-warmup 1 --iterations 20 --max-configs 1 \
  --output $OUT/dt2t.json 2>&1 | grep -v WARNING
python -m brainevent_tpu._cli benchmark-performance --platform tpu \
  --data plasticity --n-runs 3 --n-warmup 1 --iterations 20 \
  --max-configs 1 --output $OUT/plasticity.json 2>&1 | grep -v WARNING
echo "BENCH PRIMS DONE"
