#!/bin/bash
# BENCH_PRIMS r03 part 3: the jit*mv groups' pallas rows are sub-ms and
# sit below the ~35 ms relay call floor at 20 fused iterations
# (us_per_call reads 0.0) — rerun at 1000 iterations so the differenced
# per-call time resolves. Merge with scripts/merge_bench_prims_r3.py.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
OUT=/tmp/bench_prims_r3
mkdir -p $OUT
for fam in jit_normal jit_scalar jit_uniform; do
  short=$(echo $fam | sed 's/jit_//;s/normal/n/;s/scalar/s/;s/uniform/u/')
  python -m brainevent_tpu._cli benchmark-performance --platform tpu \
    --data mv $fam --n-runs 3 --n-warmup 1 --iterations 1000 \
    --max-configs 2 --output $OUT/jit${short}_mv_hi.json 2>&1 | grep -v WARNING
done
echo "BENCH PRIMS R3C DONE"
