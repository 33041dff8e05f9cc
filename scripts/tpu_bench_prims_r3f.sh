#!/bin/bash
# BENCH_PRIMS_r03 part 6: re-measure the jit* mm grid rows now that the
# stride-4 'mm'-layout slot-scan kernels are live (the earlier rows read
# pallas ~= jax_raw because mm-mode fell back to the XLA engine).
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
OUT=/tmp/bench_prims_r3
mkdir -p $OUT
for fam in jit_normal jit_scalar jit_uniform; do
  python -m brainevent_tpu._cli benchmark-performance --platform tpu \
    --data $fam mm --n-runs 3 --n-warmup 1 --iterations 1000 \
    --output $OUT/${fam}_mm_r3f.json 2>&1 | grep -v WARNING
done
python scripts/merge_bench_prims_r3.py
echo "BENCH PRIMS R3F DONE"
