# mxu6 hardware A/B round 5 at the ab3 winner (was 155.3 us/step at
# 400k: rpb=384 g=4 u=4 block pf=1 fl=2 ei=1 bp=1):
#   run 1: dead-group elimination only (now unconditional: the factor
#          loop sweeps the live group prefix per chunk, 54 of 64 groups
#          at 400k instead of all 64)
#   run 2: + m1_fuse (single-select event one-hot)
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_ab5.sh | tee /tmp/mxu6_ab5.log
set -u
cd /root/repo
run() {  # scale steps rpb group unroll gather prefetch fused ei bp m1f
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 384 4 4 block 1 2 1 1 0
run 100 5000 384 4 4 block 1 2 1 1 1
echo "AB5 DONE ($(date +%H:%M:%S))"
