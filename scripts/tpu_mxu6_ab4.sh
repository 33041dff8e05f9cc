# mxu6 hardware A/B round 4: block_pack (bp event blocks per dot) on
# top of the ab3 winner (155.3 us/step at 400k, rpb=384 g=4 u=4 block
# pf=1 fl=2 ei=1). bp divides factor-loop trips and accumulator
# read/writes; u=2/bp=2 probes trading chain ILP for packing.
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_ab4.sh | tee /tmp/mxu6_ab4.log
set -u
cd /root/repo
run() {  # scale steps rpb group unroll gather prefetch fused ei bp
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 384 4 4 block 1 2 1 2
run 100 5000 384 4 4 block 1 2 1 4
run 100 5000 384 4 2 block 1 2 1 2
echo "AB4 DONE ($(date +%H:%M:%S))"
