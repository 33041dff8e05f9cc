# mxu6 hardware A/B round 3: the baked slot encoding + E/I block-range
# split + wide fused load. Row 1 isolates the encoding/batched-decode
# change (ei=0, same knobs as the round-2 winner 188.39 us/step); rows
# 2-4 stack ei_split, the wide load, and u=8. Spike counts must equal
# the ab2 runs exactly (4370377 warm / 4377665 run0-1 / 4373841 run2).
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_ab3.sh | tee /tmp/mxu6_ab3.log
set -u
cd /root/repo
run() {  # scale steps rpb group unroll gather prefetch fused_load ei
  echo "=== mxu6 scale=$1 steps=$2 rpb=$3 g=$4 u=$5 gather=$6 pf=$7 fl=$8 ei=$9 ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$1" "$2" "$3" "$4" "$5" "$6" "$7" "$8" "$9" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 384 4 4 block 1 1 0
run 100 5000 384 4 4 block 1 1 1
run 100 5000 384 4 4 block 1 2 1
run 100 5000 384 8 4 block 1 2 1
run 100 5000 384 4 8 block 1 2 1
