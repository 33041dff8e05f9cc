# mxu6 hardware A/B round 6: tiered event scatter (tier_w) at the ab3
# winner (155.3 us/step at 400k: rpb=384 g=4 u=4 block pf=1 fl=2 ei=1).
# Clean events (per-partition out-degree <= tier_w in every partition)
# sweep only the first tier_w slots per partition segment; dirty events
# sweep everything. Expected: most events are clean at tw=16 (~87%), so
# the factor phase's mask-build work drops toward tw/width of the full
# sweep for the clean pass. Spike counts must match the tw=0 control
# exactly (same table, two masked compactions).
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_ab6.sh | tee /tmp/mxu6_ab6.log
set -u
cd /root/repo
run() {  # scale steps rpb group unroll gather prefetch fused ei bp m1f cj tw
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 384 4 4 block 1 2 1 1 0 4 0
run 100 5000 384 4 4 block 1 2 1 1 0 4 16
run 100 5000 384 4 4 block 1 2 1 1 0 4 8
run 100 5000 384 4 4 block 1 2 1 1 0 4 24
echo "AB6 DONE ($(date +%H:%M:%S))"
