# mxu6 A/B round 7: compaction granularity (compact_j) + group=2 at the
# tuned stack (same-day control: cj=4 -> 157.08 us/step, ab6 row 1).
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_ab7.sh | tee /tmp/mxu6_ab7.log
set -u
cd /root/repo
run() {
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 384 4 4 block 1 2 1 1 0 1 0
run 100 5000 384 4 4 block 1 2 1 1 0 2 0
run 100 5000 384 2 4 block 1 2 1 1 0 4 0
echo "AB7 DONE ($(date +%H:%M:%S))"
