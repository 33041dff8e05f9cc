# mxu6 A/B round 8: compact_j=1 at 40k/200k (400k won: 154.5 vs 157.1)
# before flipping the tuned default.
set -u
cd /root/repo
run() {
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 10 20000 384 4 4 block 1 2 1 1 0 1 0
run 50 20000 384 4 4 block 1 2 1 1 0 1 0
echo "AB8 DONE ($(date +%H:%M:%S))"
