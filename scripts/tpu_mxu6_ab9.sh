# mxu6 A/B round 9: compact_dot (two-level MXU rank scatter in the
# compaction phase) vs the (R, cap) one-hot control, at 400k and 200k
# (cap > 128 there; 40k has cap=128 where the knob is modeled a wash).
# args: scale steps rpb g u gather pf fl ei bp m1f cj tw cd
set -u
cd /root/repo
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
run() {
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 384 4 4 block 1 2 1 1 0 1 0 1
run 100 5000 384 4 4 block 1 2 1 1 0 1 0 0
run 50 20000 384 4 4 block 1 2 1 1 0 1 0 1
run 10 20000 384 4 4 block 1 2 1 1 0 4 0 1
echo "AB9 DONE ($(date +%H:%M:%S))"
