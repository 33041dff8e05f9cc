# mxu6 A/B round 10: rpb / factor_unroll / prefetch re-tested AT THE
# FINAL STACK (fl=2 ei=1 cj=1 cd=1) — the earlier rpb/unroll tuning
# predates ei_split + wide loads + compact_dot, so the optimum may have
# moved. Goal: close the last 154.5 -> <=150 us at 400k.
# args: scale steps rpb g u gather pf fl ei bp m1f cj tw cd
set -u
cd /root/repo
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
run() {
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 384 4 4 block 1 2 1 1 0 1 0 1   # same-day control
run 100 5000 448 4 4 block 1 2 1 1 0 1 0 1
run 100 5000 320 4 4 block 1 2 1 1 0 1 0 1
run 100 5000 384 4 6 block 1 2 1 1 0 1 0 1
run 100 5000 384 4 8 block 1 2 1 1 0 1 0 1
run 100 5000 384 4 4 block 0 2 1 1 0 1 0 1  # prefetch off
echo "AB10 DONE ($(date +%H:%M:%S))"
