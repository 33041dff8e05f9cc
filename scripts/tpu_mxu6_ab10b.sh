# mxu6 A/B round 10b: rpb re-tuned AT THE FINAL STACK (fl=2 ei=1 cj=1
# cd=1). Larger rpb shrinks the binomial padding ratio (fewer
# partitions -> sum_p max_deg_p closer to the mean degree) at the cost
# of taller one-hots — economics that ei_split changed.
# rpb must be a multiple of 3 (E/I-block layout), so the grid is
# 288/384/576/768; 384 is the same-day control.
# args: scale steps rpb g u gather pf fl ei bp m1f cj tw cd
set -u
cd /root/repo
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
run() {
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
if [ "${SKIP_CONTROL:-0}" != "1" ]; then
  run 100 5000 384 4 4 block 1 2 1 1 0 1 0 1   # same-day control
fi
run 100 5000 576 4 4 block 1 2 1 1 0 1 0 1
run 100 5000 288 4 4 block 1 2 1 1 0 1 0 1
run 100 5000 768 4 4 block 1 2 1 1 0 1 0 1
echo "AB10B DONE ($(date +%H:%M:%S))"
