# mxu6 A/B round 11: LARGE rpb at the final stack. Fewer partitions
# shrink the binomial padding ratio (sum_p max_deg_p closer to the mean
# degree: P=9 -> cols ~252 at deg 80; P=6 -> ~200; P=4 -> ~170) at the
# cost of taller one-hots (r3p = rpb/3) — economics that ei_split and
# packed fields changed since rpb=384 was tuned.
# args: scale steps rpb g u gather pf fl ei bp m1f cj tw cd
set -u
cd /root/repo
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
run() {
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 576 4 4 block 1 2 1 1 0 1 0 1
run 100 5000 800 4 4 block 1 2 1 1 0 1 0 1
run 100 5000 1068 4 4 block 1 2 1 1 0 1 0 1
echo "AB11 DONE ($(date +%H:%M:%S))"
