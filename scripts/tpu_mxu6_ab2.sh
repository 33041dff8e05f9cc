# mxu6 hardware A/B round 2 (val->m1 mask commit be4ad27 in tree).
# Round-1 winner was rpb=384 g=4 u=2 block pf=1 fl=1 at 196.52 us/step;
# the first row re-runs it as a direct A/B of the val->m1 change, then
# the u=4 cross the first queue skipped and one rpb=576 probe. Run:
#   PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_ab2.sh | tee /tmp/mxu6_ab2.log
set -u
cd /root/repo
run() {  # scale steps rpb group unroll gather prefetch fused_load
  echo "=== mxu6 scale=$1 steps=$2 rpb=$3 g=$4 u=$5 gather=$6 pf=${7:-0} fl=${8:-0} ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$1" "$2" "$3" "$4" "$5" "$6" "${7:-0}" "${8:-0}" \
    || echo "FAILED/TIMEOUT: $*"
}
run 100 5000 384 4 2 block 1 1
run 100 5000 384 4 4 block 1 1
run 100 5000 384 4 4 block 1 0
run 100 5000 576 4 2 block 1 1
