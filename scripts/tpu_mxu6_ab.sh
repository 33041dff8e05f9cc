# mxu6 hardware A/B queue (VERDICT-r2 #1): factor_unroll and gather='block'
# at 400k, then the winning config across the scaling sizes. Fresh process
# per config (tpu_mxu6_val.py handles the timing protocol). Run:
#   PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_ab.sh | tee /tmp/mxu6_ab.log
set -u
cd /root/repo
run() {  # scale steps rpb group unroll gather prefetch fused_load
  echo "=== mxu6 scale=$1 steps=$2 rpb=$3 g=$4 u=$5 gather=$6 pf=${7:-0} fl=${8:-0} ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$1" "$2" "$3" "$4" "$5" "$6" "${7:-0}" "${8:-0}" \
    || echo "FAILED/TIMEOUT: $*"
}
# 400k knob A/B (scale=100 -> num=400k, 5k steps)
run 100 5000 384 4 2 rows 0
run 100 5000 384 4 4 rows 0
run 100 5000 384 4 4 block 0
run 100 5000 384 4 4 block 1
run 100 5000 192 4 4 block 1
run 100 5000 96 4 4 block 1
run 100 5000 768 4 4 block 1
run 100 5000 384 4 1 block 0 1
run 100 5000 384 8 1 block 0 1
run 100 5000 384 4 2 block 1 1
run 100 5000 384 8 2 block 1 1
