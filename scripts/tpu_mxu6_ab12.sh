# r4 radix A/B (VERDICT r3 item 1 research lever): radix-6/12 channel
# packing at the tuned 400k stack. Fresh process per config.
#   PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_ab12.sh
set -u
cd /root/repo
run() {  # radix
  echo "=== mxu6 400k radix=$1 ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py 100 5000 384 4 4 block 1 2 1 1 0 1 0 auto "$1" \
    || echo "FAILED/TIMEOUT: radix=$1"
}
run 3
run 6
run 12
