# r4: knob re-tune at the radix-12 stack + 200k scale check.
set -u
cd /root/repo
run() {  # u group bp radix scale
  echo "=== mxu6 scale=${5:-100} u=$1 g=$2 bp=$3 radix=$4 ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "${5:-100}" 5000 384 "$2" "$1" block 1 2 1 "$3" 0 1 0 auto "$4" \
    || echo "FAILED/TIMEOUT: $*"
}
run 8 4 1 12
run 4 8 1 12
run 4 4 2 12
run 4 4 1 12 50
run 4 4 1 3 50
