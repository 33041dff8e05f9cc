# Final tuned-knob mxu6 scaling rerun (fl=2 ei=1 landed after the
# round-3 scaling table): 40k/100k/200k, 20k steps, fresh process.
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_mxu6_scale2.sh | tee /tmp/mxu6_scale2.log
set -u
cd /root/repo
run() {
  echo "=== mxu6 $* ($(date +%H:%M:%S)) ==="
  timeout 2400 python scripts/tpu_mxu6_val.py "$@" \
    || echo "FAILED/TIMEOUT: $*"
}
run 10 20000 384 4 4 block 1 2 1 1 0 4 0
run 25 20000 384 4 4 block 1 2 1 1 0 4 0
run 50 20000 384 4 4 block 1 2 1 1 0 4 0
echo "SCALE2 DONE ($(date +%H:%M:%S))"
