# Post-master probes: mxu6 tuned-knob runs at 4k/10k/20k to refine the
# auto crossover below 40k, then one official bench.py headline read.
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_post_queue.sh
set -u
cd /root/repo
for scale in 1 2.5 5; do
  echo "=== mxu6 tuned scale=$scale ($(date +%H:%M:%S)) ==="
  timeout 1800 python scripts/tpu_mxu6_val.py "$scale" 100000 384 4 4 block 1 1 \
    || echo "FAILED/TIMEOUT: scale=$scale"
done
echo "=== bench.py ($(date +%H:%M:%S)) ==="
timeout 1800 python bench.py || echo "FAILED/TIMEOUT: bench.py"
echo "POST QUEUE DONE"
