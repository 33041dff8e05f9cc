# Post-ab3 queue: scaling at the new winner (rpb=384 g=4 u=4 block
# pf=1 fl=2 ei=1, 155.3 us/step at 400k), phase diag at the winner,
# official bench.py headline, then the BENCH_PRIMS relay-floor fixup.
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_post_queue2.sh
set -u
cd /root/repo
for scale in 1 2.5 5 10 25 50; do
  echo "=== mxu6 winner scale=$scale ($(date +%H:%M:%S)) ==="
  timeout 1800 python scripts/tpu_mxu6_val.py "$scale" 20000 384 4 4 block 1 2 1 \
    || echo "FAILED/TIMEOUT: scale=$scale"
done
echo "=== mxu6 phase diag at winner ($(date +%H:%M:%S)) ==="
timeout 2400 python scripts/tpu_mxu6_diag.py 100 5000 384 4 4 block 1 2 1 \
  || echo "FAILED/TIMEOUT: diag"
echo "=== bench.py ($(date +%H:%M:%S)) ==="
timeout 1800 python bench.py || echo "FAILED/TIMEOUT: bench.py"
echo "=== bench prims r3d ($(date +%H:%M:%S)) ==="
bash scripts/tpu_bench_prims_r3d.sh
echo "POST QUEUE 2 DONE ($(date +%H:%M:%S))"
