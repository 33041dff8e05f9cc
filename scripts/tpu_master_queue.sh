# Master hardware queue for the round-3 continuation (run AFTER
# tpu_mxu6_ab2.sh finishes; single tunneled chip — strictly serial):
#   1. mxu6 winning-config scaling (40k/100k/200k) for the crossover +
#      the refreshed scaling table
#   2. mxu6 phase decomposition at the winning config
#   3. BENCH_PRIMS r03 grids (20-iter pass, then the 1000-iter rerun for
#      the sub-relay-floor groups) + merge to BENCH_PRIMS_r03.json
#   4. plan-route float csrmv reference rows (VERDICT-r2 #3 evidence)
#   5. CSR scatter-crossover tuner sweep (VERDICT-r2 weak #7)
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_master_queue.sh
set -u
cd /root/repo
W="${MXU6_KNOBS:-384 4 2 block 1 1}"   # rpb group unroll gather pf fl
echo "=== [1] mxu6 scaling at winner ($W) ($(date +%H:%M:%S)) ==="
for scale in 10 25 50; do
  timeout 2400 python scripts/tpu_mxu6_val.py "$scale" 20000 $W \
    || echo "FAILED/TIMEOUT: scale=$scale"
done
echo "=== [2] mxu6 phase diag at winner ($(date +%H:%M:%S)) ==="
timeout 2400 python scripts/tpu_mxu6_diag.py 100 5000 $W \
  || echo "FAILED/TIMEOUT: diag"
echo "=== [3] BENCH_PRIMS r03 ($(date +%H:%M:%S)) ==="
bash scripts/tpu_bench_prims_r3.sh
bash scripts/tpu_bench_prims_r3b.sh
python scripts/merge_bench_prims_r3.py || echo "MERGE FAILED"
echo "=== [4] plan csrmv rows ($(date +%H:%M:%S)) ==="
timeout 2400 python scripts/tpu_plan_csr_rows.py \
  || echo "FAILED/TIMEOUT: plan rows"
echo "=== [5] csr tuner sweep ($(date +%H:%M:%S)) ==="
timeout 3600 python scripts/tpu_csr_tuner_sweep.py \
  || echo "FAILED/TIMEOUT: tuner"
echo "MASTER QUEUE DONE ($(date +%H:%M:%S))"
