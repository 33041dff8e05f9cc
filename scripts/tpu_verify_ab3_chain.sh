# Post-master chain: mxu6 exactness probe on hardware (new baked
# encoding + ei_split vs the mxu3 oracle at 4k), then the ab3 knob A/B.
# Run: PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/tpu_verify_ab3_chain.sh
set -u
cd /root/repo
echo "=== mxu6 exact probe ($(date +%H:%M:%S)) ==="
timeout 1200 python scripts/tpu_mxu6_exact.py || echo "FAILED/TIMEOUT: exact"
bash scripts/tpu_mxu6_ab3.sh
echo "CHAIN DONE ($(date +%H:%M:%S))"
