# CSR scatter-crossover tuner sweep on the live chip (VERDICT-r2 weak #7):
# run init_csr_config over the reference's microbenchmark grid
# (/root/reference/brainevent/_csr/binary.py:757-824 benches n in
# {1k, 10k, 100k} x rate {0.001, 0.01, 0.1} at ~1-2% density) plus the
# acceptance sizes, persist the winner, and print the full table for
# BENCH_NOTES.md. Fresh process; ~10 compiles, budget 20-40 min.
import json

import jax

from brainevent_tpu.csr.initialize import init_csr_config
from brainevent_tpu.csr.block_config import get_hybrid_config

print('devices:', jax.devices(), flush=True)
cfg = init_csr_config(
    ns=(1024, 4096, 10240, 40960, 102400, 409600),
    rates=(0.001, 0.01, 0.1),
    conn_per_row=80,
    verbose=True,
    persist=True,
    iterations=300,
)
print('picked:', cfg, flush=True)
print(json.dumps({'mxu_scatter_limit': cfg.mxu_scatter_limit}))
