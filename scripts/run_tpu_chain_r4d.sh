#!/bin/bash
# Round-4 chain D (after run_tpu_chain_r4c.sh):
#   A. albert push_reach envelope RE-RUN with the tick-granular stall latch
#      (the chunk-granular latch was the 8/20 timeout cause: each
#      push<->reposition recovery cycle paid a 150-tick detection delay)
#   B. serial shelf-pick seed-103 confirm (round-3 release-slide outlier;
#      the batched rerun at HEAD shows no slide — this pins the serial path)
#   C. panda headline bench re-measure on a QUIET host with the new
#      grad_refine_unroll=True default (the r4c A/B ran under CPU load)
# Same serial + probe protocol as r4b/r4c (ONE TPU client; quiet 1-core host).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_chain_r4d
mkdir -p $OUT

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe ok', float((x @ x).sum()))
" >> $OUT/probe.log 2>&1
}

wait_healthy() {
    local tries=0
    while ! probe; do
        tries=$((tries + 1))
        echo "tunnel wedged, wait $tries/18 $(date -u +%H:%M:%S)" | tee -a $OUT/chain.log
        if [ $tries -ge 18 ]; then
            echo "ABORT: tunnel stayed wedged 90 min" | tee -a $OUT/chain.log
            exit 1
        fi
        sleep 300
    done
}

step() {  # step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    wait_healthy
    echo "=== $name $(date -u +%H:%M:%S) ===" | tee -a $OUT/chain.log
    timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc $(date -u +%H:%M:%S) ===" | tee -a $OUT/chain.log
    return $rc
}

step albert_push_reach 3600 python scripts/run_experiments.py -cn config_albert \
    task=push_reach goal="[3.0,0.0,0.6]" n_runs=20 chunked=10 \
    out=plot/albert/push_reach.npy

step shelf_seed103_serial 3600 python scripts/run_experiments.py -cn config_panda \
    multi_modal=True cube_on_shelf=True n_runs=1 seed_offset=103 chunked=10 \
    out=/tmp/tpu_chain_r4d/shelf_seed103.npy

step bench_panda_clean 2400 python scripts/bench_panda.py \
    out=PANDA_BENCH.json

echo "CHAIN COMPLETE $(date -u +%H:%M:%S)" | tee -a $OUT/chain.log
