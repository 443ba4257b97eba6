#!/bin/bash
# Round-4 follow-up chain (after run_tpu_chain_r4b.sh):
#   A. utilization rerun with device-side scanned timing
#   B. the TRUE shelf-pick batched envelope (r4b step 3 omitted
#      cube_on_shelf=True), on batch-B seeds 100-119 — doubles as the
#      shelf-slide re-check (round-3 artifact row 3 = seed 103 slid 0.23 m)
#   C. grad_refine_unroll A/B on the panda headline bench
#   D. sample-axis crossover sweep (CPU, but serialized here so the host is
#      quiet while it self-times)
# Same serial + probe protocol as r4b (ONE TPU client; quiet 1-core host).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_chain_r4c
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

step utilization 2400 python scripts/analyze_utilization.py

step shelf_batched 5400 python scripts/run_experiments.py -cn config_panda \
    multi_modal=True cube_on_shelf=True parallel_seeds=true n_runs=20 \
    seed_offset=100 chunked=10 out=plot/panda/shelf_pick_mm_batched.npy

step bench_panda_unroll 2400 python scripts/bench_panda.py \
    mppi.grad_refine_unroll=True out=/tmp/tpu_chain_r4c/PANDA_BENCH_UNROLL.json

# CPU step last: no TPU client, but serialized for a quiet host while it
# self-times (the sweep measures its own replan ms)
echo "=== sweep $(date -u +%H:%M:%S) ===" | tee -a $OUT/chain.log
timeout 3600 python scripts/bench_sharded.py --virtual \
    --sweep 512,2048,8192,16384 --ticks 10 --out PARALLEL_BENCH.json \
    > $OUT/sweep.log 2>&1
echo "=== sweep rc=$? $(date -u +%H:%M:%S) ===" | tee -a $OUT/chain.log

echo "CHAIN COMPLETE $(date -u +%H:%M:%S)" | tee -a $OUT/chain.log
