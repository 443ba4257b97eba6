#!/bin/bash
# Round-4 TPU measurement chain, part B — the steps of run_tpu_chain_r4.sh
# that had not produced artifacts before the environment reset (/tmp wiped;
# PANDA_BENCH.json and the point BATCH_EVAL_BENCH.json row survived at HEAD).
# ONE TPU client at a time: steps run strictly sequentially, each under
# timeout, with a health probe between steps (a wedged axon tunnel hangs
# every subsequent dispatch for ~30-60 min).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_chain_r4b
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

# 1. utilization / roofline evidence (VERDICT r3 #4) -> UTILIZATION.json
#    (short; run first so the cheap artifact lands even if a later step wedges)
step utilization 1800 python scripts/analyze_utilization.py

# 2. seed-axis batch evaluation, panda (VERDICT r3 #1/#2)
step batch_eval_panda 5400 python scripts/bench_batch_eval.py n_runs=20 family=panda

# 3. a panda n=20 envelope PRODUCED BY the batched runner (VERDICT r3 #2
#    done-criterion) — quality must match the serial-runner envelopes
step panda_batched_envelope 5400 python scripts/run_experiments.py -cn config_panda \
    multi_modal=True parallel_seeds=true n_runs=20 chunked=10 \
    out=plot/panda/shelf_pick_mm_batched.npy

# 4. boxer reference-parity ablation row (VERDICT r3 #8): corner hybrid with
#    beta adaptation + continuous align OFF, vs the published 20/20 default
step boxer_parity 3600 python scripts/run_experiments.py -cn config_boxer \
    mppi=boxer_parity task=push_pull multi_modal=True goal="[-3.75,-3.75]" \
    n_runs=20 chunked=10 out=plot/point/boxer_corner_hybrid_parity.npy

# 5. domain-randomization envelope row (VERDICT r3 #5 done-criterion):
#    point push with 40% per-sample + per-seed friction noise armed
step fric_envelope 3600 python scripts/run_experiments.py task=push \
    goal="[-1,-1]" fric_noise=0.4 n_runs=20 chunked=10 \
    out=plot/point/push_fricnoise.npy

# 6. albert mobile-manipulation WITH contact envelope (VERDICT r3 #9
#    done-criterion): base pushes the box while the arm tracks overhead
step albert_push_reach 3600 python scripts/run_experiments.py -cn config_albert \
    task=push_reach goal="[3.0,0.0,0.6]" n_runs=20 chunked=10 \
    out=plot/albert/push_reach.npy

echo "CHAIN COMPLETE $(date -u +%H:%M:%S)" | tee -a $OUT/chain.log
