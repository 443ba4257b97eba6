#!/bin/bash
# Round-5 measurement chain (VERDICT r4 items):
#   A. panda headline re-measure with the annealed-resample refinement
#      (refine_iters=3 default; the r4 gradient chain was 16.0 of the
#      16.4 ms tick) -> PANDA_BENCH.json
#   B. panda + albert tick attribution rows -> UTILIZATION.json
#   C. albert replan-rate headline -> ALBERT_BENCH.json  (VERDICT weak #4)
#   D. panda quality envelopes at the new default (shelf + table batched,
#      serial normal + reactive) — the >=100 Hz done-criterion gate
#   E. corner-pull recovery revalidation (pull stall latch, VERDICT #6) +
#      corner2 family re-runs (the reposition min_clearance projection
#      changes staging in clipped-corner scenes)
#   F. bench.py combined headline record
# Same serial + probe protocol as r4b-r4d (ONE TPU client; quiet 1-core host).
#
# NOTE (post-hoc record): the round-5 session ran these steps individually
# plus additional measurement passes not scripted here: the refine_iters
# 2-vs-3 shelf A/B (19/20 -> 20/20), the albert refine on/off + greedy
# on/off envelope sweeps, the albert Pallas-kernel on-device parity check
# and ALBERT_BENCH re-measures (471 -> 2223 Hz), the shelf batch-B
# re-earn (seed_offset=100, 20/20), case2 + corner1-hybrid HEAD confirms,
# BATCH_EVAL panda re-measure, the PARALLEL_BENCH one-tick-equality sweep
# re-run, and 10k/5k-tick soak runs.  Step logs under /tmp/* in-session;
# results recorded in RESULTS.md and the committed artifacts.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_chain_r5
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

# A. headline
step bench_panda 2400 python scripts/bench_panda.py

# B. attribution rows
step util_panda 3600 python scripts/analyze_utilization.py panda
step util_albert 3600 python scripts/analyze_utilization.py albert

# C. albert headline
step bench_albert 3600 python scripts/bench_albert.py

# D. panda quality envelopes (new refine default)
step panda_shelf_batched 5400 python scripts/run_experiments.py -cn config_panda \
    multi_modal=True cube_on_shelf=True parallel_seeds=true n_runs=20 chunked=10 \
    out=plot/panda/shelf_pick_mm_batched.npy
step panda_table_batched 5400 python scripts/run_experiments.py -cn config_panda \
    multi_modal=True parallel_seeds=true n_runs=20 chunked=10 \
    out=plot/panda/pick_mm_batched.npy
step panda_normal 5400 python scripts/run_experiments.py -cn config_panda \
    n_runs=20 chunked=10 out=plot/panda/normal_pick.npy
step panda_reactive 5400 python scripts/run_experiments.py -cn config_panda \
    reactive_perturb=0.15 n_runs=20 chunked=10 out=plot/panda/reactive_pick.npy

# E. pull-recovery + corner2 revalidation
C2='actors=["box"]'
step corner1_pull 5400 python scripts/run_experiments.py task=pull \
    goal="[-3.75,-3.75]" n_runs=20 chunked=10 out=plot/point/corner1_pull.npy
step corner2_pull 5400 python scripts/run_experiments.py task=pull \
    goal="[-3.75,-3.75]" "$C2" initial_actor_positions="[[3.75,3.75]]" \
    n_runs=20 chunked=10 out=plot/point/corner2_pull.npy
step corner2_push 7200 python scripts/run_experiments.py task=push \
    goal="[-3.75,-3.75]" "$C2" initial_actor_positions="[[3.75,3.75]]" \
    n_runs=20 chunked=10 out=plot/point/corner2_push.npy
step corner2_hybrid 5400 python scripts/run_experiments.py task=push_pull \
    multi_modal=True goal="[-3.75,-3.75]" "$C2" \
    initial_actor_positions="[[3.75,3.75]]" n_runs=20 chunked=4 \
    out=plot/point/corner2_hybrid.npy
step heijn_corner2 5400 python scripts/run_experiments.py -cn config_heijn \
    task=push_pull multi_modal=True goal="[-3.75,-3.75]" "$C2" \
    initial_actor_positions="[[3.75,3.75]]" n_runs=20 chunked=4 \
    out=plot/point/heijn_corner2_hybrid.npy
step boxer_corner2 7200 python scripts/run_experiments.py -cn config_boxer \
    task=push_pull multi_modal=True goal="[-3.75,-3.75]" "$C2" \
    initial_actor_positions="[[3.75,3.75]]" n_runs=20 chunked=4 \
    out=plot/point/boxer_corner2_hybrid.npy

# F. combined headline record
step bench_combined 2400 python bench.py

echo "CHAIN COMPLETE $(date -u +%H:%M:%S)" | tee -a $OUT/chain.log
