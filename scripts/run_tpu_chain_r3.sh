#!/bin/bash
# Round-3 final TPU measurement chain. ONE TPU client at a time: steps run
# strictly sequentially, each under timeout, and the chain aborts the moment
# a health probe fails (a wedged axon tunnel hangs every subsequent dispatch
# for ~30-60 min — continuing just deepens the wedge).
# Logs land in /tmp/tpu_chain/; artifacts in plot/ + /tmp/tpu_chain/bench*.json.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_chain
mkdir -p $OUT

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe ok', (x @ x).sum())
" >> $OUT/probe.log 2>&1
}

step() {  # step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name $(date -u +%H:%M:%S) ===" | tee -a $OUT/chain.log
    timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc ===" | tee -a $OUT/chain.log
    if ! probe; then
        echo "ABORT: tunnel wedged after $name" | tee -a $OUT/chain.log
        exit 1
    fi
    return $rc
}

# Quality batches are sim-time measurements (hardware-independent); a CPU
# fallback campaign may already have produced them during a tunnel outage.
# Skip a batch whose output .npy already holds >= 20 rows.
done_rows() {  # done_rows <npy>
    python - "$1" <<'PY'
import sys
import numpy as np
try:
    print(1 if np.load(sys.argv[1]).shape[0] >= 20 else 0)
except Exception:
    print(0)
PY
}

qstep() {  # qstep <name> <timeout_s> <out_npy> <cmd...>
    local name=$1 tmo=$2 npy=$3; shift 3
    if [ "$(done_rows "$npy")" = "1" ]; then
        echo "=== $name SKIP (already $npy complete) ===" | tee -a $OUT/chain.log
        return 0
    fi
    step "$name" "$tmo" "$@"
}

probe || { echo "ABORT: tunnel down at start" | tee -a $OUT/chain.log; exit 1; }

# 1. headline bench (fast, confirms the 2162 Hz figure at HEAD)
step bench 900 python bench.py

# 1b. pipelined bench: double-buffered chunks hide the tunnel round trip
step bench_pipelined 900 python bench.py --pipelined

# 2. boxer staged pure push, n=20, default config (staged pocket endgame)
qstep boxer_push 5400 plot/point/boxer_push.npy python scripts/run_experiments.py -cn config_boxer \
    task=push goal="[-1,-1]" n_runs=20 chunked=10 \
    out=plot/point/boxer_push.npy

# 2a. corner1 push/pull singles at n=20 (reference: 6.21±6.81 / 25.10±13.80;
# completes the corner1 trio next to the published hybrid batches)
qstep corner1_push 5400 plot/point/corner1_push.npy python scripts/run_experiments.py task=push \
    goal="[-3.75,-3.75]" n_runs=20 chunked=10 out=plot/point/corner1_push.npy
qstep corner1_pull 5400 plot/point/corner1_pull.npy python scripts/run_experiments.py task=pull \
    goal="[-3.75,-3.75]" n_runs=20 chunked=10 out=plot/point/corner1_pull.npy

# 2b. the reference's TWO-corner scenario (box starts in the NE corner, goal
# in the SW pocket; BASELINE.md: hybrid 9.95±3.46 s, push fails, pull 32.9 s).
# chunked=4 keeps the stall latch's detection latency at 3 s sim time.
C2='actors=["box"]'
qstep corner2_hybrid 5400 plot/point/corner2_hybrid.npy python scripts/run_experiments.py task=push_pull \
    multi_modal=True goal="[-3.75,-3.75]" "$C2" \
    initial_actor_positions="[[3.75,3.75]]" n_runs=20 chunked=4 \
    out=plot/point/corner2_hybrid.npy
qstep corner2_hybrid_b 5400 plot/point/corner2_hybrid_b.npy python scripts/run_experiments.py task=push_pull \
    multi_modal=True goal="[-3.75,-3.75]" "$C2" \
    initial_actor_positions="[[3.75,3.75]]" n_runs=20 chunked=4 \
    seed_offset=100 out=plot/point/corner2_hybrid_b.npy
qstep corner2_pull 5400 plot/point/corner2_pull.npy python scripts/run_experiments.py task=pull \
    goal="[-3.75,-3.75]" "$C2" initial_actor_positions="[[3.75,3.75]]" \
    n_runs=20 chunked=10 out=plot/point/corner2_pull.npy
qstep corner2_push 7200 plot/point/corner2_push.npy python scripts/run_experiments.py task=push \
    goal="[-3.75,-3.75]" "$C2" initial_actor_positions="[[3.75,3.75]]" \
    n_runs=20 chunked=10 out=plot/point/corner2_push.npy
qstep heijn_corner2 5400 plot/point/heijn_corner2_hybrid.npy python scripts/run_experiments.py -cn config_heijn \
    task=push_pull multi_modal=True goal="[-3.75,-3.75]" "$C2" \
    initial_actor_positions="[[3.75,3.75]]" n_runs=20 chunked=4 \
    out=plot/point/heijn_corner2_hybrid.npy
qstep boxer_corner2 7200 plot/point/boxer_corner2_hybrid.npy python scripts/run_experiments.py -cn config_boxer \
    task=push_pull multi_modal=True goal="[-3.75,-3.75]" "$C2" \
    initial_actor_positions="[[3.75,3.75]]" n_runs=20 chunked=4 \
    out=plot/point/boxer_corner2_hybrid.npy

# 3. albert ee_reach, n=20 (exploration_noise=0.15 default, seed-16 fix)
qstep albert 5400 plot/albert/ee_reach.npy python scripts/run_experiments.py -cn config_albert \
    n_runs=20 out=plot/albert/ee_reach.npy

# 4. north-star workload with the packed kernel
step northstar 1200 python scripts/bench_northstar.py 500 30

echo "CHAIN COMPLETE $(date -u +%H:%M:%S)" | tee -a $OUT/chain.log
