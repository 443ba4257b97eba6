#!/bin/bash
# Round-4 TPU measurement chain. ONE TPU client at a time: steps run
# strictly sequentially, each under timeout, and the chain aborts the moment
# a health probe fails (a wedged axon tunnel hangs every subsequent dispatch
# for ~30-60 min — continuing just deepens the wedge).
# Logs land in /tmp/tpu_chain_r4/; artifacts at the repo root + plot/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_chain_r4
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

probe || { echo "ABORT: tunnel down at start" | tee -a $OUT/chain.log; exit 1; }

# 1. headline bench at HEAD (catches any kernel-refactor regression vs r3's
#    2888 Hz pipelined / 2181 Hz serial)
step bench 900 python bench.py

# 2. panda headline bench (VERDICT r3 #3): sustained pick-place replan Hz at
#    K=200 x T=12 with the on-device AIF chunk -> PANDA_BENCH.json
step bench_panda 1800 python scripts/bench_panda.py

# 3. on-device kernel parity incl. the NEW grid-batched rollouts
step pallas_tpu 2400 env M3P2I_TEST_TPU=1 python -m pytest tests/test_pallas.py -q

# 4. seed-axis batch evaluation artifacts (VERDICT r3 #1): serial vs ONE
#    vmapped batched program, point + panda, n=20
step batch_eval_point 3600 python scripts/bench_batch_eval.py n_runs=20
step batch_eval_panda 5400 python scripts/bench_batch_eval.py n_runs=20 family=panda

# 5. a panda n=20 envelope PRODUCED BY the batched runner (VERDICT r3 #2
#    done-criterion) — quality must match the serial-runner envelopes
step panda_batched_envelope 5400 python scripts/run_experiments.py -cn config_panda \
    parallel_seeds=true n_runs=20 chunked=10 out=plot/panda/pick_batched.npy

# 6. utilization / roofline evidence (VERDICT r3 #4) -> UTILIZATION.json
step utilization 1800 python scripts/analyze_utilization.py

echo "CHAIN COMPLETE $(date -u +%H:%M:%S)" | tee -a $OUT/chain.log
