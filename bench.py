#!/usr/bin/env python3
"""Headline benchmark: M3P2I replanning rate on the reference workload.

Measures the full replanning step — K=200 rollouts x T=15 horizon of the JAX
physics engine, multi-modal push/pull costs + suction, importance-weighted
update, trajectory extraction — on the point env, end to end (host task
planner included), on whatever accelerator JAX picks (TPU under the driver).

Baseline: the reference's logged motion-planner rate is 12.9-21.2 Hz mean per
scenario at the same K=200 x T=15 on an NVIDIA GPU via Isaac Gym
(BASELINE.md "Throughput / rates"); vs_baseline uses the best scenario mean,
21.2 Hz.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Hz", "vs_baseline": N}
"""
import json
import os
import sys
import time

BASELINE_HZ = 21.2  # best reference scenario mean (plot/point/*.npy col 16)


def main() -> None:
    import jax

    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.sim_loop import SimLoop

    cfg = load_config(
        "config_point",
        ["task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]"],
    )
    loop = SimLoop(cfg)
    loop.warmup(50)
    # keep replanning forever: the benchmark measures sustained replan rate,
    # not task completion (the box reaches the goal within the settle phase).
    # Both gates off: the host check and the on-device early-exit latch.
    loop.tamp.task_planner.check_task_success = lambda view: False
    loop.tamp.device_gate = False

    # chunked execution: every tick is a full K x T replan + real-env step,
    # scanned on-device so dispatch latency is amortized (the reference pays
    # an RPC + state sync + 2 queries per tick instead, sim.py:37-58)
    # 200 ticks per dispatch: the on-device tick is ~0.57 ms while a chunk
    # boundary costs ~40 ms through the remote tunnel (host view unpack + one
    # round trip), so chunk size sets the measured rate's ceiling.  Every
    # tick remains a FULL K-rollout replan + real-env step.
    # Default mode: double-buffered chunks (SimLoop._run_chunked_pipelined)
    # hide the chunk-boundary tunnel round trip behind on-device compute;
    # tick math is identical (tests/test_tamp_integration.py equivalence).
    # --serial / M3P2I_BENCH_SERIAL=1 measures the unpipelined round-trip
    # mode instead (r3 on the v5e: 2888 Hz pipelined vs 2181 Hz serial).
    pipelined = not (
        "--serial" in sys.argv or os.environ.get("M3P2I_BENCH_SERIAL") == "1"
    )
    chunk = int(os.environ.get("M3P2I_BENCH_CHUNK", "200"))
    for _ in range(2):  # compile + settle (2nd round catches signature drift)
        loop.run_chunked(chunk, chunk=chunk)

    n = 800
    t0 = time.perf_counter()
    if pipelined:
        loop.run_chunked(n, chunk=chunk, pipelined=True)
        done = n
    else:
        done = 0
        while done < n:
            loop.run_chunked(chunk, chunk=chunk)
            done += chunk
    dt = time.perf_counter() - t0

    hz = done / dt
    line = {
        "metric": "m3p2i_replan_rate_point_K200_T15_multimodal",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / BASELINE_HZ, 2),
    }
    # carry the panda headline too (measured separately by scripts/
    # bench_panda.py on the TPU chain — full pick-place replan at K=200xT=12;
    # reference class 12.9-21.2 Hz, BASELINE.md): embed its artifact so one
    # BENCH_r{N}.json records both envs.
    panda_artifact = os.path.join(os.path.dirname(__file__), "PANDA_BENCH.json")
    try:
        with open(panda_artifact) as f:
            panda = json.load(f)
        line["panda_hz"] = panda["value"]
        line["panda_vs_baseline"] = panda.get("vs_baseline")
        # provenance: the panda number is measured by scripts/bench_panda.py
        # in a separate chain step — record when, so a stale artifact is
        # visible in the combined record instead of silently carried
        mtime = os.path.getmtime(panda_artifact)
        line["panda_measured_utc"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime(mtime)
        )
        line["panda_age_h"] = round((time.time() - mtime) / 3600.0, 1)
    except Exception as e:  # missing/corrupt artifact: warn, don't hide
        print(
            f"bench.py: no panda artifact embedded ({panda_artifact}: {e})",
            file=sys.stderr,
        )
    albert_artifact = os.path.join(
        os.path.dirname(__file__), "ALBERT_BENCH.json"
    )
    try:
        with open(albert_artifact) as f:
            albert = json.load(f)
        line["albert_hz"] = albert["value"]
        line["albert_vs_baseline"] = albert.get("vs_baseline")
        mtime = os.path.getmtime(albert_artifact)
        line["albert_measured_utc"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime(mtime)
        )
    except Exception as e:
        print(
            f"bench.py: no albert artifact embedded ({albert_artifact}: {e})",
            file=sys.stderr,
        )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
