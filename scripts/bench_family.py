#!/usr/bin/env python3
"""Replan-rate benchmark for ANY robot family config (generalizes bench.py).

Same protocol as the headline bench: success gates disabled, chunked
200-tick scans, every tick a full K-rollout replan + real-env step.

    python scripts/bench_family.py -cn config_heijn task=push_pull \
        multi_modal=True goal="[-3.75,-3.75]"
    python scripts/bench_family.py -cn config_boxer task=push_pull ...

Prints ONE JSON line; writes FAMILY_BENCH_<env>.json unless out=- given.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_HZ = 21.2  # best reference scenario mean (plot/point/*.npy col 16)


def main(argv) -> None:
    out = None
    passthrough = []
    for a in argv:
        if a.startswith("out="):
            out = a.split("=", 1)[1]
        else:
            passthrough.append(a)

    import jax

    from m3p2i_aip_tpu.config.config_store import load_config_from_argv
    from m3p2i_aip_tpu.tamp.sim_loop import SimLoop

    cfg = load_config_from_argv(passthrough, default_config="config_point")
    loop = SimLoop(cfg)
    loop.warmup(50)
    loop.tamp.task_planner.check_task_success = lambda view: False
    loop.tamp.device_gate = False

    chunk = int(os.environ.get("M3P2I_BENCH_CHUNK", "200"))
    n = int(os.environ.get("M3P2I_BENCH_TICKS", "800"))
    for _ in range(2):
        loop.run_chunked(chunk, chunk=chunk)

    t0 = time.perf_counter()
    loop.run_chunked(n, chunk=chunk, pipelined=True)
    dt = time.perf_counter() - t0

    hz = n / dt
    robot = getattr(cfg.sim, "robot_type", None) or cfg.env_type
    try:
        robot = str(loop.tamp.env.params.robot_type)
    except AttributeError:
        pass
    rec = {
        "metric": (
            f"m3p2i_replan_rate_{robot}_K{int(cfg.mppi.num_samples)}"
            f"_T{int(cfg.mppi.horizon)}_{cfg.task}"
        ),
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / BASELINE_HZ, 2),
        "platform": jax.devices()[0].platform,
        "K": int(cfg.mppi.num_samples),
        "T": int(cfg.mppi.horizon),
        "chunk": chunk,
        "ticks": n,
        "use_pallas": bool(loop.tamp.motion_planner.rollout_override is not None),
    }
    line = json.dumps(rec)
    print(line)
    if out != "-":
        path = out or f"FAMILY_BENCH_{robot}.json"
        with open(path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
