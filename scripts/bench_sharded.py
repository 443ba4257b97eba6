#!/usr/bin/env python3
"""Sharded-planner benchmark + equality artifact (SURVEY.md §2.2, VERDICT #5).

Shards the K sample axis over all available devices (or an 8-device virtual
CPU mesh with --virtual) and reports:
  * sharded vs unsharded action equality at large K
  * sustained replan rate for both, and per-device sample throughput

On a single host with a virtual mesh the rate numbers measure partitioning
OVERHEAD (the virtual devices share one CPU); real scaling needs a real
multi-chip mesh, where the same GSPMD/shard_map program rides ICI.

Usage:
    python scripts/bench_sharded.py [--virtual] [--K 512] [--ticks 20]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--K", type=int, default=512)
    ap.add_argument("--ticks", type=int, default=20)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.parallel import make_mesh, shard_planner
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    n = len(jax.devices())
    K = args.K - args.K % (2 * n)  # even per-mode split
    overrides = [
        "task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]",
        f"mppi.num_samples={K}", "mppi.horizon=12", "mppi.u_per_command=12",
    ]

    def bench(tamp):
        state = tamp.env.init_state()
        tp = tamp.tamp_interface(state)
        # warm up / compile
        _, ms, _ = tamp.motion_planner.command(tamp.mppi_state, state, tp)
        jax.block_until_ready(ms)
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            act, ms, _ = tamp.motion_planner.command(ms, state, tp)
        jax.block_until_ready(act)
        dt = (time.perf_counter() - t0) / args.ticks
        return np.asarray(act[0]), dt

    tamp_u = ReactiveTAMP(load_config("config_point", overrides))
    act_u, dt_u = bench(tamp_u)

    tamp_s = ReactiveTAMP(load_config("config_point", overrides))
    shard_planner(tamp_s.motion_planner, make_mesh())
    act_s, dt_s = bench(tamp_s)

    equal = bool(np.allclose(act_u, act_s, atol=1e-4))
    out = {
        "devices": n,
        "platform": jax.devices()[0].platform,
        "K": K,
        "ticks": args.ticks,
        "unsharded_replan_ms": round(dt_u * 1e3, 3),
        "sharded_replan_ms": round(dt_s * 1e3, 3),
        "sharded_samples_per_sec_per_device": round(K / dt_s / n, 1),
        "action_equal": equal,
    }
    print(json.dumps(out))
    if not equal:
        print("MISMATCH:", act_u, act_s, file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
