#!/usr/bin/env python3
"""Sample-axis sharding benchmark + crossover study (SURVEY.md §2.2).

Shards the K sample axis over all available devices (or an 8-device virtual
CPU mesh with --virtual) and reports, per K in a sweep:
  * sharded vs unsharded action equality
  * sustained replan latency for both, and the sharded/unsharded ratio

The point of the sweep is the CROSSOVER: sample-axis sharding pays a fixed
partitioning cost (shard_map dispatch, the weight-stage all-gather, GSPMD
overheads), so it only wins once the per-device rollout work dominates that
cost.  At the reference workload (K=200..512) a single chip is far from
saturated and sharding is pure overhead; the sweep finds where (whether)
the ratio crosses 1 on the measured backend.

On a single host with a virtual mesh the numbers measure partitioning
OVERHEAD only (the 8 "devices" share one physical CPU, so there is no
added compute bandwidth to win); on a real multi-chip mesh the same GSPMD
program rides ICI and the crossover moves to wherever one chip's VMEM/HBM
saturates.  Both regimes are recorded in the artifact.

Usage:
    python scripts/bench_sharded.py [--virtual] [--ticks 20] \
        [--sweep 512,2048,8192,16384] [--out PARALLEL_BENCH.json]
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
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--sweep", type=str, default="512,2048,8192,16384",
                    help="comma-separated K values to sweep")
    ap.add_argument("--out", type=str, default="PARALLEL_BENCH.json")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        # repo-local compile cache (same rationale as tests/conftest.py):
        # the DEFAULT persistent cache holds other machines' XLA:CPU AOT
        # entries and spams a cpu_aot_loader feature-mismatch error per
        # lookup before recompiling anyway
        os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )

    import jax
    import numpy as np

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ["JAX_COMPILATION_CACHE_DIR"],
            )
        except Exception:
            pass  # older jax: the env var above covers it

    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.parallel import make_mesh, shard_planner
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    n = len(jax.devices())

    def bench(tamp):
        state = tamp.env.init_state()
        tp = tamp.tamp_interface(state)
        # warm up / compile
        _, ms, _ = tamp.motion_planner.command(tamp.mppi_state, state, tp)
        jax.block_until_ready(ms)
        # ONE-tick action for the equality check: from identical planner
        # state, so the sharded-vs-unsharded delta is pure reduction-order
        # drift.  (Comparing after the 20-tick timing loop compounded
        # argmax tie-flips through the closed-loop planner state — a
        # near-tied elite flipping once perturbs every later action by
        # O(sample noise), which says nothing about sharding correctness.)
        act1, _, _ = tamp.motion_planner.command(tamp.mppi_state, state, tp)
        act1 = np.asarray(jax.block_until_ready(act1)[0])
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            act, ms, _ = tamp.motion_planner.command(ms, state, tp)
        jax.block_until_ready(act)
        dt = (time.perf_counter() - t0) / args.ticks
        return act1, dt

    rows = []
    crossover_K = None
    for K_req in [int(x) for x in args.sweep.split(",")]:
        K = K_req - K_req % (2 * n)  # even per-mode split per device
        overrides = [
            "task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]",
            f"mppi.num_samples={K}", "mppi.horizon=12",
            "mppi.u_per_command=12",
        ]
        tamp_u = ReactiveTAMP(load_config("config_point", overrides))
        act_u, dt_u = bench(tamp_u)

        tamp_s = ReactiveTAMP(load_config("config_point", overrides))
        shard_planner(tamp_s.motion_planner, make_mesh())
        act_s, dt_s = bench(tamp_s)

        # the sharded weight stage reduces K partial sums in a different
        # (psum-tree) order than the flat unsharded reduction, so the float
        # drift grows with K: 0 at K<=8192, ~2e-4 at K=16384.  Gate at a
        # K-scaled tolerance and RECORD the actual drift in the artifact.
        maxdiff = float(np.max(np.abs(np.asarray(act_u) - np.asarray(act_s))))
        equal = bool(maxdiff <= 1e-4 * max(1.0, K / 2048))
        ratio = dt_s / dt_u
        if crossover_K is None and ratio < 1.0:
            crossover_K = K
        row = {
            "K": K,
            "unsharded_replan_ms": round(dt_u * 1e3, 3),
            "sharded_replan_ms": round(dt_s * 1e3, 3),
            "sharded_over_unsharded": round(ratio, 3),
            "sharded_samples_per_sec_per_device": round(K / dt_s / n, 1),
            "action_equal": equal,
            "action_maxdiff": maxdiff,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if not equal:
            # keep sweeping and write the artifact — a tolerance trip at one
            # K must not discard the whole study
            print("MISMATCH:", act_u, act_s, file=sys.stderr)

    # ---- analytic crossover model (VERDICT r4 #7) ----------------------
    # Single-chip replan time is affine in K: t_u(K) = a + b*K (fit below).
    # On an n-chip mesh each device rolls K/n samples and pays a fixed
    # partitioning cost c_part (shard_map dispatch + the weight stage's
    # all-gather/psum tree):  t_s(K) = c_part + a + b*K/n.
    # Sharding wins when  c_part < b*K*(1 - 1/n), i.e.
    #     K* = c_part / (b * (1 - 1/n)).
    # c_part is estimated from THIS sweep: on a virtual mesh the n
    # "devices" share one core, so total compute is unchanged and
    # t_s - t_u  is the partition cost itself (an upper bound for a real
    # ICI mesh, whose collectives are faster than host-shared-memory
    # emulation).  All model inputs are recorded so the prediction is
    # recomputable.
    Ks = np.asarray([r["K"] for r in rows], dtype=np.float64)
    t_u = np.asarray([r["unsharded_replan_ms"] for r in rows]) * 1e-3
    t_s = np.asarray([r["sharded_replan_ms"] for r in rows]) * 1e-3
    model = None
    if len(rows) >= 2:
        b_fit, a_fit = np.polyfit(Ks, t_u, 1)
        c_part = float(np.median(t_s - t_u))
        if b_fit > 0 and c_part > 0:
            k_star = c_part / (b_fit * (1.0 - 1.0 / max(n, 2)))
            model = {
                "t_unsharded_affine_fit": {"a_s": float(a_fit), "b_s_per_sample": float(b_fit)},
                "c_partition_s": c_part,
                "c_partition_note": (
                    "median(t_sharded - t_unsharded) over the sweep; on a "
                    "virtual mesh this IS the partition cost (no added "
                    "compute capacity) and upper-bounds a real ICI mesh"
                ),
                "mesh_devices": n,
                "predicted_crossover_K_real_mesh": int(round(k_star)),
                "model": "K* = c_part / (b * (1 - 1/n))",
            }

    out = {
        "devices": n,
        "platform": jax.devices()[0].platform,
        "ticks": args.ticks,
        "sweep": rows,
        "crossover_model": model,
        "predicted_crossover_K_real_mesh": (
            model["predicted_crossover_K_real_mesh"] if model else None
        ),
        # K at which sharding first beats unsharded on THIS backend
        # (null = sharding never paid within the sweep)
        "crossover_K": crossover_K,
        "note": (
            "virtual-mesh devices share one physical CPU: the sweep "
            "measures partitioning overhead, not scaling; on a real "
            "multi-chip ICI mesh the per-device rollout capacity is what "
            "moves the crossover"
            if args.virtual or jax.devices()[0].platform == "cpu"
            else "real device mesh"
        ),
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
