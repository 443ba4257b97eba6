#!/usr/bin/env python3
"""Utilization / roofline evidence for the hot path (VERDICT r3 #4).

Quantifies, for the reference workload (point env, K=200 x T=15,
multi-modal) and the north-star workload (K=500 x T=30):

  * FLOPs and HBM bytes per replan, from XLA's own cost model of the
    (numerically identical) XLA rollout program;
  * measured wall time of the fused Pallas rollout kernel and the full
    fused tick on the attached device;
  * achieved FLOP/s against the v5e compute roofs and achieved bytes/s
    against the HBM roof — i.e. WHY the workload is latency-bound
    (both utilizations are tiny: the kernel's value is killing the
    per-op dispatch/HBM-roundtrip latency of hundreds of small fusions,
    not feeding the MXU);
  * the resulting theoretical floors: compute floor (flops/roof),
    memory floor (bytes/roof), and the measured tick vs them.

v5e peaks (public: jax-ml.github.io/scaling-book, TPU v5e):
  MXU bf16: 197e12 FLOP/s   (the rollout is f32 VPU work, so this roof
                             is unreachable by construction)
  VPU f32:  ~3.9e12 op/s    (8 sublanes x 128 lanes x 4 ALUs @ ~960 MHz;
                             FMA would double it — we count 1 op/flop)
  HBM:      8.1e11 B/s

Writes UTILIZATION.json and prints a markdown table for RESULTS.md.
Run on the TPU:  python scripts/analyze_utilization.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_MXU_BF16 = 197e12
V5E_VPU_F32 = 3.9e12
V5E_HBM_BPS = 8.1e11


def _cost_of(fn, *args):
    """(flops, bytes_accessed) from XLA's compiled cost analysis."""
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):  # older jax returns [dict]
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def _timeit(fn, *args, iters=50):
    import jax as _jax

    _jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def _timeit_scanned(step, carry0, iters=100):
    """DEVICE-SIDE per-call time: ``iters`` calls chained through a carry in
    ONE ``lax.scan`` under ONE jit — a single dispatch, so the remote-tunnel
    RTT amortizes to ~nothing and host-loop jitter cannot invert the
    small-vs-large workload ordering (which it did for per-call timing:
    dispatch latency >> device time for every workload here).

    ``step(carry) -> carry`` must thread a data dependency through the call
    so XLA cannot hoist or collapse the chain."""
    from jax import lax

    def body(c, _):
        return step(c), None

    run = jax.jit(lambda c: lax.scan(body, c, None, length=iters)[0])
    jax.block_until_ready(run(carry0))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(carry0))
    return (time.perf_counter() - t0) / iters


def workload(K, T, label):
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_point",
        [
            "task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]",
            f"mppi.num_samples={K}", f"mppi.horizon={T}",
            f"mppi.u_per_command={T}",
        ],
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    state = tamp.env.init_state()
    tp = tamp.tamp_interface(state)
    sK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (K,) + x.shape), state
    )
    rng = np.random.default_rng(0)
    acts = jnp.asarray(
        rng.uniform(-3, 3, size=(K, T, tamp.env.nu)).astype(np.float32)
    )

    # XLA cost model of the numerically-identical XLA rollout: the kernel
    # runs the same math, so these are the kernel's flops/bytes too (the
    # kernel's HBM traffic is STRICTLY LESS: inputs+outputs only, all
    # intermediates stay in VMEM)
    ov = mp.rollout_override
    mp.rollout_override = None
    flops, bytes_x = _cost_of(lambda s, a: mp._rollout(s, a, tp), sK, acts)
    mp.rollout_override = ov

    row = {
        "workload": label,
        "K": K,
        "T": T,
        "rollout_flops": flops,
        "xla_rollout_bytes": bytes_x,
    }
    # kernel's true HBM traffic: operands + results of the pallas_call
    Kp = ((K + 127) // 128) * 128
    n_rows = 2 * 2 + 6 * len(np.asarray(tamp.env.params.dyn_inv_mass))
    kernel_bytes = 4 * (
        4 + T * tamp.env.nu * Kp + n_rows * Kp + 3 * T * Kp
    )
    row["kernel_hbm_bytes"] = kernel_bytes

    if ov is not None:
        t_disp = _timeit(
            jax.jit(lambda s, a: ov(s, a, tp)), sK, acts
        )
        row["kernel_ms_incl_dispatch"] = round(t_disp * 1e3, 4)

        # device-side: chain the kernel through the action tensor so every
        # scan iteration depends on the last (1e-30 * cost-sum is exact 0 in
        # f32 here, but XLA cannot know that)
        def k_step(a):
            out = ov(sK, a, tp)
            s = sum(
                jnp.sum(o).astype(jnp.float32)
                for o in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(o.dtype, jnp.floating)
            )
            return a + s * 1e-30

        t_kernel = _timeit_scanned(k_step, acts)
        row["kernel_ms"] = round(t_kernel * 1e3, 4)
        row["kernel_flops_per_s"] = flops / t_kernel
        row["kernel_pct_vpu_f32"] = round(100 * flops / t_kernel / V5E_VPU_F32, 2)
        row["kernel_pct_mxu_bf16"] = round(
            100 * flops / t_kernel / V5E_MXU_BF16, 3
        )
        row["kernel_hbm_pct"] = round(
            100 * kernel_bytes / t_kernel / V5E_HBM_BPS, 3
        )
    # the full fused tick (replan + suction + real step + view packing)
    task = tp
    i0 = jnp.asarray(0)
    ms0 = tamp.mppi_state

    def tick(ms, rs):
        return tamp._tick_fused_impl(ms, rs, task, i0)

    t_tick_disp = _timeit(jax.jit(tick), ms0, state)
    row["fused_tick_ms_incl_dispatch"] = round(t_tick_disp * 1e3, 4)

    # device-side tick: the natural carry is (planner state, env state) —
    # exactly how run_chunked scans ticks in production
    def t_step(carry):
        ms, rs = carry
        _act, ms2, rs2, _view, _trajs = tamp._tick_fused_impl(
            ms, rs, task, i0
        )
        return (ms2, rs2)

    t_tick = _timeit_scanned(t_step, (ms0, state))
    row["fused_tick_ms"] = round(t_tick * 1e3, 4)
    # floors
    row["compute_floor_us"] = round(flops / V5E_VPU_F32 * 1e6, 2)
    row["memory_floor_us"] = round(kernel_bytes / V5E_HBM_BPS * 1e6, 3)
    return row


def main():
    rows = [
        workload(200, 15, "reference (K=200 x T=15)"),
        workload(500, 30, "north-star (K=500 x T=30)"),
    ]
    out = {
        "platform": jax.devices()[0].platform,
        "peaks": {
            "mxu_bf16_flops": V5E_MXU_BF16,
            "vpu_f32_ops": V5E_VPU_F32,
            "hbm_bytes_per_s": V5E_HBM_BPS,
        },
        "rows": rows,
    }
    print(json.dumps(out))
    with open("UTILIZATION.json", "w") as f:
        f.write(json.dumps(out) + "\n")

    # markdown table for RESULTS.md (device-side times from the scanned
    # chain; the incl-dispatch columns show what one host round trip adds)
    print("\n| workload | rollout GFLOP | kernel ms (device / +dispatch) | "
          "% VPU f32 | % HBM BW | compute floor | memory floor | "
          "fused tick ms (device / +dispatch) |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['workload']} | {r['rollout_flops']/1e9:.3f} | "
            f"{r.get('kernel_ms','-')} / "
            f"{r.get('kernel_ms_incl_dispatch','-')} | "
            f"{r.get('kernel_pct_vpu_f32','-')} | "
            f"{r.get('kernel_hbm_pct','-')} | {r['compute_floor_us']} us | "
            f"{r['memory_floor_us']} us | {r['fused_tick_ms']} / "
            f"{r['fused_tick_ms_incl_dispatch']} |"
        )


if __name__ == "__main__":
    main()
