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


def workload_panda(K=200, T=12):
    """Attribute the panda fused tick (VERDICT r4 missing #2): device-side
    per-call time of each stage of ReactiveTAMP._run_chunk_panda_impl's tick
    body — AIF gate, rollout kernel, weights+update, gradient refinement,
    real-env step — all measured as scanned chains so dispatch amortizes.

    Stage times are measured INDEPENDENTLY (each stage chained through its
    own carry), so they need not sum exactly to the fused tick: XLA fuses
    across stage boundaries in the real program, and a standalone stage
    pays per-invocation HBM round-trips the fused program doesn't (measured
    ~10x on the rollout kernel: 0.56 ms standalone vs ~0.05 ms marginal
    in-program).  The ranking is what the optimization loop needs; for
    true marginal costs see the refine A/B rows (tick_ms vs
    tick_ms_refine0 vs tick_ms_grad8) — measured as full-program deltas.
    """
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_panda",
        [
            "multi_modal=True",
            f"mppi.num_samples={K}", f"mppi.horizon={T}",
        ],
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    env = tamp.env
    rs0 = env.init_state()
    ms0 = tamp.mppi_state
    zs0 = tamp.zup_zs0()
    task0, _stage, _succ, _zs = jax.jit(tamp._panda_gate_device)(
        rs0, jnp.asarray(0, jnp.int32), zs0
    )
    sK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (K,) + x.shape), rs0
    )
    rng = np.random.default_rng(0)
    acts = jnp.asarray(
        rng.uniform(-1, 1, size=(K, T, env.nu)).astype(np.float32)
    )

    row = {
        "workload": f"panda (K={K} x T={T}, multi-modal)",
        "K": K,
        "T": T,
        "grad_refine_steps": int(cfg.mppi.grad_refine_steps),
    }

    # 1) full tick: gate + replan + real step (the production chunk body)
    def tick_step(carry):
        ms, rs, st, zc = carry
        task, st, _succ, zc = tamp._panda_gate_device(rs, st, zc)
        action_seq, ms, _aux = mp._command_impl(ms, rs, task)
        rs = env.step(rs, action_seq[0], env.zero_ext())
        return (ms, rs, st, zc)

    row["tick_ms"] = round(
        _timeit_scanned(
            tick_step, (ms0, rs0, jnp.asarray(0, jnp.int32), zs0), iters=50
        ) * 1e3, 4,
    )

    # 2) command (rollout + weights + update + refine)
    def cmd_step(carry):
        ms, rs = carry
        action_seq, ms, _aux = mp._command_impl(ms, rs, task0)
        return (ms, rs)

    row["command_ms"] = round(
        _timeit_scanned(cmd_step, (ms0, rs0), iters=50) * 1e3, 4
    )

    # 3) rollout kernel alone (chained through the action tensor)
    ov = mp.rollout_override
    if ov is not None:
        def k_step(a):
            cost, tps = ov(sK, a, task0)
            s = jnp.sum(cost) + jnp.sum(tps)
            return a + s * 1e-30

        row["rollout_kernel_ms"] = round(
            _timeit_scanned(k_step, acts, iters=50) * 1e3, 4
        )

    # 4) weights + distribution update (no refine)
    def upd_step(carry):
        ms, c = carry
        ms = mp._update_halton(ms, c, acts)
        return (ms, c + ms.weights[0] * 1e-30)

    cost_h = jnp.abs(jnp.asarray(
        rng.standard_normal((K, T)).astype(np.float32)
    ))
    row["weights_update_ms"] = round(
        _timeit_scanned(upd_step, (ms0, cost_h), iters=50) * 1e3, 4
    )

    # 5) refinement alone (whichever refinement the config enables; a
    #    zero-step config would just measure scan overhead, so skip then)
    if int(cfg.mppi.grad_refine_steps) > 0 or int(cfg.mppi.refine_iters) > 0:
        def ref_step(ms):
            ms = mp._sample_refine(ms, sK, task0)
            return mp._grad_refine(ms, sK, task0)

        row["refine_standalone_ms"] = round(
            _timeit_scanned(ref_step, ms0, iters=50) * 1e3, 4
        )

    # 6) AIF gate alone
    def gate_step(carry):
        rs, st, zc = carry
        _task, st, _succ, zc = tamp._panda_gate_device(rs, st, zc)
        return (rs, st, zc)

    row["aif_gate_ms"] = round(
        _timeit_scanned(
            gate_step, (rs0, jnp.asarray(0, jnp.int32), zs0), iters=100
        ) * 1e3, 4,
    )

    # 7) real-env step alone
    def env_step(rs):
        return env.step(rs, jnp.zeros(env.nu), env.zero_ext())

    row["env_step_ms"] = round(
        _timeit_scanned(env_step, rs0, iters=100) * 1e3, 4
    )
    row["tick_hz"] = round(1e3 / row["tick_ms"], 1)

    # full-program A/B: the production tick at refine_iters=0 — the delta
    # to tick_ms is the TRUE marginal cost of the refine ladder (standalone
    # stage rows above overstate in-program costs ~10x, see docstring)
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP as _RT

    cfg0 = load_config(
        "config_panda",
        [
            "multi_modal=True",
            f"mppi.num_samples={K}", f"mppi.horizon={T}",
            "mppi.refine_iters=0",
        ],
    )
    tamp0 = _RT(cfg0)

    def tick0_step(carry):
        ms, rs, st, zc = carry
        task, st, _succ, zc = tamp0._panda_gate_device(rs, st, zc)
        action_seq, ms, _aux = tamp0.motion_planner._command_impl(ms, rs, task)
        rs = tamp0.env.step(rs, action_seq[0], tamp0.env.zero_ext())
        return (ms, rs, st, zc)

    row["tick_ms_refine0"] = round(
        _timeit_scanned(
            tick0_step,
            (tamp0.mppi_state, tamp0.env.init_state(),
             jnp.asarray(0, jnp.int32), tamp0.zup_zs0()),
            iters=50,
        ) * 1e3, 4,
    )
    row["refine_marginal_ms"] = round(
        row["tick_ms"] - row["tick_ms_refine0"], 4
    )
    return row


def workload_albert(K=200, T=12):
    """Albert attribution (VERDICT r4 weak #4): device-side per-call time of
    the albert tick stages — the 13-DOF XLA rollout scan (no Pallas kernel;
    this row is the measured basis for whether one is worth writing), the
    weights+update, and the real-env PBD step."""
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_albert",
        [
            "task=push_reach", "goal=[3.0,0.0,0.6]",
            f"mppi.num_samples={K}", f"mppi.horizon={T}",
            f"mppi.u_per_command={T}",
        ],
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    env = tamp.env
    rs0 = env.init_state()
    task0 = tamp.tamp_interface(rs0)
    ms0 = tamp.mppi_state
    sK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (K,) + x.shape), rs0
    )
    rng = np.random.default_rng(0)
    acts = jnp.asarray(
        rng.uniform(-1, 1, size=(K, T, env.nu)).astype(np.float32)
    )

    row = {"workload": f"albert (K={K} x T={T})", "K": K, "T": T}

    def tick_step(carry):
        ms, rs = carry
        _act, ms2, rs2, _v, _t = tamp._tick_fused_impl(
            ms, rs, task0, jnp.asarray(0)
        )
        return (ms2, rs2)

    row["tick_ms"] = round(
        _timeit_scanned(tick_step, (ms0, rs0), iters=50) * 1e3, 4
    )

    ov = mp.rollout_override
    if ov is not None:
        def k_step(a):
            cost, tps = ov(sK, a, task0)
            return a + (jnp.sum(cost) + jnp.sum(tps)) * 1e-30

        row["rollout_kernel_ms"] = round(
            _timeit_scanned(k_step, acts, iters=50) * 1e3, 4
        )

    def roll_step(a):
        mp.rollout_override = None
        cost, tps = mp._rollout(sK, a, task0)
        mp.rollout_override = ov
        s = jnp.sum(cost) + jnp.sum(tps)
        return a + s * 1e-30

    row["xla_rollout_ms"] = round(
        _timeit_scanned(roll_step, acts, iters=50) * 1e3, 4
    )

    def env_step(rs):
        return env.step(rs, jnp.zeros(env.nu), env.zero_ext())

    row["env_step_ms"] = round(
        _timeit_scanned(env_step, rs0, iters=100) * 1e3, 4
    )
    row["tick_hz"] = round(1e3 / row["tick_ms"], 1)
    return row


def _merge_row(row, prefix):
    print(json.dumps(row))
    try:
        with open("UTILIZATION.json") as f:
            out = json.loads(f.read())
    except Exception:
        out = {"platform": jax.devices()[0].platform, "rows": []}
    out["rows"] = [
        r for r in out.get("rows", [])
        if not str(r.get("workload", "")).startswith(prefix)
    ] + [row]
    with open("UTILIZATION.json", "w") as f:
        f.write(json.dumps(out) + "\n")


def main():
    if "albert" in sys.argv[1:]:
        _merge_row(workload_albert(), "albert")
        return
    if "panda" in sys.argv[1:]:
        _merge_row(workload_panda(), "panda")
        return

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
