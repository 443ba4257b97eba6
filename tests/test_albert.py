"""Albert mobile-manipulation scene: end-to-end ee_reach smoke test.

The reference ships only the albert asset (assets/urdf/albert/albert.urdf);
this scene (config_albert) makes it runnable: the differential-drive base and
the 7-DOF arm must move together so the end effector reaches a 3D goal that
is out of arm-only range from the start pose.
"""
import jax
import numpy as np
import pytest

from m3p2i_aip_tpu.config.config_store import load_config
from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP


def test_albert_env_builds():
    cfg = load_config("config_albert")
    tamp = ReactiveTAMP(cfg)
    assert tamp.env.nu == 13 and tamp.env.nx == 24
    state = tamp.env.init_state()
    v = tamp.env.view(state)
    assert np.all(np.isfinite(v["ee_pos"]))
    # dof-state roundtrip (RPC wire format)
    dof = tamp.env.dof_state_view(state)
    s2 = tamp.env.load_dof_state(state, dof)
    assert np.allclose(np.asarray(s2.q), np.asarray(state.q))


@pytest.mark.slow
def test_albert_ee_reach_end_to_end():
    cfg = load_config("config_albert", ["mppi.num_samples=128"])
    tamp = ReactiveTAMP(cfg)
    state = tamp.env.init_state()
    goal = np.asarray(cfg.goal)
    d0 = np.linalg.norm(tamp.env.view(state)["ee_pos"] - goal)
    success_at = None
    for i in range(150):
        action = tamp.run_tamp(state)
        if tamp.task_success:
            success_at = i
            break
        state = tamp.env.step(state, action, tamp.env.zero_ext())
    v = tamp.env.view(state)
    d = np.linalg.norm(v["ee_pos"] - goal)
    assert success_at is not None, f"ee dist {d0:.3f} -> {d:.3f}, no success"
    # base must actually have driven (arm-only can't span 2.8 m)
    assert np.linalg.norm(v["robot_pos"]) > 0.8


def test_albert_box_contact_physics():
    """The albert scene's pushable box (2_box.yaml): driving the base into
    it moves it continuously (no tunneling), friction stops it after
    release, and a base heading AWAY leaves it untouched."""
    import jax.numpy as jnp

    from m3p2i_aip_tpu.models import albert

    cfg = load_config("config_albert")
    tamp = ReactiveTAMP(cfg)
    params = tamp.env.params
    assert params.has_box
    state = tamp.env.init_state()
    box0 = np.asarray(state.box_pos)

    # head-on approach: base placed west of the box, full wheel speed east
    state = state.replace(
        q=state.q.at[0:3].set(jnp.asarray([box0[0] - 1.0, box0[1], 0.0]))
    )
    u_fwd = jnp.zeros(13).at[11].set(12.0).at[12].set(12.0)
    step = jax.jit(lambda s: albert.step(params, s, u_fwd))
    prev_x = box0[0]
    for _ in range(60):
        state = step(state)
        bx = float(state.box_pos[0])
        assert bx - prev_x < 0.2, "box tunneled"
        prev_x = bx
    pushed = float(state.box_pos[0]) - box0[0]
    assert pushed > 0.3, f"box barely moved: {pushed:.3f}"
    assert abs(float(state.box_pos[1]) - box0[1]) < 0.3  # head-on push

    # ground friction: box comes to rest after the base stops
    u0 = jnp.zeros(13)
    step0 = jax.jit(lambda s: albert.step(params, s, u0))
    for _ in range(40):
        state = step0(state)
    assert np.linalg.norm(np.asarray(state.box_vel)) < 1e-2

    # no spooky action: driving away never moves the box
    state2 = tamp.env.init_state().replace(
        q=tamp.env.init_state().q.at[0:3].set(jnp.asarray([-2.0, 2.0, np.pi]))
    )
    for _ in range(40):
        state2 = step(state2)
    assert np.allclose(np.asarray(state2.box_pos), box0, atol=1e-6)


def test_albert_push_reach_no_parking_fixed_point():
    """Cost-surface regression for the r4 push_reach parking deadlock.

    Measured (r4d diag, seed 5): the base approached to d_rb=0.81 — exactly
    where the hover target first comes into arm reach — and parked forever;
    with the hover at a flat weight 5, the hover spread cancelled the 3/m
    approach gradient, so the cost surface itself preferred the parked pose.
    The fix (approach shaping outside the contact envelope + a
    contact-gated hover weight that stays LOW during the approach) must
    make the closer pose strictly cheaper in that regime: box at the
    observed parking distance, arm rigid while the base advances."""
    import jax.numpy as jnp

    from m3p2i_aip_tpu.models import albert
    from m3p2i_aip_tpu.planners.motion_planner.mppi import make_task_params

    cfg = load_config("config_albert", ["task=push_reach"])
    tamp = ReactiveTAMP(cfg)
    state = tamp.env.init_state()

    # parked pose: base at the origin; box at the observed parking distance
    # (0.85, OUTSIDE the 0.55-0.63 contact envelope) along the EE bearing,
    # hover height at the current EE so the arm is as comfortable as it
    # ever gets at this pose
    far = state.replace(q=state.q.at[0:3].set(jnp.asarray([0.0, 0.0, 0.0])))
    ee_far, _ = albert.fk(far)["ee"]
    ee_dir = ee_far[:2] / jnp.linalg.norm(ee_far[:2])
    box = 0.85 * ee_dir
    far = far.replace(box_pos=box)
    # goal on the base->box line beyond the box: alignment and d_bg terms
    # identical between the two poses
    goal_xy = box + 1.5 * ee_dir
    task = make_task_params(
        "push_reach", [float(goal_xy[0]), float(goal_xy[1]), float(ee_far[2])]
    )

    # advanced pose: base 0.2 m toward the box, arm unchanged
    close = far.replace(q=far.q.at[0:2].set(0.2 * ee_dir), box_pos=box)

    u = jnp.zeros(13)
    c_far, _ = tamp.objective.compute(far, u, task, 0)
    c_close, _ = tamp.objective.compute(close, u, task, 0)
    assert float(c_close) < float(c_far), (
        f"parking fixed point: cost prefers the parked pose "
        f"({float(c_far):.3f} <= {float(c_close):.3f})"
    )


def test_albert_reposition_avoids_box():
    """Cost regression for the r4 reposition plow: the bare nav cost let
    the 0.35 m base drive straight through the box on its way to the
    standoff (r4d diag: every reposition leg moved the box AWAY from the
    goal).  A pose in contact with the box must now cost decisively more
    than a clear pose at the same nav distance from the standoff goal."""
    import jax.numpy as jnp

    from m3p2i_aip_tpu.planners.motion_planner.mppi import make_task_params

    cfg = load_config("config_albert", ["task=push_reach"])
    tamp = ReactiveTAMP(cfg)
    state = tamp.env.init_state()
    box = jnp.asarray([1.2, 0.0])
    standoff = jnp.asarray([2.0, 0.0])  # behind the box for a -x push
    task = make_task_params("reposition", [2.0, 0.0])

    # both poses 1.0 m from the standoff goal; one ON the box, one clear
    plow = state.replace(
        q=state.q.at[0:2].set(jnp.asarray([1.0, 0.0])), box_pos=box
    )
    clear = state.replace(
        q=state.q.at[0:2].set(jnp.asarray([2.0, 1.0])), box_pos=box
    )
    u = jnp.zeros(13)
    c_plow, _ = tamp.objective.compute(plow, u, task, 0)
    c_clear, _ = tamp.objective.compute(clear, u, task, 0)
    assert float(c_plow) > float(c_clear) + 2.0, (
        f"reposition does not avoid the box: plow {float(c_plow):.3f} vs "
        f"clear {float(c_clear):.3f}"
    )


@pytest.mark.slow
def test_albert_push_reach_end_to_end():
    """Mobile manipulation WITH contact: the base pushes the box ~1 m to a
    planar goal while the arm keeps the EE hovering over the moving box —
    wheel and arm channels coupled through the same contact."""
    cfg = load_config(
        "config_albert",
        ["task=push_reach", "goal=[3.0,0.0,0.6]", "mppi.num_samples=128"],
    )
    tamp = ReactiveTAMP(cfg)
    state = tamp.env.init_state()
    box0 = np.asarray(state.box_pos)
    goal = np.asarray(cfg.goal)
    success_at = None
    ee_err = []
    for i in range(500):
        action = tamp.run_tamp(state)
        if tamp.task_success:
            success_at = i
            break
        state = tamp.env.step(state, action, tamp.env.zero_ext())
        v = tamp.env.view(state)
        ee_err.append(
            np.linalg.norm(v["ee_pos"] - np.r_[v["box_pos"], goal[2]])
        )
    v = tamp.env.view(state)
    d = np.linalg.norm(v["box_pos"] - goal[:2])
    assert success_at is not None, (
        f"box {box0} -> {v['box_pos']}, dist {d:.3f}, no success"
    )
    # the arm really tracked the moving box (mean hover error small once
    # the transient settles)
    assert np.mean(ee_err[20:]) < 0.6, np.mean(ee_err[20:])
