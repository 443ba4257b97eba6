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
