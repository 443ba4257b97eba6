"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the sharded planner (sample axis partitioned over the mesh,
GSPMD-inserted collectives) produces the same actions as the unsharded one.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p2i_aip_tpu.config.config_store import load_config
from m3p2i_aip_tpu.parallel import make_mesh, shard_planner
from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP


def _build(K):
    cfg = load_config(
        "config_point",
        [
            "task=push_pull",
            "multi_modal=True",
            "goal=[-3.75,-3.75]",
            f"mppi.num_samples={K}",
            "mppi.horizon=12",
            "mppi.u_per_command=12",
        ],
    )
    return ReactiveTAMP(cfg)


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_command_matches_unsharded():
    tamp_a = _build(32)
    tamp_b = _build(32)
    shard_planner(tamp_b.motion_planner, make_mesh())

    state = tamp_a.env.init_state()
    act_a = np.asarray(tamp_a.run_tamp(state))
    act_b = np.asarray(tamp_b.run_tamp(state))
    assert np.allclose(act_a, act_b, atol=1e-4), (act_a, act_b)


def test_shard_planner_rejects_indivisible_K():
    tamp = _build(30)
    with pytest.raises(ValueError):
        shard_planner(tamp.motion_planner, make_mesh())


def test_dryrun_multichip_hook():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    """Replicate the driver: a clean subprocess with NO mesh env vars set.

    dryrun_multichip must provision its own virtual 8-device mesh (the
    round-1 driver check failed exactly here: rc=1 'need 8 devices, have 1').
    """
    import os
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout, out.stdout[-2000:]
