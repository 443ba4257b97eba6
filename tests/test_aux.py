"""Aux subsystem tests: dashboard, checkpoint/resume, profiling counters."""
import json
import urllib.request

import jax
import numpy as np
import pytest

from m3p2i_aip_tpu.config.config_store import load_config
from m3p2i_aip_tpu.tamp.sim_loop import SimLoop
from m3p2i_aip_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from m3p2i_aip_tpu.utils.profiling import RateTracker


def test_dashboard_serves_metrics(tmp_path):
    from m3p2i_aip_tpu.analysis.dashboard import Dashboard

    dash = Dashboard(port=0)  # port 0 -> ephemeral
    dash.start()
    port = dash._server.server_address[1]
    dash.publish(planner_hz=123.4, task="push")
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
        data = json.loads(r.read())
    assert data["planner_hz"] == 123.4
    assert data["battery"] == 100.0
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        page = r.read().decode()
    assert "Battery Level" in page and "push" in page
    dash.stop()


def test_checkpoint_roundtrip(tmp_path):
    cfg = load_config(
        "config_point", ["task=push", "goal=[-1,-1]", "mppi.num_samples=32"]
    )
    loop = SimLoop(cfg)
    loop.warmup(5)
    for i in range(3):
        loop.tick(i)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, loop.tamp, loop.state)

    loop2 = SimLoop(load_config("config_point", ["task=push", "goal=[-1,-1]", "mppi.num_samples=32"]))
    loop2.state = load_checkpoint(path, loop2.tamp, loop2.state)

    for a, b in zip(
        jax.tree_util.tree_leaves(loop.state), jax.tree_util.tree_leaves(loop2.state)
    ):
        assert np.allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(loop.tamp.mppi_state),
        jax.tree_util.tree_leaves(loop2.tamp.mppi_state),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert loop2.tamp.task_planner.task == "push"

    # resumed run continues identically for one tick
    loop2._view = loop._view
    a1 = loop.tick(3)
    a2 = loop2.tick(3)
    assert np.allclose(
        np.asarray(loop.state.q), np.asarray(loop2.state.q), atol=1e-6
    )


def test_rate_tracker():
    rt = RateTracker(window=4, env_steps_per_replan=200 * 15)
    import time

    for _ in range(5):
        rt.tick()
        time.sleep(0.01)
    assert 20 < rt.hz < 200
    assert rt.env_steps_per_sec == rt.hz * 3000
    assert "planner_hz" in rt.summary()
