"""Serialization, RPC, rendering, and analysis-stat tests."""
import threading

import numpy as np
import pytest

from m3p2i_aip_tpu.utils import rpc
from m3p2i_aip_tpu.utils.data_transfer import (
    array_to_bytes,
    bytes_to_array,
    bytes_to_numpy,
)


def test_array_roundtrip():
    x = np.random.randn(4, 13).astype(np.float32)
    assert np.array_equal(bytes_to_numpy(array_to_bytes(x)), x)
    y = bytes_to_array(array_to_bytes(x))
    assert np.allclose(np.asarray(y), x)


class _Service:
    def echo(self, a):
        return a * 2.0

    def get_flag(self):
        return 7


def test_rpc_roundtrip():
    server = rpc.Server(
        _Service(), "127.0.0.1", 0, allowed_methods=("echo", "get_flag")
    )
    port = server._sock.getsockname()[1]

    t = threading.Thread(target=server.run, daemon=True)
    t.start()

    client = rpc.Client().connect("127.0.0.1", port)
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    out = client.call("echo", x)
    assert np.allclose(out, x * 2)
    assert client.get_flag() == 7
    # dispatch is allowlisted: arbitrary attribute access must be rejected
    try:
        client.call("__init__")
        assert False, "disallowed method was dispatched"
    except RuntimeError as e:
        assert "not allowed" in str(e)
    # the connection stays usable after a rejected call
    assert np.allclose(client.call("echo", x), x * 2)
    client.close()
    server.close()


def test_point_stats_schema():
    from m3p2i_aip_tpu.analysis import point_costs, summarize

    n = 5
    data = np.zeros((n, 19))
    data[:, 5:7] = [[1.0, 1.0]] * n  # block pos
    data[:, 8:12] = [0, 0, 0, 1]  # block quat = identity
    data[:, 12:14] = [[1.0, 1.3]] * n  # goal
    pos, quat = point_costs(data)
    assert np.allclose(pos, 0.3, atol=1e-6)
    assert np.allclose(quat, 0.0, atol=1e-5)
    s = summarize(data, "point")
    assert abs(s["pos_error"][0] - 0.3) < 1e-6


def test_render_ascii():
    import jax

    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.envs import make_env
    from m3p2i_aip_tpu.utils.render import render_point_env

    env = make_env(load_config("config_point"))
    s = env.init_state()
    out = render_point_env(env, s)
    assert "R" in out and "B" in out and "#" in out


def test_two_terminal_tamp_roundtrip():
    """The reference's two-process workflow over the TCP compat layer:
    planner server (ReactiveTAMPServer) + sim client exchanging dof/root
    tensors per tick (reactive_tamp.py:92-94 / sim.py:29-49 surface)."""
    import jax
    import jax.numpy as jnp

    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.envs import make_env
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMPServer

    cfg = load_config(
        "config_point", ["task=navigation", "goal=[-3,3]", "mppi.num_samples=32"]
    )
    server = rpc.Server(ReactiveTAMPServer(cfg), "127.0.0.1", 0)
    port = server._sock.getsockname()[1]
    t = threading.Thread(target=server.run, daemon=True)
    t.start()

    env = make_env(cfg)
    step = jax.jit(env.step)
    state = env.init_state()
    client = rpc.Client().connect("127.0.0.1", port)
    for i in range(3):
        action = client.run_tamp(
            np.asarray(env.dof_state_view(state)),
            np.asarray(env.root_state_view(state)),
        )
        assert action.shape == (env.nu,) and np.isfinite(action).all()
        assert isinstance(client.get_suction(), int)
        state = step(state, jnp.asarray(action), env.zero_ext())
    trajs = client.get_trajs()
    assert trajs.ndim == 3  # [20, T, 2]
    client.close()
    server.close()
def test_teleop_inert_off_tty_and_render_overlay():
    """KeyboardTeleop degrades to a no-op when stdin is not a tty (CI), and
    the ASCII renderer overlays planned trajectories as '.' marks."""
    import jax

    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.envs import make_env
    from m3p2i_aip_tpu.utils.render import render_point_env
    from m3p2i_aip_tpu.utils.teleop import SHOVE_KEYS, KeyboardTeleop

    with KeyboardTeleop() as keys:
        assert keys.poll() == []  # pytest's stdin is not a tty
    with KeyboardTeleop(enabled=False) as keys:
        assert not keys.active and keys.poll() == []
    assert set(SHOVE_KEYS) == {"i", "j", "k", "l"}

    env = make_env(load_config("config_point"))
    s = env.init_state()
    trajs = np.zeros((3, 5, 2), dtype=np.float32)
    trajs[:, :, 0] = np.linspace(-2.0, 2.0, 5)[None, :]
    trajs[:, :, 1] = 2.5
    out = render_point_env(env, s, trajs=trajs)
    assert "." in out and "R" in out


def test_interactive_run_ci_safe():
    """SimLoop.run(interactive=True) must behave exactly like a plain run
    when no tty is attached (the teleop reader is inert)."""
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.sim_loop import SimLoop

    cfg = load_config(
        "config_point", ["task=navigation", "goal=[-3,3]", "mppi.num_samples=32"]
    )
    loop = SimLoop(cfg)
    loop.warmup(5)
    log = loop.run(n_steps=5, interactive=True)
    assert log.steps == 5


def test_save_frames_renders_gif(tmp_path):
    """Offline viewer frames (utils/render.save_frames): a tiny synthetic
    TickLog renders to per-tick PNGs and an animated GIF."""
    import numpy as np

    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.envs import make_env
    from m3p2i_aip_tpu.tamp.sim_loop import TickLog
    from m3p2i_aip_tpu.utils.render import save_frames

    env = make_env(load_config("config_point"))
    log = TickLog()
    for t in range(8):
        log.robot_pos.append(np.asarray([0.1 * t, 0.0]))
        log.box_pos.append(np.asarray([0.1 * t + 0.5, 0.2]))
    out = save_frames(env, log, str(tmp_path), every=2, goal=np.asarray([1.0, 1.0]))
    assert out is not None
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "frame_00000.png"))
