"""Headless scene rendering: ASCII viewer + optional matplotlib plots.

Replaces the Isaac Gym viewer surface the reference uses for inspection
(``isaacgym_wrapper.py:374-460``: viewer camera, top-20 trajectory lines,
keyboard teleop feedback).  On a headless TPU host the fast path is an ASCII
top-down view; ``save_trajectory_plot`` writes a PNG when matplotlib is
available (it is optional — gated import).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def render_point_env(
    env,
    state,
    width: int = 41,
    height: int = 21,
    extent: float = 4.2,
    trajs: Optional[np.ndarray] = None,
) -> str:
    """Top-down ASCII view of the point env: R robot, B box, D dyn-obs,
    # statics; ``trajs`` [n, T, 2] overlays planned rollout points as ``.``
    (the terminal analogue of the viewer's top-20 trajectory lines,
    isaacgym_wrapper.py:374-391)."""
    grid = [[" "] * width for _ in range(height)]

    def to_cell(x, y):
        c = int((x + extent) / (2 * extent) * (width - 1))
        r = int((extent - y) / (2 * extent) * (height - 1))
        return min(max(r, 0), height - 1), min(max(c, 0), width - 1)

    if trajs is not None:
        tt = np.asarray(trajs)
        for k in range(tt.shape[0]):
            for t in range(tt.shape[1]):
                r, c = to_cell(tt[k, t, 0], tt[k, t, 1])
                grid[r][c] = "."

    p = env.params
    stat_pos = np.asarray(p.stat_pos)
    stat_half = np.asarray(p.stat_half)
    for i in range(stat_pos.shape[0]):
        hx, hy = stat_half[i]
        for sx in np.linspace(-hx, hx, max(2, int(20 * hx))):
            for sy in np.linspace(-hy, hy, max(2, int(20 * hy))):
                r, c = to_cell(stat_pos[i, 0] + sx, stat_pos[i, 1] + sy)
                grid[r][c] = "#"

    dyn_pos = np.asarray(state.dyn_pos)
    names = list(p.actor_names)
    for slot, actor_i in enumerate(p.dyn_actor_idx):
        ch = "B" if names[actor_i] == "box" else "D"
        r, c = to_cell(dyn_pos[slot, 0], dyn_pos[slot, 1])
        grid[r][c] = ch

    q = np.asarray(state.q)
    r, c = to_cell(q[0], q[1])
    grid[r][c] = "R"

    border = "+" + "-" * width + "+"
    return "\n".join([border] + ["|" + "".join(row) + "|" for row in grid] + [border])


def save_trajectory_plot(
    env,
    log,
    path: str,
    top_trajs: Optional[np.ndarray] = None,
    goal: Optional[np.ndarray] = None,
) -> Optional[str]:
    """Write a PNG of the run: robot path, box path, scene, top-K rollouts.

    Parity: the in-viewer trajectory lines (isaacgym_wrapper.py:374-391) plus
    the offline analysis plots (plot/plot_point.py).  Returns the path, or
    None when matplotlib is unavailable.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None

    fig, ax = plt.subplots(figsize=(6, 6))
    p = env.params
    stat_pos = np.asarray(p.stat_pos)
    stat_half = np.asarray(p.stat_half)
    for i in range(stat_pos.shape[0]):
        ax.add_patch(
            plt.Rectangle(
                stat_pos[i] - stat_half[i],
                2 * stat_half[i, 0],
                2 * stat_half[i, 1],
                color="0.3",
            )
        )
    if log.robot_pos:
        rp = np.asarray(log.robot_pos)
        ax.plot(rp[:, 0], rp[:, 1], "b-", label="robot")
    if log.box_pos:
        bp = np.asarray(log.box_pos)
        ax.plot(bp[:, 0], bp[:, 1], "r-", label="box")
    if top_trajs is not None:
        tt = np.asarray(top_trajs)
        for k in range(tt.shape[0]):
            ax.plot(tt[k, :, 0], tt[k, :, 1], "g-", alpha=0.2, lw=0.5)
    if goal is not None:
        ax.plot(goal[0], goal[1], "g*", markersize=15, label="goal")
    ax.set_xlim(-4.5, 4.5)
    ax.set_ylim(-4.5, 4.5)
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path
