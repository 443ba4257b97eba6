"""Offline statistics over logged runs — the reference's plot_* formulas.

Parity: ``plot/plot_point.py:37-45`` (pos error vs goal + general orientation
error vs identity quat) and ``plot/plot_panda.py:23-29`` (cube-vs-goal pose
errors).  Box plots are matplotlib (optional) instead of plotly.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from m3p2i_aip_tpu.ops import general_ori_cube2goal


def _batched_ori_cost(quats: np.ndarray, goals: np.ndarray) -> np.ndarray:
    import jax

    return np.asarray(
        jax.vmap(general_ori_cube2goal)(
            np.asarray(quats, dtype=np.float32), np.asarray(goals, dtype=np.float32)
        )
    )


def point_costs(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(pos_cost, quat_cost) per run. Parity: plot_point.compute_cost:37-45."""
    n = data.shape[0]
    goal_quat = np.tile(np.asarray([0.0, 0, 0, 1]), (n, 1))
    quat_cost = _batched_ori_cost(data[:, 8:12], goal_quat)
    pos_cost = np.linalg.norm(data[:, 5:7] - data[:, 12:14], axis=1)
    return pos_cost, quat_cost


def panda_costs(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(pos_cost, quat_cost) per run. Parity: plot_panda.compute_cost:23-29."""
    quat_cost = _batched_ori_cost(data[:, 4:8], data[:, 11:15])
    pos_cost = np.linalg.norm(data[:, 1:3] - data[:, 8:10], axis=1)
    return pos_cost, quat_cost


def mean_std(x: np.ndarray, label: str = "") -> Tuple[float, float]:
    m, s = float(np.mean(x)), float(np.std(x))
    if label:
        print(label, format(m, ".4f"), "±", format(s, ".4f"))
    return m, s


def summarize(data: np.ndarray, env: str = "point") -> Dict[str, Tuple[float, float]]:
    """mean±std of pos/ori error (+ collisions & task time for point runs)."""
    if env == "point":
        pos, quat = point_costs(data)
        return {
            "pos_error": mean_std(pos),
            "ori_error": mean_std(quat),
            "collisions": mean_std(data[:, 17]),
            "task_time": mean_std(data[:, 18]),
        }
    if env == "albert":
        # 11-col albert schema (run_logger.finalize_albert_row)
        pos = np.linalg.norm(data[:, 1:4] - data[:, 6:9], axis=1)
        return {
            "ee_pos_error": mean_std(pos),
            "success": mean_std(data[:, 9]),
            "task_time": mean_std(data[:, 10]),
        }
    pos, quat = panda_costs(data)
    return {"pos_error": mean_std(pos), "ori_error": mean_std(quat)}


def box_plot(groups: Dict[str, np.ndarray], path: str) -> Optional[str]:
    """Grouped box plot PNG (plotly box-plot parity, plot_point.py:105+)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(1.5 + 1.2 * len(groups), 4))
    ax.boxplot(list(groups.values()), labels=list(groups.keys()))
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path
