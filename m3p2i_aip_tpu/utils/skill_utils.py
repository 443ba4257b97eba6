"""Skill-level utilities: suction force model, diff-drive FK/IK, pacing.

JAX port-by-behavior of ``src/m3p2i_aip/utils/skill_utils.py`` (minus the
quaternion/orientation costs which live in :mod:`m3p2i_aip_tpu.ops.quat` and
the bspline which lives in :mod:`m3p2i_aip_tpu.ops.spline`).
"""
from __future__ import annotations

import time

import jax.numpy as jnp


def calculate_suction(
    box_pos: jnp.ndarray,
    robot_pos: jnp.ndarray,
    kp_suction: float,
    threshold: float,
    clamp: float = 500.0,
):
    """Suction pull-force pairs between box and robot.

    Parity: ``skill_utils.calculate_suction:59-94`` — force magnitude
    kp/dist along the box->robot line, gated on 1/dist > threshold
    (1.5 for the real env, 1.8 for rollouts — intentional difference, see the
    comment block at :71-82), clamped to ±500 (:92), equal and opposite on the
    robot (:89-90).

    Args are batched [..., 2].  Returns (force_on_box, force_on_robot).
    """
    dir_vec = box_pos - robot_pos  # [..., 2]
    dist = jnp.linalg.norm(dir_vec, axis=-1, keepdims=True)
    magnitude = 1.0 / jnp.maximum(dist, 1e-6)
    unit_force = dir_vec * magnitude
    mask = (magnitude > threshold).astype(jnp.float32)
    f_box = jnp.clip(-kp_suction * unit_force * mask, -clamp, clamp)
    f_robot = jnp.clip(kp_suction * unit_force * mask, -clamp, clamp)
    return f_box, f_robot


def check_suction_condition(
    task: str,
    suction_active: bool,
    robot_pos: jnp.ndarray,
    box_pos: jnp.ndarray,
    action: jnp.ndarray,
) -> bool:
    """Host-side gate for applying suction in the real-system loop.

    Parity: skill_utils.check_suction_condition:47-56 — requires a pull-family
    task, suction enabled, robot within 0.6 m of the box, and the action
    pointing away from the box (pulling direction).
    """
    if task not in ("pull", "push_pull") or not suction_active:
        return False
    dir_rb = robot_pos - box_pos
    align = float(jnp.sum(action[..., :2] * dir_rb))
    dist = float(jnp.linalg.norm(dir_rb))
    return dist < 0.6 and align > 0


def apply_fk(robot: str, u: jnp.ndarray) -> jnp.ndarray:
    """Wheel speeds from (v, omega) for diff-drive robots.

    Parity: skill_utils.apply_fk:97-115 (r=0.08, L=2*0.157; boxer uses
    channels 0,1; albert channels 11,12).
    """
    r, L = 0.08, 2 * 0.157
    if robot == "boxer":
        left = (u[..., 0] / r) - (L * u[..., 1]) / (2 * r)
        right = (u[..., 0] / r) + (L * u[..., 1]) / (2 * r)
        return u.at[..., 0].set(left).at[..., 1].set(right)
    if robot == "albert":
        left = (u[..., 11] / r) - (L * u[..., 12]) / (2 * r)
        right = (u[..., 11] / r) + (L * u[..., 12]) / (2 * r)
        return u.at[..., 11].set(left).at[..., 12].set(right)
    return u


def apply_ik(robot: str, u: jnp.ndarray) -> jnp.ndarray:
    """Batched variant ([num_envs, dofs]). Parity: skill_utils.apply_ik:118-137.

    (The reference's 'ik' applies the same v,omega -> wheel-speed map.)
    """
    return apply_fk(robot, u)


def time_tracking(t: float, dt: float, verbose: bool = True) -> float:
    """Soft real-time pacing of the interactive loop.

    Parity: skill_utils.time_tracking:25-33 — sleep off surplus budget, print
    achieved FPS and real-time factor.
    """
    actual_dt = time.time() - t
    rt = dt / max(actual_dt, 1e-9)
    if rt > 1.0:
        time.sleep(max(0.0, dt - actual_dt))
        actual_dt = time.time() - t
        rt = dt / max(actual_dt, 1e-9)
    if verbose:
        print("FPS: {:.3f}".format(1 / max(actual_dt, 1e-9)), "RT: {:.3f}".format(rt))
    return time.time()
