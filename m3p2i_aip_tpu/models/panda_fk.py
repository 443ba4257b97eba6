"""Franka Panda forward kinematics in pure JAX (batched, jit/vmap friendly).

Kinematic parameters transcribed from the reference's URDF
(``assets/urdf/franka_description/robots/franka_panda.urdf``): 7 revolute
joints about local z with the classic Franka offsets, a fixed hand joint with
a -45deg twist, and two prismatic finger joints along local +/-y of the hand.

The velocity-drive articulated dynamics of the reference (PhysX, damping 600 —
isaacgym_wrapper.py:341-344) reduce to first-order joint-velocity tracking +
FK for the link states, which is what :mod:`m3p2i_aip_tpu.models.panda_env`
builds on (SURVEY.md §7.10).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from m3p2i_aip_tpu.ops import quat as quat_ops

# Per-joint fixed origin: (xyz translation, rpy-roll about x) — all joint
# frames in this URDF only use a roll rotation; joint rotation is about local z.
_JOINT_XYZ = np.array(
    [
        [0.0, 0.0, 0.333],  # joint1
        [0.0, 0.0, 0.0],  # joint2
        [0.0, -0.316, 0.0],  # joint3
        [0.0825, 0.0, 0.0],  # joint4
        [-0.0825, 0.384, 0.0],  # joint5
        [0.0, 0.0, 0.0],  # joint6
        [0.088, 0.0, 0.0],  # joint7
    ],
    dtype=np.float32,
)
_HALF_PI = float(np.pi / 2)
_JOINT_ROLL = np.array(
    [0.0, -_HALF_PI, _HALF_PI, _HALF_PI, -_HALF_PI, _HALF_PI, _HALF_PI],
    dtype=np.float32,
)
HAND_XYZ = np.array([0.0, 0.0, 0.107], dtype=np.float32)
HAND_YAW = float(-np.pi / 4)
FINGER_XYZ = np.array([0.0, 0.0, 0.0584], dtype=np.float32)
# Fingertip reach below the finger-link origin (finger collision mesh length).
FINGERTIP_Z = 0.045

# Joint limits (revolute 7 + fingers), from the URDF <limit> tags.
JOINT_LOWER = np.array(
    [-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973, 0.0, 0.0],
    dtype=np.float32,
)
JOINT_UPPER = np.array(
    [2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973, 0.04, 0.04],
    dtype=np.float32,
)
JOINT_VEL_LIMIT = np.array(
    [2.175, 2.175, 2.175, 2.175, 2.61, 2.61, 2.61, 0.2, 0.2], dtype=np.float32
)


def _quat_about_x(angle):
    half = 0.5 * angle
    return jnp.asarray([np.sin(half), 0.0, 0.0, np.cos(half)], dtype=jnp.float32)


def _quat_about_z_static(angle):
    half = 0.5 * angle
    return jnp.asarray([0.0, 0.0, np.sin(half), np.cos(half)], dtype=jnp.float32)


def fk(
    q: jnp.ndarray, base_pos: jnp.ndarray, base_quat: jnp.ndarray | None = None
):
    """Forward kinematics for joint positions q [..., 9].

    Returns a dict of (pos [..., 3], quat [..., 4]) for 'hand', 'leftfinger',
    'rightfinger', 'ee' (finger midpoint = the reference's
    (leftfinger + rightfinger)/2, cost_functions.py:92-94) and 'fingertip'
    (grasp point between the fingertips), plus all seven link frames.
    """
    batch = q.shape[:-1]
    if base_quat is None:
        base_quat = jnp.broadcast_to(
            jnp.asarray([0.0, 0, 0, 1], dtype=q.dtype), batch + (4,)
        )
    pos = jnp.broadcast_to(jnp.asarray(base_pos, dtype=q.dtype), batch + (3,))
    rot = base_quat

    links = {}
    for j in range(7):
        pos = pos + quat_ops.quat_rotate(rot, jnp.asarray(_JOINT_XYZ[j], dtype=q.dtype))
        if _JOINT_ROLL[j] != 0.0:
            rot = quat_ops.quat_mul(rot, _quat_about_x(_JOINT_ROLL[j]))
        qz = quat_ops.quat_from_yaw(q[..., j])
        rot = quat_ops.quat_mul(rot, qz)
        links[f"link{j+1}"] = (pos, rot)

    hand_pos = pos + quat_ops.quat_rotate(rot, jnp.asarray(HAND_XYZ, dtype=q.dtype))
    hand_rot = quat_ops.quat_mul(rot, _quat_about_z_static(HAND_YAW))
    links["hand"] = (hand_pos, hand_rot)

    f_base = hand_pos + quat_ops.quat_rotate(
        hand_rot, jnp.asarray(FINGER_XYZ, dtype=q.dtype)
    )
    y_axis = quat_ops.quat_rotate(
        hand_rot, jnp.asarray([0.0, 1.0, 0.0], dtype=q.dtype)
    )
    left_pos = f_base + y_axis * q[..., 7:8]
    right_pos = f_base - y_axis * q[..., 8:9]
    links["leftfinger"] = (left_pos, hand_rot)
    links["rightfinger"] = (right_pos, hand_rot)
    links["ee"] = ((left_pos + right_pos) / 2.0, hand_rot)
    z_axis = quat_ops.quat_rotate(
        hand_rot, jnp.asarray([0.0, 0.0, 1.0], dtype=q.dtype)
    )
    links["fingertip"] = (links["ee"][0] + z_axis * FINGERTIP_Z, hand_rot)
    return links
