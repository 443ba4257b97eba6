"""Albert mobile manipulator: boxer differential-drive base + Panda arm.

Parity target: ``assets/urdf/albert/albert.urdf`` (13 DOF: 2 castors,
2 drive wheels, 7 arm joints, 2 fingers) and the reference's control-channel
convention where the wheel speeds live at u[11], u[12]
(``skill_utils.apply_fk:97-115``, albert branch).  The reference ships the
asset and the FK/IK mapping but no albert task config; this model provides
the same surface: a steppable velocity-drive dynamics + full-arm FK, usable
with the planar arena scenes.

Control layout (matching apply_fk's channel convention):
  u[0:2]   castor joints (free-spinning, ignored)
  u[2:9]   panda arm joint velocity targets
  u[9:11]  finger velocity targets
  u[11:13] wheel speeds (left, right)

State q: [x, y, yaw, arm(7), fingers(2)] = 12.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from m3p2i_aip_tpu.models import panda_fk

WHEEL_RADIUS = 0.08  # skill_utils.apply_fk r
WHEEL_BASE = 2 * 0.157  # skill_utils.apply_fk L
ARM_MOUNT = np.array([0.0, 0.0, 0.4], dtype=np.float32)  # arm base on the torso


@struct.dataclass
class AlbertState:
    q: jnp.ndarray  # [12] base pose (3) + arm (7) + fingers (2)
    qd: jnp.ndarray  # [12]


@struct.dataclass
class AlbertParams:
    init_q: jnp.ndarray = struct.field(
        default=None
    )  # [12] base pose (3) + arm (7) + fingers (2)
    dt: float = struct.field(pytree_node=False, default=0.05)
    substeps: int = struct.field(pytree_node=False, default=2)
    drive_rate: float = struct.field(pytree_node=False, default=60.0)
    actor_names: tuple = struct.field(pytree_node=False, default=("albert",))


_REST_ARM = np.asarray([0, 0, 0, -2, 0, 1.8675, 0, 0.02, 0.02], np.float32)


def build_params(actors, sim_cfg) -> AlbertParams:
    """Scene params from the albert_env actor YAMLs (ActorCfg schema)."""
    init_q = np.zeros(12, dtype=np.float32)
    init_q[3:12] = _REST_ARM
    names = []
    for a in actors:
        names.append(a.name)
        if a.type == "robot":
            init_q[0:2] = np.asarray(a.init_pos[:2], np.float32)
            if a.init_joint_pose:
                # interleaved (pos, vel) 24-vector, like the panda convention
                init_q = np.asarray(a.init_joint_pose, np.float32)[0::2]
    return AlbertParams(
        init_q=jnp.asarray(init_q),
        dt=sim_cfg.dt,
        substeps=sim_cfg.substeps,
        actor_names=tuple(names),
    )


def init_state(params: AlbertParams = None) -> AlbertState:
    if params is not None and params.init_q is not None:
        return AlbertState(q=params.init_q, qd=jnp.zeros(12))
    q = jnp.zeros(12)
    # reference panda rest pose for the arm portion
    q = q.at[3:12].set(jnp.asarray(_REST_ARM))
    return AlbertState(q=q, qd=jnp.zeros(12))


def step(params: AlbertParams, state: AlbertState, u: jnp.ndarray) -> AlbertState:
    """Velocity-drive kinematic step for the 13-channel control vector."""
    h = params.dt / params.substeps
    decay = float(np.exp(-params.drive_rate * params.dt / params.substeps))
    q, qd = state.q, state.qd

    arm_lower = jnp.asarray(panda_fk.JOINT_LOWER)
    arm_upper = jnp.asarray(panda_fk.JOINT_UPPER)

    for _ in range(params.substeps):
        v = WHEEL_RADIUS * (u[11] + u[12]) / 2.0
        om = WHEEL_RADIUS * (u[12] - u[11]) / WHEEL_BASE
        th = q[2]
        base_target = jnp.stack([v * jnp.cos(th), v * jnp.sin(th), om])
        arm_target = u[2:11]
        qd_target = jnp.concatenate([base_target, arm_target])
        qd = qd_target + (qd - qd_target) * decay
        q = q + qd * h
        q = q.at[3:12].set(jnp.clip(q[3:12], arm_lower, arm_upper))
    return state.replace(q=q, qd=qd)


def dof_state_view(state: AlbertState) -> jnp.ndarray:
    """Interleaved [q0, qd0, ...] — 24 floats (panda convention)."""
    return jnp.stack([state.q, state.qd], axis=-1).reshape(
        state.q.shape[:-1] + (24,)
    )


def load_dof_state(state: AlbertState, dof: jnp.ndarray) -> AlbertState:
    pairs = dof.reshape(dof.shape[:-1] + (12, 2))
    return state.replace(q=pairs[..., 0], qd=pairs[..., 1])


def fk(state: AlbertState):
    """Arm link poses in the world frame (base pose composed in).

    Returns the same link dict as :func:`panda_fk.fk` (positions [3] +
    rotation matrices [3, 3]).
    """
    th = state.q[2]
    c, s = jnp.cos(th), jnp.sin(th)
    base_rot = jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    base_pos = jnp.concatenate([state.q[:2], jnp.zeros(1)]) + base_rot @ jnp.asarray(
        ARM_MOUNT
    )
    return panda_fk.fk(state.q[3:12], base_pos, base_rot=base_rot)
