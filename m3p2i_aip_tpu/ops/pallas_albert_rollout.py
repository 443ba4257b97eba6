"""Fused Pallas TPU rollout kernel for the ALBERT env (K samples on lanes).

Completes the kernel story for the mobile manipulator: the whole
K x T x substeps rollout — diff-drive base, 9-channel arm velocity drive,
planar PBD base-vs-box contact, base-composed 7-joint matrix FK, and the
ee_reach / push_reach / reposition / navigation costs — runs as ONE Pallas
kernel with all state resident in vector registers / VMEM.

Motivation (round 5, UTILIZATION.json albert row + ALBERT_BENCH.json): the
annealed resample refinement re-runs the rollout refine_iters times per
tick; on the XLA path each refine iteration costs ~0.55 ms vs the panda
kernel's ~0.04 ms, so the kernel buys ~3x on the refined albert tick.

Parity targets (enforced by the interpret-mode test in tests/test_pallas.py):
  * models/albert.py step() + fk()      — physics + kinematics
  * planners/motion_planner/cost_functions.py AlbertObjective — costs
Reference-of-reference: the reference ships only the albert asset
(assets/urdf/albert/albert.urdf) — there is no upstream albert task; this
kernel accelerates this framework's own extension envs.

Layout mirrors ops/pallas_panda_rollout.py: per-sample scalars are [1, Kp]
lane rows; the FK chain composes on sublane-packed [3, Kp] blocks with the
base yaw entering as a lane-valued initial rotation (the panda kernel's
constant-base chain generalized).  Planar contact math is imported from
ops/pallas_rollout.py (the point/boxer kernel) — same lane-wise
circle-vs-OBB + Jacobi projection the point family parity-tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None

from m3p2i_aip_tpu.models import panda_fk
from m3p2i_aip_tpu.models.albert import ARM_MOUNT, WHEEL_BASE, WHEEL_RADIUS
from m3p2i_aip_tpu.ops.pallas_kernels import pallas_available
from m3p2i_aip_tpu.ops.pallas_rollout import _circle_vs_obb, _resolve

GRAVITY = 9.8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_N_ROWS = 30  # q(12) + qd(12) + box pos(2) yaw(1) vel(2) om(1)


def _albert_kernel(
    task_ref,   # SMEM [5]: task_id, goal_x, goal_y, goal_z, k0 (unused)
    acts_ref,   # VMEM [T, 13, Kp] (pre-scaled)
    state_ref,  # VMEM [30, Kp]
    cost_ref,   # VMEM out [T, Kp]
    trajx_ref,  # VMEM out [T, Kp]
    trajy_ref,  # VMEM out [T, Kp]
    *,
    P,
):
    Kp = state_ref.shape[1]
    h = P["dt"] / P["substeps"]
    decay = P["decay"]

    task_id = task_ref[0]
    gx, gy, gz = task_ref[1], task_ref[2], task_ref[3]

    def row(i):
        return state_ref[i : i + 1, :]

    q = [row(i) for i in range(12)]
    qd = [row(12 + i) for i in range(12)]
    bx, by = row(24), row(25)
    byaw = row(26)
    bvx, bvy = row(27), row(28)
    bom = row(29)

    n_flat = _N_ROWS

    def flatten(q, qd, bx, by, byaw, bvx, bvy, bom):
        return tuple(q) + tuple(qd) + (bx, by, byaw, bvx, bvy, bom)

    def unflatten(f):
        return (
            list(f[0:12]), list(f[12:24]),
            f[24], f[25], f[26], f[27], f[28], f[29],
        )

    arm_lo = [float(v) for v in panda_fk.JOINT_LOWER]
    arm_hi = [float(v) for v in panda_fk.JOINT_UPPER]
    joint_xyz = [[float(x) for x in r] for r in panda_fk._JOINT_XYZ]
    roll_mats = [
        None if m is None else [[float(x) for x in r] for r in m]
        for m in panda_fk._ROLL_MATS
    ]
    hand_mat = [[float(x) for x in r] for r in panda_fk._HAND_MAT]
    hand_xyz = [float(x) for x in panda_fk.HAND_XYZ]
    finger_xyz = [float(x) for x in panda_fk.FINGER_XYZ]
    mount_z = float(ARM_MOUNT[2])  # ARM_MOUNT xy are zero

    def _oh3(i):
        r = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
        return (r == i).astype(jnp.float32)

    def _cols_mul_const(C, M):
        """Packed-column rot @ const 3x3 with trace-time zero/one folding
        (pallas_panda_rollout._cols_mul_const, inlined for lane columns)."""
        out = []
        for k in range(3):
            acc = None
            for i in range(3):
                m = M[i][k]
                if m == 0.0:
                    continue
                t = C[i] if m == 1.0 else (-C[i] if m == -1.0 else C[i] * m)
                acc = t if acc is None else acc + t
            out.append(0.0 if acc is None else acc)
        return out

    oh0, oh1, oh2 = _oh3(0), _oh3(1), _oh3(2)

    def fk_ee(q, qyaw_c, qyaw_s):
        """EE position, base-composed (albert.fk -> panda_fk.fk parity).

        Arm joints are q[3..11]; the chain starts at the LANE-VALUED base
        frame: pos = [qx, qy, mount_z], rot = Rz(base yaw).  Same
        sublane-packed [3, Kp] composition as the panda kernel's fk.
        """
        one = 1.0 + 0.0 * q[0]
        pos = oh0 * q[0] + oh1 * q[1] + oh2 * (mount_z * one)
        # Rz(yaw) columns: [c, s, 0], [-s, c, 0], [0, 0, 1]
        C = [
            oh0 * qyaw_c + oh1 * qyaw_s,
            -oh0 * qyaw_s + oh1 * qyaw_c,
            oh2 * one,
        ]
        for j in range(7):
            off = joint_xyz[j]
            for i in range(3):
                if off[i] != 0.0:
                    pos = pos + C[i] * off[i]
            if roll_mats[j] is not None:
                C = _cols_mul_const(C, roll_mats[j])
            c_, s_ = jnp.cos(q[3 + j]), jnp.sin(q[3 + j])
            C = [C[0] * c_ + C[1] * s_, C[1] * c_ - C[0] * s_, C[2]]
        hand_pos = pos
        for i in range(3):
            if hand_xyz[i] != 0.0:
                hand_pos = hand_pos + C[i] * hand_xyz[i]
        CH = _cols_mul_const(C, hand_mat)
        f_base = hand_pos
        for i in range(3):
            if finger_xyz[i] != 0.0:
                f_base = f_base + CH[i] * finger_xyz[i]
        # ee = midpoint of the finger links offset +-q along hand y
        ee = f_base + CH[1] * ((q[10] - q[11]) * 0.5)
        if P["interpret"]:
            # XLA:CPU fusion bomb guard (see pallas_panda_rollout)
            ee = jax.lax.optimization_barrier(ee)
        return [ee[0:1, :], ee[1:2, :], ee[2:3, :]]

    wm_base = 1.0 / P["base_mass"]
    rr = P["base_radius"]
    has_box = P["has_box"]
    if has_box:
        hx, hy = P["box_half"][0], P["box_half"][1]
        mu_g = (P["box_friction"] + 1.0) * 0.5
        ang_rad = 0.5 * (hx + hy)
        c_fric = (0.05 + P["box_friction"]) / 2.0
        wm_box = P["box_inv_mass"]
        wi_box = P["box_inv_inertia"]

    def t_body(t, carry):
        q, qd, bx, by, byaw, bvx, bvy, bom = unflatten(carry)
        u = [acts_ref[t, c : c + 1, :] for c in range(13)]

        for _ in range(P["substeps"]):
            # diff-drive base + arm velocity drive (albert.step parity)
            v = WHEEL_RADIUS * (u[11] + u[12]) * 0.5
            om = WHEEL_RADIUS * (u[12] - u[11]) / WHEEL_BASE
            cth, sth = jnp.cos(q[2]), jnp.sin(q[2])
            targets = [v * cth, v * sth, om] + [u[2 + i] for i in range(9)]
            qd = [tg + (qd[i] - tg) * decay for i, tg in enumerate(targets)]
            q = [q[i] + qd[i] * h for i in range(12)]
            for i in range(9):
                q[3 + i] = jnp.clip(q[3 + i], arm_lo[i], arm_hi[i])

            if has_box:
                # ground friction (pbd2d.ground_friction)
                speed = jnp.sqrt(bvx * bvx + bvy * bvy)
                scale = jnp.maximum(
                    0.0, 1.0 - mu_g * GRAVITY * h / jnp.maximum(speed, 1e-9)
                )
                bvx, bvy = bvx * scale, bvy * scale
                om_scale = jnp.maximum(
                    0.0,
                    1.0
                    - mu_g * GRAVITY * h
                    / jnp.maximum(jnp.abs(bom) * ang_rad, 1e-9),
                )
                bom = bom * om_scale
                bx = bx + bvx * h
                by = by + bvy * h
                byaw = byaw + bom * h
                for _ in range(2):  # Jacobi passes (albert.step)
                    c_, s_ = jnp.cos(byaw), jnp.sin(byaw)
                    pen, nx, ny, px, py = _circle_vs_obb(
                        q[0], q[1], rr, bx, by, c_, s_, hx, hy
                    )
                    out = _resolve(
                        pen, nx, ny, px, py,
                        q[0], q[1], qd[0], qd[1], 0.0, wm_base, 0.0,
                        bx, by, bvx, bvy, bom, wm_box, wi_box,
                        h, c_fric, 1.0,
                    )
                    q[0] = q[0] + out[0]
                    q[1] = q[1] + out[1]
                    qd[0] = qd[0] + out[3]
                    qd[1] = qd[1] + out[4]
                    bx, by, byaw = bx + out[6], by + out[7], byaw + out[8]
                    bvx, bvy, bom = bvx + out[9], bvy + out[10], bom + out[11]

        # ----------------------------------------------------------- cost
        # (AlbertObjective.compute parity; ext forces are zero for albert)
        dgx, dgy = q[0] - gx, q[1] - gy
        nav = jnp.sqrt(dgx * dgx + dgy * dgy)

        ee = fk_ee(q, jnp.cos(q[2]), jnp.sin(q[2]))
        de = [ee[0] - gx, ee[1] - gy, ee[2] - gz]
        ee_cost = 10.0 * jnp.sqrt(
            de[0] * de[0] + de[1] * de[1] + de[2] * de[2]
        )
        ee_reach = ee_cost + 3.0 * nav

        if has_box:
            r2bx, r2by = bx - q[0], by - q[1]
            b2gx, b2gy = gx - bx, gy - by
            d_rb = jnp.sqrt(r2bx * r2bx + r2by * r2by)
            d_bg = jnp.sqrt(b2gx * b2gx + b2gy * b2gy)
            cos_theta = (-(r2bx * b2gx) - (r2by * b2gy)) / jnp.maximum(
                d_rb * d_bg, 1e-9
            )
            approach = 5.0 * jnp.maximum(d_rb - P["approach_r"], 0.0)
            push = (
                3.0 * (d_rb + d_bg * 10.0)
                + 1.5 * (1.0 + cos_theta)
                + approach
            )
            hov = [ee[0] - bx, ee[1] - by, ee[2] - gz]
            hover_w = 1.5 + 2.5 * jax.nn.sigmoid(
                (P["hover_gate_r"] - d_rb) / 0.03
            )
            hover = hover_w * jnp.sqrt(
                hov[0] * hov[0] + hov[1] * hov[1] + hov[2] * hov[2]
            )
            push_reach = push + hover
            repo = nav + 10.0 * jnp.maximum(P["clearance_r"] - d_rb, 0.0)
        else:
            push_reach = nav
            repo = nav

        is9 = (task_id == 9.0).astype(jnp.float32)
        is7 = (task_id == 7.0).astype(jnp.float32)
        is8 = (task_id == 8.0).astype(jnp.float32)
        cost = (
            is9 * push_reach
            + is7 * ee_reach
            + is8 * repo
            + (1.0 - is9 - is7 - is8) * nav
        )

        cost_ref[pl.ds(t, 1), :] = cost
        trajx_ref[pl.ds(t, 1), :] = q[0]
        trajy_ref[pl.ds(t, 1), :] = q[1]
        return flatten(q, qd, bx, by, byaw, bvx, bvy, bom)

    init = flatten(q, qd, bx, by, byaw, bvx, bvy, bom)
    assert len(init) == n_flat
    jax.lax.fori_loop(0, P["T"], t_body, init)


# --------------------------------------------------------------------------
# builder
# --------------------------------------------------------------------------

def make_albert_rollout(
    env_params,
    objective,
    K: int,
    T: int,
    interpret: bool = False,
):
    """Build the fused rollout callable for the albert scene.

    Drop-in for ``MPPI._rollout``: ``rollout(sim_state_k, acts, task) ->
    (cost_horizon [K, T], traj_points [K, T, 2])``.  ``objective`` supplies
    the derived contact-envelope thresholds (AlbertObjective.contact_r
    family) so kernel and XLA costs can never drift apart.  Returns None
    when unsupported.
    """
    if not (pallas_available() or interpret):
        return None

    P = dict(
        T=T,
        K=K,
        dt=float(env_params.dt),
        substeps=int(env_params.substeps),
        decay=float(
            np.exp(-env_params.drive_rate * env_params.dt / env_params.substeps)
        ),
        base_radius=float(env_params.base_radius),
        base_mass=float(env_params.base_mass),
        has_box=bool(env_params.has_box),
        approach_r=float(objective.approach_r),
        hover_gate_r=float(objective.hover_gate_r),
        clearance_r=float(objective.clearance_r),
        interpret=bool(interpret),
    )
    if P["has_box"]:
        P.update(
            box_half=[float(x) for x in np.asarray(env_params.box_half)],
            box_inv_mass=float(env_params.box_inv_mass),
            box_inv_inertia=float(env_params.box_inv_inertia),
            box_friction=float(env_params.box_friction),
        )

    _calls = {}

    def _get_call(K_loc: int):
        if K_loc not in _calls:
            Kp = _round_up(K_loc, 128)

            def albert_rollout_kernel(*refs):
                return _albert_kernel(*refs, P=P)

            _calls[K_loc] = (
                pl.pallas_call(
                    albert_rollout_kernel,
                    out_shape=(
                        jax.ShapeDtypeStruct((T, Kp), jnp.float32),
                        jax.ShapeDtypeStruct((T, Kp), jnp.float32),
                        jax.ShapeDtypeStruct((T, Kp), jnp.float32),
                    ),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=(
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ),
                    interpret=interpret,
                ),
                Kp,
            )
        return _calls[K_loc]

    def _pack(sim_state_k, acts, task, k0v, Kp):
        K_loc = acts.shape[0]
        s0 = jax.tree_util.tree_map(lambda x: x[0], sim_state_k)
        rows = (
            [s0.q[i] for i in range(12)]
            + [s0.qd[i] for i in range(12)]
            + [s0.box_pos[0], s0.box_pos[1], s0.box_yaw]
            + [s0.box_vel[0], s0.box_vel[1], s0.box_om]
        )
        state_packed = jnp.broadcast_to(
            jnp.stack(rows)[:, None], (_N_ROWS, Kp)
        ).astype(jnp.float32)

        acts_t = jnp.swapaxes(acts, 0, 1)  # [T, K_loc, 13]
        acts_p = jnp.zeros((T, 13, Kp), jnp.float32)
        acts_p = acts_p.at[:, :, :K_loc].set(jnp.swapaxes(acts_t, 1, 2))

        task_vec = jnp.concatenate(
            [
                task.task_id.astype(jnp.float32)[None],
                task.goal.astype(jnp.float32)[:3],
                k0v[None],
            ]
        )
        return task_vec, acts_p, state_packed

    def _unpack(cost, tx, ty, K_loc):
        cost_horizon = jnp.swapaxes(cost[:, :K_loc], 0, 1)
        tps = jnp.stack([tx[:, :K_loc], ty[:, :K_loc]], axis=-1)
        return cost_horizon, jnp.swapaxes(tps, 0, 1)

    def _single(sim_state_k, acts, task, k0):
        K_loc = acts.shape[0]
        call, Kp = _get_call(K_loc)
        k0v = (
            jnp.zeros((), jnp.float32)
            if k0 is None
            else jnp.asarray(k0, jnp.float32)
        )
        task_vec, acts_p, state_packed = _pack(sim_state_k, acts, task, k0v, Kp)
        cost, tx, ty = call(task_vec, acts_p, state_packed)
        return _unpack(cost, tx, ty, K_loc)

    # batched variant (grid=(B,)) so the vmapped multi-seed runner keeps the
    # kernel — same SmemRowView plumbing as the point/panda kernels
    from m3p2i_aip_tpu.ops.pallas_kernels import SmemRowView

    _bcalls = {}

    def _get_batched_call(B: int, K_loc: int):
        key = (B, K_loc)
        if key not in _bcalls:
            Kp = _round_up(K_loc, 128)

            def albert_rollout_kernel_batched(task_ref, *refs):
                return _albert_kernel(
                    SmemRowView(task_ref, pl.program_id(0)), *refs, P=P
                )

            _bcalls[key] = (
                pl.pallas_call(
                    albert_rollout_kernel_batched,
                    grid=(B,),
                    out_shape=(
                        jax.ShapeDtypeStruct((B, T, Kp), jnp.float32),
                        jax.ShapeDtypeStruct((B, T, Kp), jnp.float32),
                        jax.ShapeDtypeStruct((B, T, Kp), jnp.float32),
                    ),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((None, T, 13, Kp), lambda b: (b, 0, 0, 0)),
                        pl.BlockSpec((None, _N_ROWS, Kp), lambda b: (b, 0, 0)),
                    ],
                    out_specs=(
                        pl.BlockSpec((None, T, Kp), lambda b: (b, 0, 0)),
                        pl.BlockSpec((None, T, Kp), lambda b: (b, 0, 0)),
                        pl.BlockSpec((None, T, Kp), lambda b: (b, 0, 0)),
                    ),
                    interpret=interpret,
                ),
                Kp,
            )
        return _bcalls[key]

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def _rollout_cv(sim_state_k, acts, task):
        return _single(sim_state_k, acts, task, None)

    @_rollout_cv.def_vmap
    def _rollout_cv_rule(axis_size, in_batched, sim_state_k, acts, task):
        B = axis_size

        def bc(x, batched):
            x = jnp.asarray(x)
            return x if batched else jnp.broadcast_to(x[None], (B,) + x.shape)

        sim_state_k = jax.tree.map(bc, sim_state_k, in_batched[0])
        acts = bc(acts, in_batched[1])
        task = jax.tree.map(bc, task, in_batched[2])
        K_loc = acts.shape[1]
        call, Kp = _get_batched_call(B, K_loc)
        zero = jnp.zeros((), jnp.float32)
        tv, ap, sp = jax.vmap(lambda s, a, t: _pack(s, a, t, zero, Kp))(
            sim_state_k, acts, task
        )
        cost, tx, ty = call(tv, ap, sp)
        ch, tps = jax.vmap(lambda c, x, y: _unpack(c, x, y, K_loc))(cost, tx, ty)
        return (ch, tps), (True, True)

    def rollout(sim_state_k, acts, task, k0=None):
        if k0 is None:
            return _rollout_cv(sim_state_k, acts, task)
        return _single(sim_state_k, acts, task, k0)

    return rollout
