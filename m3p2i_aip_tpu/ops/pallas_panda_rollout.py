"""Fused Pallas TPU rollout kernel for the PANDA env (K samples on lanes).

Completes the kernel story the point env already has (ops/pallas_rollout.py):
the whole K x T x substeps rollout — joint velocity drive, matrix FK, grasp
attach/detach, cube dynamics (gravity, support surfaces, static AABB pushout),
arm-probe contact sensing, and the reach/pick/place costs — runs as ONE Pallas
kernel with all state resident in vector registers / VMEM.

Parity targets (the XLA references this kernel must match, enforced by the
interpret-mode test in tests/test_pallas.py):
  * models/panda_env.py step()            — physics semantics
  * models/panda_fk.py fk()               — kinematics
  * planners/motion_planner/cost_functions.py PandaObjective — costs
Reference-of-reference: the single Isaac Gym engine stepping all robots
uniformly (isaacgym_wrapper.py:354-364) at K=num_samples.

Layout: every scalar of the per-sample state is a [1, Kp] f32 lane vector
(Kp = K rounded up to 128).  FK rotations are NINE lane vectors composed by
explicit 3x3 products (MXU-free VPU arithmetic — each product is 27 mul+18
add full-width ops).  The manipulated cube's orientation is carried as a
rotation matrix (quaternions only appear at the host boundary), so the
attach constraint and the orientation costs are pure lane arithmetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None

from m3p2i_aip_tpu.models import panda_fk
from m3p2i_aip_tpu.ops.pallas_kernels import pallas_available

GRAVITY = 9.8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# lane-vector 3D helpers (vec3 = [x, y, z] of [1, Kp] arrays or floats;
# mat3 = row-major nested list [[r00, r01, r02], ...])
# --------------------------------------------------------------------------

def _is_const(x) -> bool:
    return isinstance(x, (int, float))


def _term(a, b):
    """a*b with trace-time folding for python-scalar b in {0, +/-1}.

    Returns None for an exactly-zero term (caller skips it).  The FK chain's
    roll/hand matrices and joint offsets are mostly exact zeros and +/-1s;
    folding them at trace time cuts the 27-mul generic 3x3 product to the
    6-12 ops the sparsity actually needs — with bit-identical results (only
    0*finite and 1*x identities are used).
    """
    if _is_const(b):
        if b == 0.0:
            return None
        if b == 1.0:
            return a
        if b == -1.0:
            return -a
    if _is_const(a):
        if a == 0.0:
            return None
        if a == 1.0:
            return b
        if a == -1.0:
            return -b
    return a * b


def _fold_sum(terms):
    acc = None
    for t in terms:
        if t is None:
            continue
        acc = t if acc is None else acc + t
    return 0.0 if acc is None else acc


def _dot3(a, b):
    return _fold_sum([_term(a[i], b[i]) for i in range(3)])


def _mat_mul(A, B):
    return [
        [_fold_sum([_term(A[i][k], B[k][j]) for k in range(3)]) for j in range(3)]
        for i in range(3)
    ]


def _mat_vec(A, v):
    return [_dot3(A[i], v) for i in range(3)]


def _mat_T_vec(A, v):
    """A^T v — rotate a world vector into A's local frame."""
    return [A[0][j] * v[0] + A[1][j] * v[1] + A[2][j] * v[2] for j in range(3)]


def _mat_col(A, j):
    return [A[0][j], A[1][j], A[2][j]]


def _norm3(v, eps=0.0):
    n2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    return jnp.sqrt(n2) if eps == 0.0 else jnp.sqrt(jnp.maximum(n2, eps))


def _where3(c, a, b):
    return [jnp.where(c, a[i], b[i]) for i in range(3)]


def _rot_z_lanes(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]


def _rodrigues(om, h):
    """Rotation matrix for the incremental rotation om*h (world frame).

    Matches quat_integrate (ops/quat.py:94-98) to O(|om*h|^3): first-order
    quaternion integration + renormalize is a rotation by 2*atan(|om|h/2)
    about om, Rodrigues is exactly |om|h — indistinguishable at sim rates.
    """
    wx, wy, wz = om[0] * h, om[1] * h, om[2] * h
    th = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-18))
    kx, ky, kz = wx / th, wy / th, wz / th
    c, s = jnp.cos(th), jnp.sin(th)
    v = 1.0 - c
    return [
        [c + kx * kx * v, kx * ky * v - kz * s, kx * kz * v + ky * s],
        [ky * kx * v + kz * s, c + ky * ky * v, ky * kz * v - kx * s],
        [kz * kx * v - ky * s, kz * ky * v + kx * s, c + kz * kz * v],
    ]


def _sphere_aabb(c, radius, bmin, bmax):
    """Penetration + outward normal, sphere vs 3D AABB.

    Exact lane transcription of panda_env._sphere_vs_aabb (including the
    arithmetic one-hot push-out-axis selection for centers inside the box).
    bmin/bmax entries may be floats (statics) or lanes (cubeB).
    """
    cl = [jnp.clip(c[i], bmin[i], bmax[i]) for i in range(3)]
    diff = [c[i] - cl[i] for i in range(3)]
    dist = _norm3(diff)
    inside = (
        (c[0] > bmin[0]) & (c[0] < bmax[0])
        & (c[1] > bmin[1]) & (c[1] < bmax[1])
        & (c[2] > bmin[2]) & (c[2] < bmax[2])
    )
    sep_lo = [c[i] - bmin[i] for i in range(3)]
    sep_hi = [bmax[i] - c[i] for i in range(3)]
    sep = [jnp.minimum(sep_lo[i], sep_hi[i]) for i in range(3)]
    min_sep = jnp.minimum(jnp.minimum(sep[0], sep[1]), sep[2])
    one_hot = [(sep[i] <= min_sep).astype(jnp.float32) for i in range(3)]
    denom = one_hot[0] + one_hot[1] + one_hot[2]
    one_hot = [o / denom for o in one_hot]
    sign = [jnp.where(sep_hi[i] < sep_lo[i], 1.0, -1.0) for i in range(3)]
    inv_d = 1.0 / jnp.maximum(dist, 1e-9)
    normal = [
        jnp.where(inside, sign[i] * one_hot[i], diff[i] * inv_d)
        for i in range(3)
    ]
    pen = jnp.where(inside, radius + min_sep, radius - dist)
    return pen, normal


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _panda_kernel(
    task_ref,   # SMEM [10]: task_id, goal_pos(3), goal_quat(4, xyzw), k0,
                #            zup_gate
    acts_ref,   # VMEM [T, 9, Kp] (pre-scaled, gripper channels pre-overridden)
    state_ref,  # VMEM [61, Kp]
    cost_ref,   # VMEM out [T, Kp]
    trajx_ref,  # VMEM out [T, Kp]
    trajy_ref,  # VMEM out [T, Kp]
    *,
    P,
):
    Kp = state_ref.shape[1]
    S = P["S"]          # number of static AABBs
    NP = P["NP"]        # number of support surfaces
    h = P["dt"] / P["substeps"]
    decay = P["decay"]
    one_m_decay = 1.0 - decay

    task_id = task_ref[0]
    goal = [task_ref[1], task_ref[2], task_ref[3]]
    gq = [task_ref[4], task_ref[5], task_ref[6], task_ref[7]]  # x,y,z,w
    # goal quaternion -> rotation matrix (scalar math, quat.py:16-41 parity)
    gx_, gy_, gz_, gw_ = gq
    GR = [
        [2 * (gw_ * gw_ + gx_ * gx_) - 1, 2 * (gx_ * gy_ - gw_ * gz_), 2 * (gx_ * gz_ + gw_ * gy_)],
        [2 * (gx_ * gy_ + gw_ * gz_), 2 * (gw_ * gw_ + gy_ * gy_) - 1, 2 * (gy_ * gz_ - gw_ * gx_)],
        [2 * (gx_ * gz_ - gw_ * gy_), 2 * (gy_ * gz_ + gw_ * gx_), 2 * (gw_ * gw_ + gz_ * gz_) - 1],
    ]

    k0 = task_ref[8]  # global sample offset of this shard (0 unsharded)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
    # GLOBAL-index mode split: correct inside a shard_map shard (see
    # pallas_rollout.py)
    gcol = col.astype(jnp.float32) + k0
    mode1 = (gcol >= P["half_K"]) & (gcol < P["K"])  # second-half samples

    def row(i):
        return state_ref[i : i + 1, :]

    q = [row(i) for i in range(9)]
    qd = [row(9 + i) for i in range(9)]
    d0p = [row(18 + i) for i in range(3)]   # dyn-obs
    d0v = [row(21 + i) for i in range(3)]
    cAp = [row(24 + i) for i in range(3)]   # cubeA
    cAv = [row(27 + i) for i in range(3)]
    cAom = [row(30 + i) for i in range(3)]
    cAR = [[row(33 + 3 * i + j) for j in range(3)] for i in range(3)]
    cBp = [row(42 + i) for i in range(3)]   # cubeB
    cBv = [row(45 + i) for i in range(3)]
    att = row(48)
    apos = [row(49 + i) for i in range(3)]
    aR = [[row(52 + 3 * i + j) for j in range(3)] for i in range(3)]

    n_flat = 61

    def flatten(q, qd, d0p, d0v, cAp, cAv, cAom, cAR, cBp, cBv, att, apos, aR):
        out = list(q) + list(qd) + list(d0p) + list(d0v)
        out += list(cAp) + list(cAv) + list(cAom)
        out += [cAR[i][j] for i in range(3) for j in range(3)]
        out += list(cBp) + list(cBv) + [att] + list(apos)
        out += [aR[i][j] for i in range(3) for j in range(3)]
        return tuple(out)

    def unflatten(f):
        q = list(f[0:9]); qd = list(f[9:18])
        d0p = list(f[18:21]); d0v = list(f[21:24])
        cAp = list(f[24:27]); cAv = list(f[27:30]); cAom = list(f[30:33])
        cAR = [[f[33 + 3 * i + j] for j in range(3)] for i in range(3)]
        cBp = list(f[42:45]); cBv = list(f[45:48])
        att = f[48]; apos = list(f[49:52])
        aR = [[f[52 + 3 * i + j] for j in range(3)] for i in range(3)]
        return q, qd, d0p, d0v, cAp, cAv, cAom, cAR, cBp, cBv, att, apos, aR

    vel_lim = [float(v) for v in panda_fk.JOINT_VEL_LIMIT]
    acc_h = [float(a) * h for a in panda_fk.JOINT_ACCEL_LIMIT]
    j_lo = [float(v) for v in panda_fk.JOINT_LOWER]
    j_hi = [float(v) for v in panda_fk.JOINT_UPPER]
    joint_xyz = [[float(x) for x in r] for r in panda_fk._JOINT_XYZ]
    roll_mats = [
        None if m is None else [[float(x) for x in r] for r in m]
        for m in panda_fk._ROLL_MATS
    ]
    hand_mat = [[float(x) for x in r] for r in panda_fk._HAND_MAT]
    hand_xyz = [float(x) for x in panda_fk.HAND_XYZ]
    finger_xyz = [float(x) for x in panda_fk.FINGER_XYZ]
    base = [float(x) for x in P["base_pos"]]

    def _col3(vals):
        """[3, 1] constant column from 3 python floats (iota + selects:
        pallas_call rejects captured array constants)."""
        r = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
        out = jnp.zeros((3, 1), jnp.float32)
        for i, v in enumerate(vals):
            if float(v) != 0.0:
                out = jnp.where(r == i, jnp.float32(v), out)
        return out

    def _cols_mul_const(C, M):
        """Packed-column rot @ const 3x3: new column k = sum_i M[i][k]*C[i],
        with trace-time folding of the constant zeros/ones."""
        out = []
        for k in range(3):
            acc = None
            for i in range(3):
                t = _term(C[i], M[i][k])
                if t is None:
                    continue
                acc = t if acc is None else acc + t
            out.append(0.0 if acc is None else acc)
        return out

    def fk(q):
        """Matrix FK (panda_fk.fk parity), SUBLANE-PACKED.

        The chain composes on packed [3, Kp] blocks — position and the three
        rotation columns each live with their xyz components on sublanes, so
        a joint update (offset FMA + roll + Rz) is ~10 packed vector ops
        instead of ~30 row ops.  Results unpack to the row-vec3/mat3 layout
        the rest of the kernel consumes.
        """
        one = 1.0 + 0.0 * q[0]  # [1, Kp] ones (broadcast seed)
        pos = _col3(base) * one  # [3, Kp]
        C = [_col3(v) * one for v in ([1, 0, 0], [0, 1, 0], [0, 0, 1])]
        packed_links = {}
        for j in range(7):
            off = joint_xyz[j]
            for i in range(3):
                if off[i] != 0.0:
                    pos = pos + C[i] * off[i]
            if roll_mats[j] is not None:
                C = _cols_mul_const(C, roll_mats[j])
            c_, s_ = jnp.cos(q[j]), jnp.sin(q[j])  # [1, Kp] broadcast rows
            C = [C[0] * c_ + C[1] * s_, C[1] * c_ - C[0] * s_, C[2]]
            if j >= 3:  # only link4..7 positions are consumed downstream
                packed_links[f"link{j+1}"] = pos
        hand_pos = pos
        for i in range(3):
            if hand_xyz[i] != 0.0:
                hand_pos = hand_pos + C[i] * hand_xyz[i]
        CH = _cols_mul_const(C, hand_mat)
        f_base = hand_pos
        for i in range(3):
            if finger_xyz[i] != 0.0:
                f_base = f_base + CH[i] * finger_xyz[i]
        left = f_base + CH[1] * q[7]
        right = f_base - CH[1] * q[8]
        ee = (left + right) * 0.5
        tip = ee + CH[2] * panda_fk.FINGERTIP_Z
        packed_links["hand"] = hand_pos
        packed_links["leftfinger"] = left
        packed_links["rightfinger"] = right
        packed_links["ee"] = ee
        packed_links["fingertip"] = tip

        if P["interpret"]:
            # XLA:CPU fusion bomb guard (see the probe block): pin the packed
            # chains so per-consumer re-evaluation can't blow up interpret runs
            names = sorted(packed_links)
            pinned = jax.lax.optimization_barrier(
                tuple(packed_links[n] for n in names) + tuple(CH)
            )
            packed_links = dict(zip(names, pinned[: len(names)]))
            CH = list(pinned[len(names) :])

        def unpack(v):  # [3, Kp] -> row-vec3
            return [v[0:1, :], v[1:2, :], v[2:3, :]]

        links = {n: unpack(v) for n, v in packed_links.items()}
        # hand_rot back to the row-major nested-list mat3 the costs consume
        cols = [unpack(CH[k]) for k in range(3)]
        links["hand_rot"] = [[cols[k][i] for k in range(3)] for i in range(3)]
        return links

    stat_lo = P["stat_min"]   # [S][3] floats
    stat_hi = P["stat_max"]
    sup_lo = P["sup_min"]     # [NP][2]
    sup_hi = P["sup_max"]
    sup_z = P["sup_z"]        # [NP]
    half = P["body_half"]     # [3][3]
    mass = P["body_mass"]
    grav_on = P["body_gravity"]  # [3] 0/1 floats
    r_eff = [float(np.mean(half[i])) for i in range(3)]
    inv_h2_m = [m / (h * h) for m in mass]

    def t_body(t, carry):
        (q, qd, d0p, d0v, cAp, cAv, cAom, cAR, cBp, cBv,
         att, apos, aR) = unflatten(carry)

        u = [acts_ref[t, c : c + 1, :] for c in range(9)]
        u_cl = [jnp.clip(u[c], -vel_lim[c], vel_lim[c]) for c in range(9)]
        gripper_closing = u[7] < 0.0

        # per-step contact-force channels the motion cost reads
        # (table, shelf, cubeB actors — cost_functions.py:190-198 parity)
        tbl_fx = jnp.zeros((1, Kp), jnp.float32)
        tbl_fy = jnp.zeros((1, Kp), jnp.float32)
        shf_fx = jnp.zeros((1, Kp), jnp.float32)
        shf_fy = jnp.zeros((1, Kp), jnp.float32)
        cB_fx = jnp.zeros((1, Kp), jnp.float32)
        cB_fy = jnp.zeros((1, Kp), jnp.float32)
        links = None

        half_w = P["body_half"][1][0]
        release_gap = 2.0 * half_w + 0.005

        for _ in range(P["substeps"]):
            # --- joint drive + integrate (accel-saturated velocity tracking)
            for c in range(9):
                dv = (u_cl[c] - qd[c]) * one_m_decay
                qd[c] = qd[c] + jnp.clip(dv, -acc_h[c], acc_h[c])
                q[c] = jnp.clip(q[c] + qd[c] * h, j_lo[c], j_hi[c])
            # fingers rest ON the gripped cube (finger-travel release model,
            # panda_env.py)
            held = att > 0.5
            q[7] = jnp.where(held, jnp.maximum(q[7], half_w * 0.96), q[7])
            q[8] = jnp.where(held, jnp.maximum(q[8], half_w * 0.96), q[8])

            links = fk(q)
            hand_pos = links["hand"]
            hand_rot = links["hand_rot"]
            tip = links["fingertip"]

            # --- grasp attach / detach (panda_env.py:242-251)
            cA_prev = list(cAp)  # substep-start position (held velocity ref)
            d_tc = [tip[i] - cAp[i] for i in range(3)]
            near = _norm3(d_tc) < P["grasp_range"]
            do_attach = (att < 0.5) & gripper_closing & near
            d_ch = [cAp[i] - hand_pos[i] for i in range(3)]
            rel_pos = _mat_T_vec(hand_rot, d_ch)
            rel_rot = _mat_mul(
                [[hand_rot[j][i] for j in range(3)] for i in range(3)], cAR
            )
            apos = _where3(do_attach, rel_pos, apos)
            aR = [
                [jnp.where(do_attach, rel_rot[i][j], aR[i][j]) for j in range(3)]
                for i in range(3)
            ]
            att = jnp.where(do_attach, 1.0, att)
            # only an OPENING gripper releases (panda_env.py)
            att = jnp.where(
                ~gripper_closing & (q[7] + q[8] > release_gap), 0.0, att
            )

            # --- body dynamics: gravity, integrate, support, pushout --------
            bpos = [d0p, cAp, cBp]
            bvel = [d0v, cAv, cBv]
            new_pos = [None] * 3
            for b in range(3):
                v = bvel[b]
                v = [v[0], v[1], v[2] - GRAVITY * grav_on[b] * h]
                np_ = [bpos[b][i] + v[i] * h for i in range(3)]
                bvel[b] = v
                new_pos[b] = np_
            cAR = _mat_mul(_rodrigues(cAom, h), cAR)

            for b in range(3):
                # support: highest surface under the footprint (panda_env.py:261-282)
                neg_inf = jnp.float32(-np.inf)
                sup_h = jnp.full((1, Kp), neg_inf)
                old_z = bpos[b][2]
                for p in range(NP):
                    over = (
                        (new_pos[b][0] >= sup_lo[p][0]) & (new_pos[b][0] <= sup_hi[p][0])
                        & (new_pos[b][1] >= sup_lo[p][1]) & (new_pos[b][1] <= sup_hi[p][1])
                    )
                    below = sup_z[p] <= (old_z - half[b][2] + 1e-3)
                    sup_h = jnp.maximum(sup_h, jnp.where(over & below, sup_z[p], neg_inf))
                if b == 1:
                    # cubeA stacks on cubeB's top face (panda_env.py support
                    # block) — bpos entries are this substep's OLD positions
                    cb_top = bpos[2][2] + half[2][2]
                    overB = (
                        (jnp.abs(new_pos[1][0] - bpos[2][0]) <= half[2][0])
                        & (jnp.abs(new_pos[1][1] - bpos[2][1]) <= half[2][1])
                    )
                    belowB = cb_top <= (old_z - half[1][2] + 1e-3)
                    sup_h = jnp.maximum(
                        sup_h, jnp.where(overB & belowB, cb_top, neg_inf)
                    )
                rest_z = sup_h + half[b][2]
                landing = (new_pos[b][2] <= rest_z) & (grav_on[b] > 0.5)
                new_pos[b][2] = jnp.where(landing, rest_z, new_pos[b][2])
                v = bvel[b]
                vz = jnp.where(landing, 0.0, v[2])
                speed = jnp.sqrt(v[0] * v[0] + v[1] * v[1])
                scale = jnp.maximum(0.0, 1.0 - 0.75 * GRAVITY * h / jnp.maximum(speed, 1e-9))
                vx = jnp.where(landing, v[0] * scale, v[0])
                vy = jnp.where(landing, v[1] * scale, v[1])
                bvel[b] = [vx, vy, vz]
                if b == 1:
                    # contact settling torque (panda_env.py landing branch):
                    # flatten body z toward world z while resting
                    ux, uy, uz = cAR[0][2], cAR[1][2], cAR[2][2]
                    flat = (uz > 0.5).astype(jnp.float32)
                    omc = [5.0 * uy * flat, -5.0 * ux * flat, 0.0 * ux]
                    cAom = [
                        jnp.where(landing, cAom[i] * 0.8 + omc[i], cAom[i])
                        for i in range(3)
                    ]

                # lateral pushout vs the statics (cube approx as sphere)
                corr = [jnp.zeros((1, Kp), jnp.float32) for _ in range(3)]
                for s in range(S):
                    pen, nrm = _sphere_aabb(new_pos[b], r_eff[b], stat_lo[s], stat_hi[s])
                    lateral = jnp.abs(nrm[2]) < 0.9
                    active = ((pen > 0) & lateral).astype(jnp.float32)
                    fxy = [active * pen * nrm[i] for i in range(3)]
                    corr = [corr[i] + fxy[i] for i in range(3)]
                    fsx = fxy[0] * inv_h2_m[b]
                    fsy = fxy[1] * inv_h2_m[b]
                    # stat actor gets -f (panda_env.py:299)
                    if s == P["table_slot"]:
                        tbl_fx, tbl_fy = tbl_fx - fsx, tbl_fy - fsy
                    if s == P["shelf_slot"]:
                        shf_fx, shf_fy = shf_fx - fsx, shf_fy - fsy
                    if b == 2:  # cubeB's own actor gets +f (panda_env.py:298)
                        cB_fx, cB_fy = cB_fx + fsx, cB_fy + fsy
                new_pos[b] = [new_pos[b][i] + corr[i] for i in range(3)]

            d0p, cAp, cBp = new_pos
            d0v, cAv, cBv = bvel

            # --- attached cube follows the hand (panda_env.py:303-312)
            hv = _mat_vec(hand_rot, apos)
            held_pos = [hand_pos[i] + hv[i] for i in range(3)]
            held_rot = _mat_mul(hand_rot, aR)
            is_att = att > 0.5
            # substep-START reference (panda_env.py held-velocity fix)
            new_vel = [(held_pos[i] - cA_prev[i]) / h for i in range(3)]
            cAp = _where3(is_att, held_pos, cAp)
            cAv = _where3(is_att, new_vel, cAv)
            cAR = [
                [jnp.where(is_att, held_rot[i][j], cAR[i][j]) for j in range(3)]
                for i in range(3)
            ]

            # --- arm probe contact sensing (panda_env.py:314-343): the 7
            # probe spheres are SUBLANE-PACKED as one [7, Kp] block per
            # component, so each static costs ONE packed sphere-AABB instead
            # of 7 row ops (same trick as pallas_rollout.py pass 3)
            cb_lo = [cBp[i] - half[2][i] for i in range(3)]
            cb_hi = [cBp[i] + half[2][i] for i in range(3)]
            probes = (
                links["link4"], links["link5"], links["link6"],
                hand_pos, links["leftfinger"], links["rightfinger"], tip,
            )
            pk = [
                jnp.concatenate([pr[i] for pr in probes], axis=0)
                for i in range(3)
            ]
            if P["interpret"]:
                # XLA:CPU fusion bomb guard (CLAUDE.md): a concat of computed
                # FK chains consumed by several reductions re-evaluates the
                # operands per element; the barrier (semantically identity)
                # pins the packed block.  Mosaic needs no such guard.
                pk = list(jax.lax.optimization_barrier(tuple(pk)))
            for s in range(S):
                pen, nrm = _sphere_aabb(pk, 0.05, stat_lo[s], stat_hi[s])
                hit = jnp.maximum(pen, 0.0) * 2000.0
                hx = jnp.sum(hit * nrm[0], axis=0, keepdims=True)
                hy = jnp.sum(hit * nrm[1], axis=0, keepdims=True)
                if s == P["table_slot"]:
                    tbl_fx, tbl_fy = tbl_fx - hx, tbl_fy - hy
                if s == P["shelf_slot"]:
                    shf_fx, shf_fy = shf_fx - hx, shf_fy - hy
            pen_b, nrm_b = _sphere_aabb(pk, 0.04, cb_lo, cb_hi)
            hit_b = jnp.maximum(pen_b, 0.0) * 2000.0
            cB_fx = cB_fx - jnp.sum(hit_b * nrm_b[0], axis=0, keepdims=True)
            cB_fy = cB_fy - jnp.sum(hit_b * nrm_b[1], axis=0, keepdims=True)

            # held/free cubeA vs cubeB (panda_env.py:344-351)
            pen_ab, nrm_ab = _sphere_aabb(cAp, r_eff[1], cb_lo, cb_hi)
            hit_ab = jnp.maximum(pen_ab, 0.0)
            cB_fx = cB_fx - hit_ab * nrm_ab[0] * 2000.0
            cB_fy = cB_fy - hit_ab * nrm_ab[1] * 2000.0
            on = jnp.where(hit_ab > 0, 1.0, 0.0)
            cBp = [
                cBp[0] - on * nrm_ab[0] * hit_ab * 0.5,
                cBp[1] - on * nrm_ab[1] * hit_ab * 0.5,
                cBp[2],
            ]

        # ----------------------------------------------------------- cost
        # (PandaObjective.compute parity; post-step state, this step's forces)
        n = float(P["substeps"])
        fx = (tbl_fx + 4.0 * shf_fx + cB_fx) / n
        fy = (tbl_fy + 4.0 * shf_fy + cB_fy) / n
        motion_cost = jnp.where(jnp.abs(fx) + jnp.abs(fy) > 0.1, 1000.0, 0.0)

        ee = links["ee"]
        hand_rot = links["hand_rot"]
        ee_y = _mat_col(hand_rot, 1)
        ee_z = _mat_col(hand_rot, 2)
        cube_axes = [_mat_col(cAR, j) for j in range(3)]

        # reach (PandaObjective._reach)
        phd = P["pre_height_diff"]
        tilt = P["tilt_cos_theta"]
        top_goal = [cAp[0], cAp[1], cAp[2] + phd]
        cos_y = [jnp.abs(_dot3(ee_y, ax)) for ax in cube_axes]
        cost_y = jnp.minimum(
            jnp.minimum(1.0 - cos_y[0], 1.0 - cos_y[1]), 1.0 - cos_y[2]
        )
        cos_z = [jnp.abs(_dot3(ee_z, ax)) for ax in cube_axes]
        tilt0_z = jnp.minimum(
            jnp.minimum(1.0 - cos_z[0], 1.0 - cos_z[1]), 1.0 - cos_z[2]
        )
        if P["multi_modal"]:
            side_goal = [
                cAp[0] - phd * tilt,
                cAp[1],
                cAp[2] + phd * float((1 - tilt**2) ** 0.5),
            ]
            goal_r = _where3(mode1, side_goal, top_goal)
            # tilted grasp: cube axis most aligned with world-x, first-max
            # one-hot (mirrors argmax + take_along_axis in quat.py:203-212)
            xness = [jnp.abs(ax[0]) for ax in cube_axes]
            m = jnp.maximum(jnp.maximum(xness[0], xness[1]), xness[2])
            oh0 = xness[0] >= m
            oh1 = (xness[1] >= m) & ~oh0
            oh2 = ~(oh0 | oh1)
            sel = [
                jnp.where(oh0, cube_axes[0][i],
                          jnp.where(oh1, cube_axes[1][i], cube_axes[2][i]))
                for i in range(3)
            ]
            _ = oh2
            tilt1_z = jnp.abs(tilt - _dot3(ee_z, sel))
            tilt_cost = jnp.where(mode1, tilt1_z, tilt0_z) + cost_y
        else:
            goal_r = top_goal
            tilt_cost = tilt0_z + cost_y
        d_rg = [ee[i] - goal_r[i] for i in range(3)]
        reach = 10.0 * _norm3(d_rg) + 3.0 * tilt_cost

        # pick (PandaObjective._pick): goal dist + flip-invariant ori +
        # re-grasp term (zero while held) + motion
        d_cg = [goal[i] - cAp[i] for i in range(3)]
        goal_cost = _norm3(d_cg)
        best = []
        for i in range(2):  # goal axes x and y
            g_ax = _mat_col(GR, i)
            dots = [jnp.abs(_dot3(g_ax, ax)) for ax in cube_axes]
            best.append(1.0 - jnp.maximum(jnp.maximum(dots[0], dots[1]), dots[2]))
        ori_cost = best[0] + best[1]
        d_ec = [ee[i] - cAp[i] for i in range(3)]
        regrasp = 10.0 * _norm3(d_ec) * (1.0 - att)
        # z-up clearance shaping (cost_functions._zup_clearance parity):
        # height deficit of the held cube wedged beside a static OR dragging
        # on its surface (bottom below top + 2 cm band; live only while the
        # stall gate is on)
        hA = half[1]
        zup = jnp.zeros((1, Kp), jnp.float32)
        for s in range(S):
            overlap = (
                (cAp[0] > stat_lo[s][0] - hA[0]) & (cAp[0] < stat_hi[s][0] + hA[0])
                & (cAp[1] > stat_lo[s][1] - hA[1]) & (cAp[1] < stat_hi[s][1] + hA[1])
            )
            wedged = (cAp[2] - hA[2] - 0.02) < stat_hi[s][2]
            needed = jnp.maximum(stat_hi[s][2] + hA[2] + 0.02 - cAp[2], 0.0)
            zup = jnp.maximum(zup, jnp.where(overlap & wedged, needed, 0.0))
        # wedge gate (see cost_functions._pick): traced task data from the
        # symbolic layer's goal-progress stall detector — a per-state
        # velocity test cannot tell a wedge from contact-jitter rattle
        pick = (10.0 * goal_cost + 15.0 * ori_cost + regrasp + motion_cost
                + 30.0 * zup * att * task_ref[9])

        # place (PandaObjective._place)
        d_lr = [links["leftfinger"][i] - links["rightfinger"][i] for i in range(3)]
        place = 2.0 * (1.0 - _norm3(d_lr))

        idx = jnp.clip(task_id - 4.0, 0.0, 2.0)
        is_reach = (idx == 0.0).astype(jnp.float32)
        is_pick = (idx == 1.0).astype(jnp.float32)
        is_place = (idx == 2.0).astype(jnp.float32)
        cost = is_reach * reach + is_pick * pick + is_place * place

        cost_ref[pl.ds(t, 1), :] = cost
        trajx_ref[pl.ds(t, 1), :] = ee[0]
        trajy_ref[pl.ds(t, 1), :] = ee[1]
        return flatten(q, qd, d0p, d0v, cAp, cAv, cAom, cAR, cBp, cBv, att, apos, aR)

    init = flatten(q, qd, d0p, d0v, cAp, cAv, cAom, cAR, cBp, cBv, att, apos, aR)
    assert len(init) == n_flat
    jax.lax.fori_loop(0, P["T"], t_body, init)


# --------------------------------------------------------------------------
# builder
# --------------------------------------------------------------------------

def make_panda_rollout(
    env_params,
    cfg,
    K: int,
    T: int,
    multi_modal: bool,
    interpret: bool = False,
):
    """Build the fused rollout callable for the panda scene.

    Drop-in for ``MPPI._rollout``: ``rollout(sim_state_k, acts, task) ->
    (cost_horizon [K, T], traj_points [K, T, 2])``.  All K rollouts start from
    the same (synced) state.  Returns None when unsupported.
    ``interpret=True`` targets the Pallas interpreter (CPU parity tests).
    """
    if not (pallas_available() or interpret):
        return None

    names = list(env_params.actor_names)
    stat_actor = list(env_params.stat_actor_idx)
    try:
        table_slot = stat_actor.index(names.index("table"))
        shelf_slot = stat_actor.index(names.index("shelf_stand"))
    except ValueError:
        return None

    stat_min = np.asarray(env_params.stat_min)
    stat_max = np.asarray(env_params.stat_max)
    sup_min = np.asarray(env_params.sup_min)
    sup_max = np.asarray(env_params.sup_max)
    sup_z = np.asarray(env_params.sup_z)
    half = np.asarray(env_params.body_half)

    P = dict(
        S=int(stat_min.shape[0]),
        NP=int(sup_z.shape[0]),
        T=T,
        K=K,
        half_K=K // 2,
        dt=float(env_params.dt),
        substeps=int(env_params.substeps),
        decay=float(np.exp(-env_params.drive_rate * env_params.dt / env_params.substeps)),
        grasp_range=float(env_params.grasp_range),
        base_pos=[float(x) for x in np.asarray(env_params.base_pos)],
        stat_min=[[float(x) for x in r] for r in stat_min],
        stat_max=[[float(x) for x in r] for r in stat_max],
        sup_min=[[float(x) for x in r] for r in sup_min],
        sup_max=[[float(x) for x in r] for r in sup_max],
        sup_z=[float(x) for x in sup_z],
        body_half=[[float(x) for x in r] for r in half],
        body_mass=[float(x) for x in np.asarray(env_params.body_mass)],
        body_gravity=[float(x) for x in np.asarray(env_params.body_gravity)],
        table_slot=table_slot,
        shelf_slot=shelf_slot,
        multi_modal=bool(multi_modal),
        pre_height_diff=float(cfg.pre_height_diff),
        tilt_cos_theta=0.5,
        interpret=bool(interpret),
    )
    # per-LOCAL-K pallas_call construction (shard_map composability — see
    # pallas_rollout.py)
    _calls = {}

    def _get_call(K_loc: int):
        if K_loc not in _calls:
            Kp = _round_up(K_loc, 128)

            # named closure, NOT functools.partial — a partial's repr embeds
            # a memory address, which leaks into the mosaic module name and
            # destabilizes the persistent-compilation-cache key across
            # processes (see pallas_rollout.py)
            def panda_rollout_kernel(*refs):
                return _panda_kernel(*refs, P=P)

            _calls[K_loc] = (
                pl.pallas_call(
                    panda_rollout_kernel,
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

    from m3p2i_aip_tpu.ops.quat import quat_to_rotmat

    _N_ROWS = 61

    def _pack(sim_state_k, acts, task, k0v, Kp):
        """(task_vec [10], acts_p [T, 9, Kp], state_packed [61, Kp])."""
        K_loc = acts.shape[0]
        s0 = jax.tree_util.tree_map(lambda x: x[0], sim_state_k)
        cAR0 = quat_to_rotmat(s0.body_quat[1]).reshape(9)
        rows = (
            [s0.q[i] for i in range(9)]
            + [s0.qd[i] for i in range(9)]
            + [s0.body_pos[0, i] for i in range(3)]
            + [s0.body_vel[0, i] for i in range(3)]
            + [s0.body_pos[1, i] for i in range(3)]
            + [s0.body_vel[1, i] for i in range(3)]
            + [s0.body_om[1, i] for i in range(3)]
            + [cAR0[i] for i in range(9)]
            + [s0.body_pos[2, i] for i in range(3)]
            + [s0.body_vel[2, i] for i in range(3)]
            + [s0.attached]
            + [s0.attach_pos[i] for i in range(3)]
            + [s0.attach_rot.reshape(9)[i] for i in range(9)]
        )
        state_packed = jnp.broadcast_to(
            jnp.stack(rows)[:, None], (_N_ROWS, Kp)
        ).astype(jnp.float32)

        acts_t = jnp.swapaxes(acts, 0, 1)  # [T, K_loc, 9]
        acts_p = jnp.zeros((T, 9, Kp), jnp.float32)
        acts_p = acts_p.at[:, :, :K_loc].set(jnp.swapaxes(acts_t, 1, 2))

        task_vec = jnp.concatenate(
            [
                task.task_id.astype(jnp.float32)[None],
                task.goal.astype(jnp.float32),
                k0v[None],
                task.zup_gate.astype(jnp.float32)[None],
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
        k0v = jnp.zeros((), jnp.float32) if k0 is None else jnp.asarray(k0, jnp.float32)
        task_vec, acts_p, state_packed = _pack(sim_state_k, acts, task, k0v, Kp)
        cost, tx, ty = call(task_vec, acts_p, state_packed)
        return _unpack(cost, tx, ty, K_loc)

    # batched variant: grid=(B,), per-batch task scalars via SmemRowView —
    # see pallas_rollout.py for the full rationale (this is what lets the
    # vmapped multi-seed runner keep the fused panda kernel)
    from m3p2i_aip_tpu.ops.pallas_kernels import SmemRowView

    _bcalls = {}

    def _get_batched_call(B: int, K_loc: int):
        key = (B, K_loc)
        if key not in _bcalls:
            Kp = _round_up(K_loc, 128)

            def panda_rollout_kernel_batched(task_ref, *refs):
                return _panda_kernel(
                    SmemRowView(task_ref, pl.program_id(0)), *refs, P=P
                )

            # batch as a LEADING SQUEEZED block dim (None): kernel refs keep
            # their single-program shapes; last-two block dims stay full
            # (Mosaic's 8/128-divisible-or-full constraint — see
            # pallas_rollout.py)
            _bcalls[key] = (
                pl.pallas_call(
                    panda_rollout_kernel_batched,
                    grid=(B,),
                    out_shape=(
                        jax.ShapeDtypeStruct((B, T, Kp), jnp.float32),
                        jax.ShapeDtypeStruct((B, T, Kp), jnp.float32),
                        jax.ShapeDtypeStruct((B, T, Kp), jnp.float32),
                    ),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((None, T, 9, Kp), lambda b: (b, 0, 0, 0)),
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
        cost, tx, ty = call(tv, ap, sp)  # [B, T, Kp] each
        ch, tps = jax.vmap(lambda c, x, y: _unpack(c, x, y, K_loc))(cost, tx, ty)
        return (ch, tps), (True, True)

    def rollout(sim_state_k, acts, task, k0=None):
        if k0 is None:
            return _rollout_cv(sim_state_k, acts, task)
        return _single(sim_state_k, acts, task, k0)

    return rollout
