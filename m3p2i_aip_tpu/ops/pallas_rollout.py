"""Pallas TPU kernel: the FULL point-env MPPI rollout in one program.

The XLA rollout (`MPPI._rollout`: lax.scan over T of the vmapped env step)
spends ~10 ms per replan at K=200 x T=15 — not on FLOPs but on hundreds of
tiny fusions shuttling [K, small] tensors through HBM every substep.  Here
the whole rollout lives in VMEM: K rides the lane axis, every physics
quantity is a [rows, K] vector register, and the T x substeps x pos_iters
loop nest runs inside a single kernel with zero HBM round-trips.

Semantics mirror models/point_env.step (point robot only) + the
PointObjective costs (cost_functions.py parity chain), including the
suction-force carry from the pull cost into the next step.  Numerical parity
with the XLA path is asserted by tests/test_pallas.py on TPU.

Layout: K padded to a multiple of 128 (f32 lanes).  D dynamic boxes and S
static boxes are unrolled in Python (both are tiny and static).
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
    pl = pltpu = None

from m3p2i_aip_tpu.ops.pallas_kernels import pallas_available

GRAVITY = 9.8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# lane-wise planar contact math (mirrors sim/pbd2d.py on [*, K] registers)
# ---------------------------------------------------------------------------


def _rot_to_local(dx, dy, c, s):
    """world delta -> box-local coords for box yaw with cos c / sin s."""
    return c * dx + s * dy, -s * dx + c * dy


def _rot_to_world(lx, ly, c, s):
    return c * lx - s * ly, s * lx + c * ly


def _circle_vs_obb(cx, cy, radius, bx, by, bc, bs, hx, hy):
    """Circle (center [1,K], scalar radius) vs oriented box (pose [1,K] or
    scalar consts; cos/sin bc/bs; half extents hx/hy scalars or [1,K]).

    Returns pen [1,K], world normal (nx, ny), world contact point (px, py).
    Mirrors pbd2d.circle_vs_obb.
    """
    lx, ly = _rot_to_local(cx - bx, cy - by, bc, bs)
    clx = jnp.clip(lx, -hx, hx)
    cly = jnp.clip(ly, -hy, hy)
    inside = (jnp.abs(lx) < hx) & (jnp.abs(ly) < hy)
    use_x = (jnp.abs(lx) / hx) >= (jnp.abs(ly) / hy)
    sgn_x = jnp.where(lx >= 0, 1.0, -1.0)
    sgn_y = jnp.where(ly >= 0, 1.0, -1.0)
    face_x = jnp.where(use_x, sgn_x * hx, lx)
    face_y = jnp.where(use_x, ly, sgn_y * hy)
    sx = jnp.where(inside, face_x, clx)
    sy = jnp.where(inside, face_y, cly)
    dx = lx - sx
    dy = ly - sy
    dist = jnp.sqrt(dx * dx + dy * dy)
    inv = 1.0 / jnp.maximum(dist, 1e-9)
    n_in_x = jnp.where(use_x, sgn_x, 0.0)
    n_in_y = jnp.where(use_x, 0.0, sgn_y)
    nlx = jnp.where(inside, n_in_x, dx * inv)
    nly = jnp.where(inside, n_in_y, dy * inv)
    pen = jnp.where(inside, radius + dist, radius - dist)
    nx, ny = _rot_to_world(nlx, nly, bc, bs)
    wx, wy = _rot_to_world(sx, sy, bc, bs)
    return pen, nx, ny, bx + wx, by + wy


def _resolve(
    pen, nx, ny, px, py,
    ax, ay, avx, avy, aom, wm_a, wi_a,
    bx, by, bvx, bvy, bom, wm_b, wi_b,
    h, friction, relax,
):
    """One Jacobi contact projection (mirrors pbd2d.resolve_contact).

    All args [1,K] or scalars.  Returns position/velocity corrections for A
    and B plus the equivalent force on A (fx, fy).
    """
    active = pen > 0.0
    d = jnp.where(active, pen, 0.0)
    rax, ray = px - ax, py - ay
    rbx, rby = px - bx, py - by
    ca = rax * ny - ray * nx
    cb = rbx * ny - rby * nx
    w_sum = wm_a + wi_a * ca * ca + wm_b + wi_b * cb * cb
    lam = relax * d / jnp.maximum(w_sum, 1e-9)

    dax, day = wm_a * lam * nx, wm_a * lam * ny
    dyaw_a = wi_a * lam * ca
    dbx, dby = -wm_b * lam * nx, -wm_b * lam * ny
    dyaw_b = -wi_b * lam * cb

    vax = avx - aom * ray
    vay = avy + aom * rax
    vbx = bvx - bom * rby
    vby = bvy + bom * rbx
    vrx, vry = vax - vbx, vay - vby
    vn = vrx * nx + vry * ny
    jn = jnp.where(active & (vn < 0), -vn / jnp.maximum(w_sum, 1e-9), 0.0)

    tx, ty = -ny, nx
    ta = rax * ty - ray * tx
    tb = rbx * ty - rby * tx
    wt_sum = wm_a + wi_a * ta * ta + wm_b + wi_b * tb * tb
    vt = vrx * tx + vry * ty
    jt_un = -vt / jnp.maximum(wt_sum, 1e-9)
    jt_max = friction * (jn + lam / h)
    jt = jnp.where(active, jnp.clip(jt_un, -jt_max, jt_max), 0.0)

    dvax = wm_a * (jn * nx + jt * tx)
    dvay = wm_a * (jn * ny + jt * ty)
    dom_a = wi_a * (jn * ca + jt * ta)
    dvbx = -wm_b * (jn * nx + jt * tx)
    dvby = -wm_b * (jn * ny + jt * ty)
    dom_b = -wi_b * (jn * cb + jt * tb)

    f = (jn + lam / h) / h
    return (
        dax, day, dyaw_a, dvax, dvay, dom_a,
        dbx, dby, dyaw_b, dvbx, dvby, dom_b,
        f * nx, f * ny,
    )


def _corner_pens(cx, cy, cc, cs, hxa, hya, bx, by, bc, bs, hxb, hyb):
    """Penetrations of A's 4 corners against box B's dominant face.

    Mirrors pbd2d.corners_vs_obb.  A pose lane-wise (cx..cs, half hxa/hya),
    B pose lane-wise or const.  Returns (pens [4 of [1,K]], corner world
    coords [4 of (x, y)], face normal (nx, ny) [1,K]).
    """
    clx, cly = _rot_to_local(cx - bx, cy - by, bc, bs)
    use_x = (jnp.abs(clx) / hxb) >= (jnp.abs(cly) / hyb)
    sgn = jnp.where(
        use_x,
        jnp.where(clx >= 0, 1.0, -1.0),
        jnp.where(cly >= 0, 1.0, -1.0),
    )
    half_axis = jnp.where(use_x, hxb, hyb)
    nlx = jnp.where(use_x, sgn, 0.0)
    nly = jnp.where(use_x, 0.0, sgn)
    nx, ny = _rot_to_world(nlx, nly, bc, bs)

    pens, corners = [], []
    for sxs, sys in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        ox, oy = _rot_to_world(sxs * hxa, sys * hya, cc, cs)
        wx, wy = cx + ox, cy + oy
        lx, ly = _rot_to_local(wx - bx, wy - by, bc, bs)
        local_a = jnp.where(use_x, lx, ly)
        sep_other = jnp.where(
            use_x, hyb - jnp.abs(ly), hxb - jnp.abs(lx)
        )
        pen_val = half_axis - sgn * local_a
        pen = jnp.where((pen_val > 0) & (sep_other > 0), pen_val, -1.0)
        pens.append(pen)
        corners.append((wx, wy))
    return pens, corners, (nx, ny)


# ---------------------------------------------------------------------------
# the rollout kernel
# ---------------------------------------------------------------------------


def _rollout_kernel(
    task_ref,  # SMEM [4]: task_id, goal_x, goal_y, k0 (global sample offset)
    acts_ref,  # VMEM [T, n_u, Kp]
    state_ref,  # VMEM [2*n_q + 6D, Kp]
    cost_ref,  # VMEM out [T, Kp]
    trajx_ref,  # VMEM out [T, Kp]
    trajy_ref,  # VMEM out [T, Kp]
    *,
    P,  # dict of static params (python/numpy)
):
    Kp = state_ref.shape[1]
    D, S = P["D"], P["S"]
    h = P["dt"] / P["substeps"]
    decay = P["decay"]
    wm_r = 1.0 / P["robot_mass"]
    rr = P["robot_radius"]

    # clip like the XLA dispatch (cost_functions.py lax.switch clip)
    task_id = jnp.clip(task_ref[0], 0.0, 3.0)
    gx = task_ref[1]
    gy = task_ref[2]
    k0 = task_ref[3]  # global sample offset of this shard (0 unsharded)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
    # mode split is GLOBAL-index based so a shard_map shard covering samples
    # [k0, k0+K_loc) keeps the reference's half-batch semantics (mppi.py:397-400)
    gcol = col.astype(jnp.float32) + k0
    mode1 = (gcol >= P["half_K"]) & (gcol < P["K"])  # second-half samples

    # robot base family (point_env.py robot_type): "point" (2-dof omni),
    # "heijn" (3-dof omni), "boxer" (2-wheel differential drive)
    n_q = P["n_q"]
    n_u = P["n_u"]
    rtype = P["robot_type"]

    # unpack state rows -> [1, Kp] registers
    def row(i):
        return state_ref[i : i + 1, :]

    qx, qy = row(0), row(1)
    qyaw = row(2) if n_q == 3 else jnp.zeros((1, Kp), jnp.float32)
    qdx, qdy = row(n_q), row(n_q + 1)
    qdyaw = row(n_q + 2) if n_q == 3 else jnp.zeros((1, Kp), jnp.float32)
    dp = []  # per dyn box: [x, y, yaw, vx, vy, om]
    for i in range(D):
        b = 2 * n_q + 6 * i
        dp.append([row(b), row(b + 1), row(b + 2), row(b + 3), row(b + 4), row(b + 5)])

    # suction ext-force carry (pull cost -> next step), zero at t=0
    ext_rx = jnp.zeros((1, Kp), jnp.float32)
    ext_ry = jnp.zeros((1, Kp), jnp.float32)
    ext_bx = jnp.zeros((1, Kp), jnp.float32)
    ext_by = jnp.zeros((1, Kp), jnp.float32)

    box = P["box_slot"]
    obs = P["dynobs_slot"]

    # time loop as fori_loop (NOT unrolled: the T x substeps x pos_iters x
    # contact-pass nest is ~10k vector statements per step already)
    def t_body(t, carry):
        (qx, qy, qyaw, qdx, qdy, qdyaw, flat_dp,
         ext_rx, ext_ry, ext_bx, ext_by) = carry
        dp = [list(flat_dp[6 * i : 6 * i + 6]) for i in range(D)]
        # actions arrive pre-scaled (the caller applies u_scale, matching
        # MPPI._command_halton's `u_scale * act_seq` at the _rollout boundary)
        u = [acts_ref[t, c : c + 1, :] for c in range(n_u)]
        f_obs_x = jnp.zeros((1, Kp), jnp.float32)
        f_obs_y = jnp.zeros((1, Kp), jnp.float32)

        for _ in range(P["substeps"]):
            # velocity integration + drive (point_env.py:288-312)
            qdx = qdx + ext_rx * (wm_r * h)
            qdy = qdy + ext_ry * (wm_r * h)
            if rtype == "boxer":
                # wheel speeds -> base twist (diff-drive, current yaw)
                v = P["wheel_radius"] * (u[0] + u[1]) * 0.5
                omt = P["wheel_radius"] * (u[1] - u[0]) / P["wheel_base"]
                tx_ = v * jnp.cos(qyaw)
                ty_ = v * jnp.sin(qyaw)
                qdx = tx_ + (qdx - tx_) * decay
                qdy = ty_ + (qdy - ty_) * decay
                qdyaw = omt + (qdyaw - omt) * decay
            else:
                qdx = u[0] + (qdx - u[0]) * decay
                qdy = u[1] + (qdy - u[1]) * decay
                if n_q == 3:  # heijn: world-frame yaw-rate channel
                    qdyaw = u[2] + (qdyaw - u[2]) * decay
            # robot speed cap (point_env.py:310-312): without it ±500 N
            # suction forces can tunnel the robot through wall junctions,
            # letting the planner pick physically impossible pull plans
            qsp = jnp.sqrt(qdx * qdx + qdy * qdy)
            qcap = jnp.minimum(1.0, 6.0 / jnp.maximum(qsp, 1e-9))
            qdx = qdx * qcap
            qdy = qdy * qcap
            for i in range(D):
                x, y, yaw, vx, vy, om = dp[i]
                if i == box:
                    vx = vx + ext_bx * (P["inv_mass"][i] * h)
                    vy = vy + ext_by * (P["inv_mass"][i] * h)
                # ground friction (pbd2d.ground_friction)
                speed = jnp.sqrt(vx * vx + vy * vy)
                scale = jnp.maximum(
                    0.0, 1.0 - P["mu_g"][i] * GRAVITY * h / jnp.maximum(speed, 1e-9)
                )
                vx, vy = vx * scale, vy * scale
                om_scale = jnp.maximum(
                    0.0,
                    1.0
                    - P["mu_g"][i] * GRAVITY * h
                    / jnp.maximum(jnp.abs(om) * P["ang_rad"][i], 1e-9),
                )
                om = om * om_scale
                sp = jnp.sqrt(vx * vx + vy * vy)
                cap = jnp.minimum(1.0, P["max_speed"] / jnp.maximum(sp, 1e-9))
                vx, vy = vx * cap, vy * cap
                # position integration
                x = x + vx * h
                y = y + vy * h
                yaw = yaw + om * h
                dp[i] = [x, y, yaw, vx, vy, om]
            qx = qx + qdx * h
            qy = qy + qdy * h
            if n_q == 3:
                qyaw = qyaw + qdyaw * h

            for _ in range(P["pos_iters"]):
                # pass 1: robot circle vs each dynamic box — Jacobi: all D
                # contacts evaluated from the PRE-pass robot pose, summed
                # corrections applied after (point_env.step pass 1 semantics)
                dqx = dqy = dqdx = dqdy = 0.0
                for i in range(D):
                    x, y, yaw, vx, vy, om = dp[i]
                    c, s = jnp.cos(yaw), jnp.sin(yaw)
                    pen, nx, ny, px, py = _circle_vs_obb(
                        qx, qy, rr, x, y, c, s, P["half"][i][0], P["half"][i][1]
                    )
                    out = _resolve(
                        pen, nx, ny, px, py,
                        qx, qy, qdx, qdy, 0.0, wm_r, 0.0,
                        x, y, vx, vy, om, P["inv_mass"][i], P["inv_inertia"][i],
                        h, (P["robot_friction"] + P["friction"][i]) / 2, 1.0,
                    )
                    dqx, dqy = dqx + out[0], dqy + out[1]
                    dqdx, dqdy = dqdx + out[3], dqdy + out[4]
                    dp[i] = [
                        x + out[6], y + out[7], yaw + out[8],
                        vx + out[9], vy + out[10], om + out[11],
                    ]
                    if i == obs:
                        f_obs_x = f_obs_x - out[12]
                        f_obs_y = f_obs_y - out[13]
                qx, qy = qx + dqx, qy + dqy
                qdx, qdy = qdx + dqdx, qdy + dqdy

                # pass 2: dynamic vs dynamic (corners of i in j), Jacobi
                if D > 1:
                    deltas = [[jnp.zeros((1, Kp), jnp.float32)] * 6 for _ in range(D)]
                    for i in range(D):
                        for j in range(D):
                            if i == j:
                                continue
                            xi, yi, yawi, vxi, vyi, omi = dp[i]
                            xj, yj, yawj, vxj, vyj, omj = dp[j]
                            ci, si = jnp.cos(yawi), jnp.sin(yawi)
                            cj, sj = jnp.cos(yawj), jnp.sin(yawj)
                            pens, corners, (nx, ny) = _corner_pens(
                                xi, yi, ci, si, P["half"][i][0], P["half"][i][1],
                                xj, yj, cj, sj, P["half"][j][0], P["half"][j][1],
                            )
                            for pen, (wx, wy) in zip(pens, corners):
                                out = _resolve(
                                    pen, nx, ny, wx, wy,
                                    xi, yi, vxi, vyi, omi,
                                    P["inv_mass"][i], P["inv_inertia"][i],
                                    xj, yj, vxj, vyj, omj,
                                    P["inv_mass"][j], P["inv_inertia"][j],
                                    h,
                                    (P["friction"][i] + P["friction"][j]) / 2,
                                    0.5,
                                )
                                di, dj = deltas[i], deltas[j]
                                deltas[i] = [
                                    di[0] + out[0], di[1] + out[1], di[2] + out[2],
                                    di[3] + out[3], di[4] + out[4], di[5] + out[5],
                                ]
                                deltas[j] = [
                                    dj[0] + out[6], dj[1] + out[7], dj[2] + out[8],
                                    dj[3] + out[9], dj[4] + out[10], dj[5] + out[11],
                                ]
                                if i == obs:
                                    f_obs_x = f_obs_x + out[12]
                                    f_obs_y = f_obs_y + out[13]
                                if j == obs:
                                    f_obs_x = f_obs_x - out[12]
                                    f_obs_y = f_obs_y - out[13]
                    for i in range(D):
                        x, y, yaw, vx, vy, om = dp[i]
                        d = deltas[i]
                        dp[i] = [
                            x + d[0], y + d[1], yaw + d[2],
                            vx + d[3], vy + d[4], om + d[5],
                        ]

                # pass 3: dynamic boxes vs static boxes (full strength,
                # per-corner corrections normalized by active-corner count)
                # — Jacobi: all S x 4 contacts from the pre-pass box pose,
                # summed corrections applied after (point_env.step pass 3)
                for i in range(D):
                    x, y, yaw, vx, vy, om = dp[i]
                    ci, si = jnp.cos(yaw), jnp.sin(yaw)
                    ddx = ddy = ddyaw = ddvx = ddvy = ddom = 0.0
                    for s_i in range(S):
                        sxc, syc, syaw = P["stat"][s_i]
                        sc, ss = float(np.cos(syaw)), float(np.sin(syaw))
                        pens, corners, (nx, ny) = _corner_pens(
                            x, y, ci, si, P["half"][i][0], P["half"][i][1],
                            sxc, syc, sc, ss,
                            P["stat_half"][s_i][0], P["stat_half"][s_i][1],
                        )
                        n_act = sum((pen > 0).astype(jnp.float32) for pen in pens)
                        relax = 1.0 / jnp.maximum(n_act, 1.0)
                        for pen, (wx, wy) in zip(pens, corners):
                            out = _resolve(
                                pen, nx, ny, wx, wy,
                                x, y, vx, vy, om,
                                P["inv_mass"][i], P["inv_inertia"][i],
                                sxc, syc, 0.0, 0.0, 0.0, 0.0, 0.0,
                                h,
                                (P["friction"][i] + P["stat_friction"][s_i]) / 2,
                                relax,
                            )
                            ddx, ddy, ddyaw = ddx + out[0], ddy + out[1], ddyaw + out[2]
                            ddvx, ddvy, ddom = ddvx + out[3], ddvy + out[4], ddom + out[5]
                            if i == obs:
                                f_obs_x = f_obs_x + out[12]
                                f_obs_y = f_obs_y + out[13]
                    dp[i] = [x + ddx, y + ddy, yaw + ddyaw,
                             vx + ddvx, vy + ddvy, om + ddom]

                # pass 4: robot circle vs static boxes — Jacobi across S
                dqx = dqy = dqdx = dqdy = 0.0
                for s_i in range(S):
                    sxc, syc, syaw = P["stat"][s_i]
                    sc, ss = float(np.cos(syaw)), float(np.sin(syaw))
                    pen, nx, ny, px, py = _circle_vs_obb(
                        qx, qy, rr, sxc, syc, sc, ss,
                        P["stat_half"][s_i][0], P["stat_half"][s_i][1],
                    )
                    out = _resolve(
                        pen, nx, ny, px, py,
                        qx, qy, qdx, qdy, 0.0, wm_r, 0.0,
                        sxc, syc, 0.0, 0.0, 0.0, 0.0, 0.0,
                        h, (P["robot_friction"] + P["stat_friction"][s_i]) / 2, 1.0,
                    )
                    dqx, dqy = dqx + out[0], dqy + out[1]
                    dqdx, dqdy = dqdx + out[3], dqdy + out[4]
                qx, qy = qx + dqx, qy + dqy
                qdx, qdy = qdx + dqdx, qdy + dqdy

                # pass 5: robot vs dynamic again (immovable) — Jacobi across D
                dqx = dqy = dqdx = dqdy = 0.0
                for i in range(D):
                    x, y, yaw, vx, vy, om = dp[i]
                    c, s = jnp.cos(yaw), jnp.sin(yaw)
                    pen, nx, ny, px, py = _circle_vs_obb(
                        qx, qy, rr, x, y, c, s, P["half"][i][0], P["half"][i][1]
                    )
                    out = _resolve(
                        pen, nx, ny, px, py,
                        qx, qy, qdx, qdy, 0.0, wm_r, 0.0,
                        x, y, vx, vy, om, 0.0, 0.0,
                        h, 0.0, 1.0,
                    )
                    dqx, dqy = dqx + out[0], dqy + out[1]
                    dqdx, dqdy = dqdx + out[3], dqdy + out[4]
                qx, qy = qx + dqx, qy + dqy
                qdx, qdy = qdx + dqdx, qdy + dqdy

            # closed-arena invariant (point_env.py arena_bound clamp)
            if P["arena_bound"] > 0.0:
                lim = P["arena_bound"] - rr
                qx = jnp.clip(qx, -lim, lim)
                qy = jnp.clip(qy, -lim, lim)

        # ------------------------------------------------------------- cost
        # (parity: PointObjective.compute; mode flag = second half of K)
        n_norm = P["substeps"] * P["pos_iters"]
        coll = jnp.abs(f_obs_x / n_norm) + jnp.abs(f_obs_y / n_norm)
        motion_cost = jnp.where(coll > 0.1, 1000.0, 0.0)

        bx_, by_ = dp[box][0], dp[box][1]
        r2bx, r2by = qx - bx_, qy - by_
        b2gx, b2gy = gx - bx_, gy - by_
        d_rb = jnp.sqrt(r2bx * r2bx + r2by * r2by)
        d_bg = jnp.sqrt(b2gx * b2gx + b2gy * b2gy)
        dist_cost = d_rb + d_bg * 10.0
        cos_theta = (r2bx * b2gx + r2by * b2gy) / jnp.maximum(d_rb * d_bg, 1e-9)

        nav = jnp.sqrt((qx - gx) ** 2 + (qy - gy) ** 2) + motion_cost
        push = 3.0 * dist_cost + jnp.maximum(cos_theta, 0.0)

        # pull: suction force (rollout threshold 1.8), velocity + align costs
        pdx, pdy = bx_ - qx, by_ - qy  # robot -> block
        towards = (qdx * pdx + qdy * pdy) > 0.0
        mag = 1.0 / jnp.maximum(d_rb, 1e-6)
        gate = (mag > 1.8).astype(jnp.float32)
        fx = jnp.clip(-P["kp_suction"] * pdx * mag * gate, -500.0, 500.0)
        fy = jnp.clip(-P["kp_suction"] * pdy * mag * gate, -500.0, 500.0)
        off = towards
        if P["multi_modal"]:
            off = off | ~mode1  # mode 0 (push half) gets no suction
        s_bx = jnp.where(off, 0.0, fx)
        s_by = jnp.where(off, 0.0, fy)
        s_rx = jnp.where(off, 0.0, -fx)
        s_ry = jnp.where(off, 0.0, -fy)
        vel_cost = jnp.where(towards & (d_rb <= 0.5), 0.6, 0.0)
        # wall-crush penalty (extension, mirrors PointObjective._wall_crush):
        # max robot-circle penetration into the statics
        crush_pen = jnp.full((1, Kp), -1e9, jnp.float32)
        for s_i in range(S):
            sxc, syc, syaw = P["stat"][s_i]
            sc, ss = float(np.cos(syaw)), float(np.sin(syaw))
            penw, _, _, _, _ = _circle_vs_obb(
                qx, qy, rr, sxc, syc, sc, ss,
                P["stat_half"][s_i][0], P["stat_half"][s_i][1],
            )
            crush_pen = jnp.maximum(crush_pen, penw)
        if P["arena_bound"] > 0.0:
            # boundary contact counts as crush (PointObjective._pull)
            lim_e = P["arena_bound"] - rr - 0.005
            at_edge = jnp.maximum(jnp.abs(qx), jnp.abs(qy)) > lim_e
            crush_pen = jnp.where(at_edge, 1.0, crush_pen)
        crush = jnp.where(crush_pen > 0.02, 1000.0, 0.0)
        pull = (3.0 * dist_cost + 3.0 * vel_cost
                + 7.0 * jnp.maximum(-cos_theta, 0.0) + crush)

        pp = jnp.where(mode1, pull, push)

        is_nav = (task_id == 0).astype(jnp.float32)
        is_push = (task_id == 1).astype(jnp.float32)
        is_pull = (task_id == 2).astype(jnp.float32)
        is_pp = (task_id == 3).astype(jnp.float32)
        cost = is_nav * nav + is_push * push + is_pull * pull + is_pp * pp

        # ext forces for the NEXT step: pull applies them to every sample
        # (mode-gated inside `off` when multi-modal); push_pull applies them
        # to the pull half only (cost_functions.py:62-89 + the push_pull
        # mode-masked ext in PointObjective.compute)
        sel = is_pull + is_pp * mode1.astype(jnp.float32)
        ext_bx = s_bx * sel
        ext_by = s_by * sel
        ext_rx = s_rx * sel
        ext_ry = s_ry * sel

        cost_ref[pl.ds(t, 1), :] = cost
        trajx_ref[pl.ds(t, 1), :] = qx
        trajy_ref[pl.ds(t, 1), :] = qy
        flat_out = tuple(v for b in dp for v in b)
        return (qx, qy, qyaw, qdx, qdy, qdyaw, flat_out,
                ext_rx, ext_ry, ext_bx, ext_by)

    init_flat = tuple(v for b in dp for v in b)
    jax.lax.fori_loop(
        0,
        P["T"],
        t_body,
        (qx, qy, qyaw, qdx, qdy, qdyaw, init_flat,
         ext_rx, ext_ry, ext_bx, ext_by),
    )


def make_point_rollout(
    env_params,
    kp_suction: float,
    K: int,
    T: int,
    multi_modal: bool,
    interpret: bool = False,
):
    """Build the fused rollout callable for a point-robot scene.

    Returns ``rollout(sim_state_k, acts, task) -> (cost_horizon [K, T],
    traj_points [K, T, 2])`` — a drop-in for ``MPPI._rollout`` (acts arrive
    already u_scale-scaled).  All K rollouts must start from the same state
    (the planner broadcasts the real state, reactive_tamp.py:45-48 parity).
    Returns None when Pallas/TPU or the scene shape is unsupported.
    ``interpret=True`` builds the kernel for the Pallas interpreter so the
    CPU suite can check kernel-vs-XLA cost/trajectory parity without a TPU
    (single-sources the drift check the TPU-gated tests otherwise own).
    """
    if not (
        (pallas_available() or interpret)
        and env_params.robot_type in ("point", "heijn", "boxer")
    ):
        return None

    D = int(env_params.dyn_half.shape[0])
    S = int(env_params.stat_pos.shape[0])
    names = list(env_params.actor_names)
    if "box" not in names or "dyn-obs" not in names:
        return None
    box_slot = env_params.dyn_actor_idx.index(names.index("box"))
    dynobs_slot = env_params.dyn_actor_idx.index(names.index("dyn-obs"))

    half = np.asarray(env_params.dyn_half)
    stat_pos = np.asarray(env_params.stat_pos)
    stat_yaw = np.asarray(env_params.stat_yaw)
    stat_half = np.asarray(env_params.stat_half)

    P = dict(
        D=D,
        S=S,
        T=T,
        K=K,
        half_K=K // 2,
        dt=float(env_params.dt),
        substeps=int(env_params.substeps),
        pos_iters=int(env_params.pos_iters),
        decay=float(np.exp(-env_params.drive_rate * env_params.dt / env_params.substeps)),
        robot_mass=float(env_params.robot_mass),
        robot_radius=float(env_params.robot_radius),
        robot_friction=float(env_params.robot_friction),
        max_speed=float(env_params.max_dyn_speed),
        half=[(float(half[i, 0]), float(half[i, 1])) for i in range(D)],
        inv_mass=[float(x) for x in np.asarray(env_params.dyn_inv_mass)],
        inv_inertia=[float(x) for x in np.asarray(env_params.dyn_inv_inertia)],
        mu_g=[float(x) for x in np.asarray(env_params.dyn_mu_ground)],
        ang_rad=[float(x) for x in np.mean(half, axis=-1)],
        friction=[float(x) for x in np.asarray(env_params.dyn_friction)],
        stat=[(float(stat_pos[i, 0]), float(stat_pos[i, 1]), float(stat_yaw[i])) for i in range(S)],
        stat_friction=[float(x) for x in np.asarray(env_params.stat_friction)],
        stat_half=[(float(stat_half[i, 0]), float(stat_half[i, 1])) for i in range(S)],
        box_slot=box_slot,
        dynobs_slot=dynobs_slot,
        multi_modal=bool(multi_modal),
        kp_suction=float(kp_suction),
        robot_type=env_params.robot_type,
        arena_bound=float(env_params.arena_bound),
        n_q=3 if env_params.robot_type in ("heijn", "boxer") else 2,
        n_u=3 if env_params.robot_type == "heijn" else 2,
        wheel_radius=float(env_params.wheel_radius),
        wheel_base=float(env_params.wheel_base),
    )
    # pallas_call construction is memoized per LOCAL sample count so the same
    # rollout callable works unsharded (K_loc == K) and inside a shard_map
    # shard (K_loc == K / mesh_size) — SURVEY.md §2.2 "rollout batch
    # parallelism ... optionally shard_map/pjit over a sample-axis mesh".
    _calls = {}

    def _get_call(K_loc: int):
        if K_loc not in _calls:
            Kp = _round_up(K_loc, 128)
            # a NAMED closure, not functools.partial: pallas derives the
            # kernel / mosaic module name from the callable, and a partial
            # stringifies with its memory address — which made the
            # persistent-compilation-cache key unstable across processes
            # (every run recompiled the fused tick)
            def point_rollout_kernel(*refs):
                return _rollout_kernel(*refs, P=P)

            _calls[K_loc] = (
                pl.pallas_call(
                    point_rollout_kernel,
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

    def rollout(sim_state_k, acts, task, k0=None):
        """``k0`` = this shard's global sample offset (None/0 unsharded)."""
        K_loc = acts.shape[0]
        call, Kp = _get_call(K_loc)
        # single start state (all K identical by construction)
        s0 = jax.tree_util.tree_map(lambda x: x[0], sim_state_k)
        n_q, n_u = P["n_q"], P["n_u"]
        rows = [s0.q[i] for i in range(n_q)] + [s0.qd[i] for i in range(n_q)]
        for i in range(D):
            rows += [
                s0.dyn_pos[i, 0], s0.dyn_pos[i, 1], s0.dyn_yaw[i],
                s0.dyn_vel[i, 0], s0.dyn_vel[i, 1], s0.dyn_om[i],
            ]
        state_packed = jnp.broadcast_to(
            jnp.stack(rows)[:, None], (2 * n_q + 6 * D, Kp)
        ).astype(jnp.float32)

        acts_t = jnp.swapaxes(acts, 0, 1)  # [T, K_loc, nu]
        acts_p = jnp.zeros((T, n_u, Kp), jnp.float32)
        acts_p = acts_p.at[:, :, :K_loc].set(jnp.swapaxes(acts_t, 1, 2))

        k0v = jnp.zeros((), jnp.float32) if k0 is None else jnp.asarray(k0, jnp.float32)
        task_vec = jnp.stack(
            [task.task_id.astype(jnp.float32), task.goal[0], task.goal[1], k0v]
        )

        cost, tx, ty = call(task_vec, acts_p, state_packed)
        cost_horizon = jnp.swapaxes(cost[:, :K_loc], 0, 1)  # [K_loc, T]
        tps = jnp.stack([tx[:, :K_loc], ty[:, :K_loc]], axis=-1)
        return cost_horizon, jnp.swapaxes(tps, 0, 1)

    return rollout
