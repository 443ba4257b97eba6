"""Task-indexed running costs over sim state — pure JAX, per-env formulation.

Parity target: ``src/m3p2i_aip/planners/motion_planner/cost_functions.py``.
Key architectural inversions vs the reference (SURVEY.md §7 "Hard parts"):

  * The reference's costs read a live, mutable sim and the pull cost even
    *applies suction forces to it* as a side effect (cost_functions.py:71-76).
    Here every cost is a pure function ``(state, u, task, mode) ->
    (cost, ext_forces)``; the returned forces are threaded by the planner into
    the *next* dynamics step — identical timing to the reference, where forces
    set during cost evaluation act on the following ``sim.step()``.

  * Costs are written per-env and vmapped by the planner; the reference's
    half-batch mode split (``[:half_K]`` / ``[half_K:]``,
    cost_functions.py:27-29, 74-75, 107-108, 150-154) becomes a per-sample
    ``mode`` flag (0 = first half / push / top-grasp, 1 = second half / pull /
    tilted-grasp), which is also what lets the mode axis shard over a device
    mesh.

  * Task selection is a traced integer driving ``lax.switch`` instead of
    python string dispatch (cost_functions.py:19-36), so the whole planner
    step stays compiled across task switches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from m3p2i_aip_tpu.models import panda_env as pa
from m3p2i_aip_tpu.models import point_env as pe
from m3p2i_aip_tpu.ops import (
    general_ori_cube2goal,
    general_ori_ee2cube_mat,
)
from m3p2i_aip_tpu.planners.motion_planner.mppi import TaskParams
from m3p2i_aip_tpu.utils.skill_utils import calculate_suction


class PointObjective:
    """navigation / push / pull / push_pull costs for the point env.

    ``compute(state, u, task, mode)`` returns (cost, PointExtForces).
    """

    def __init__(self, params: pe.PointEnvParams, cfg):
        self.params = params
        self.multi_modal = bool(cfg.multi_modal)
        self.kp_suction = float(cfg.kp_suction)
        # rollout suction gate 1/dist > 1.8 (skill_utils.py:79-82)
        self.suction_threshold = 1.8
        # extension gate: continuous diff-drive push alignment (see _push);
        # mppi=boxer_parity sets False to measure the reference formula
        self.boxer_continuous_align = bool(
            getattr(cfg.mppi, "boxer_continuous_align", True)
        )
        names = list(params.actor_names)
        self.box_dyn_slot = params.dyn_actor_idx.index(names.index("box"))
        self.dynobs_actor = names.index("dyn-obs")

    # -- state accessors (parity: isaacgym_wrapper getters :120-188) --------
    def _box_pos(self, state: pe.PointEnvState):
        return state.dyn_pos[self.box_dyn_slot]

    def _dist_terms(self, state, goal):
        """Parity: Objective.calculate_dist (cost_functions.py:41-50)."""
        block_pos = self._box_pos(state)
        robot_to_block = state.q[:2] - block_pos
        block_to_goal = goal - block_pos
        d_rb = jnp.linalg.norm(robot_to_block)
        d_bg = jnp.linalg.norm(block_to_goal)
        dist_cost = d_rb + d_bg * 10.0
        cos_theta = jnp.sum(robot_to_block * block_to_goal) / jnp.maximum(
            d_rb * d_bg, 1e-9
        )
        return dist_cost, cos_theta, block_pos, d_rb

    def _motion_cost(self, state):
        """Binarized dyn-obs contact (cost_functions.py:158-170, point branch)."""
        f = state.contact_force[self.dynobs_actor]
        coll = jnp.sum(jnp.abs(f[:2]))
        return jnp.where(coll > 0.1, 1000.0, 0.0)

    def _navigation(self, state, goal):
        return jnp.linalg.norm(state.q[:2] - goal) + self._motion_cost(state)

    def _push(self, state, goal):
        dist_cost, cos_theta, _, _ = self._dist_terms(state, goal)
        if self.params.robot_type == "boxer" and self.boxer_continuous_align:
            # Continuous side alignment for the diff-drive base: the
            # reference's one-sided max(cos, 0) penalty is flat everywhere
            # except between box and goal, so a nonholonomic robot parked
            # BESIDE the box (cos ~ 0) gets no reward for partially
            # circling to the push side — the repositioning arc (~1.6 s)
            # exceeds the lookahead and the planner sits in a fixed point
            # (measured: pure push 1/20, corner hybrid 9/20 at T=30).
            # 1 + cos is 0 at the ideal push pose and grows smoothly to 2
            # between box and goal: every step around the box pays off.
            align = 1.5 * (1.0 + cos_theta)
        else:
            align = jnp.maximum(cos_theta, 0.0)  # (cost_functions.py:57-58)
        return 3.0 * dist_cost + 1.0 * align

    def _wall_crush(self, state):
        """Max penetration of the robot circle into the static geometry.

        Extension (not in the reference): pulling a box into a zero-clearance
        wall pocket forces the robot into the wall — a physically impossible
        plan that PhysX would reject via contact forces.  Penalizing it in
        the pull cost makes the M3P2I arbitration prefer push near walls.
        """
        from m3p2i_aip_tpu.sim import pbd2d

        S = self.params.stat_pos.shape[0]
        c = pbd2d.circle_vs_obb(
            jnp.broadcast_to(state.q[:2], (S, 2)),
            self.params.robot_radius,
            self.params.stat_pos,
            self.params.stat_yaw,
            self.params.stat_half,
        )
        return jnp.max(c.pen)

    def _pull(self, state, goal, mode):
        dist_cost, cos_theta, block_pos, d_rb = self._dist_terms(state, goal)
        pos_dir = block_pos - state.q[:2]
        towards_block = jnp.sum(state.qd[:2] * pos_dir) > 0.0

        f_box, f_robot = calculate_suction(
            block_pos, state.q[:2], self.kp_suction, self.suction_threshold
        )
        # no suction when moving toward the block (cost_functions.py:72-73)
        off = towards_block
        if self.multi_modal:
            # mode 0 (push half) gets no suction (cost_functions.py:74-75)
            off = off | (mode == 0)
        f_box = jnp.where(off, 0.0, f_box)
        f_robot = jnp.where(off, 0.0, f_robot)

        align = jnp.maximum(-cos_theta, 0.0)  # (cost_functions.py:81-82)
        vel_cost = jnp.where(towards_block & (d_rb <= 0.5), 0.6, 0.0)
        crush_pen = self._wall_crush(state)
        # the arena clamp (point_env.py arena_bound) stops wall penetration,
        # so a squeezed robot now reads pen==0 while pinned at the boundary —
        # count boundary contact itself as crush or the arbitration never
        # vetoes pulls into zero-clearance pockets.  5 cm margin: box<->robot
        # contact can hold the puller ~2 cm off its pin limit (measured on
        # the boxer), so a contact-tight margin never fires
        if float(self.params.arena_bound) > 0.0:
            lim = float(self.params.arena_bound) - float(self.params.robot_radius)
            at_edge = jnp.max(jnp.abs(state.q[:2])) > lim - 0.05
            crush_pen = jnp.where(at_edge, 1.0, crush_pen)
            if self.multi_modal and self.params.robot_type == "boxer":
                # Pocket-goal endgame veto (diff-drive only): completing a
                # pull at a goal within one box-face + robot-diameter of the
                # boundary requires the robot to occupy the zero-clearance
                # strip between box and wall.  Flip the arbitration to push
                # while the robot still has room to swing around the box —
                # the positional at_edge veto alone fires only after a
                # nonholonomic base is already wedged (measured: boxer
                # freezes in the pocket, 1/20).  Holonomic bases slide out
                # of the pocket fine and pull 3x faster than the early
                # flip (point: tick 46 vs 137), so they keep the deep pull.
                # Multi-modal only: with no push half to flip to, a vetoed
                # pull is worse than a try.
                rr = float(self.params.robot_radius)
                pocket_lim = float(self.params.arena_bound) - (
                    2.0 * rr + self.params.dyn_half[self.box_dyn_slot, 0]
                )
                goal_in_pocket = jnp.max(jnp.abs(goal)) > pocket_lim
                d_bg = jnp.linalg.norm(goal - block_pos)
                crush_pen = jnp.where(
                    goal_in_pocket & (d_bg < 1.0), 1.0, crush_pen
                )
        crush = jnp.where(crush_pen > 0.02, 1000.0, 0.0)
        cost = 3.0 * dist_cost + 3.0 * vel_cost + 7.0 * align + crush

        D = self.params.dyn_half.shape[0]
        ext = pe.PointExtForces(
            robot=f_robot,
            dyn=jnp.zeros((D, 2)).at[self.box_dyn_slot].set(f_box),
        )
        return cost, ext

    def compute(self, state: pe.PointEnvState, u, task: TaskParams, mode):
        """Task dispatch. Parity: Objective.compute_cost (cost_functions.py:19-36):
        only navigation adds the motion cost; push/pull return bare."""
        goal = task.goal[:2]
        zero_ext = pe.zero_ext(self.params)

        def nav(_):
            return self._navigation(state, goal), zero_ext

        def push(_):
            return self._push(state, goal), zero_ext

        def pull(_):
            return self._pull(state, goal, mode)

        def push_pull(_):
            c_push, _ = push(None)
            c_pull, ext = pull(None)
            cost = jnp.where(mode == 0, c_push, c_pull)
            ext = jax.tree_util.tree_map(
                lambda z, e: jnp.where(mode == 0, z, e), zero_ext, ext
            )
            return cost, ext

        # reposition (id 8: drive to a standoff pose during the diff-drive
        # pocket endgame) runs the navigation cost; it is excluded from the
        # success gates instead (task_planner.check_task_success,
        # reactive_tamp._success_device)
        tid = jnp.where(task.task_id == 8, 0, jnp.clip(task.task_id, 0, 3))
        return jax.lax.switch(tid, [nav, push, pull, push_pull], None)


class PandaObjective:
    """reach / pick / place costs for the panda env.

    Parity: cost_functions.py:91-170 (panda branches).  Deviation noted:
    the reference aims every rollout at env-0's cube position
    (cost_functions.py:97, 102-103 index ``cube_state[0]``); here each rollout
    uses its own cube state, which is the intended semantics (all envs share
    the synced state at rollout start anyway).
    """

    def __init__(self, params: pa.PandaEnvParams, cfg):
        self.params = params
        self.multi_modal = bool(cfg.multi_modal)
        self.pre_height_diff = float(cfg.pre_height_diff)
        self.tilt_cos_theta = 0.5
        names = list(params.actor_names)
        self.cubeA_slot = 1  # _DYN_NAMES order
        self.cubeB_slot = 2
        self.table_actor = names.index("table")
        self.shelf_actor = names.index("shelf_stand")
        self.cubeB_actor = names.index("cubeB")

    def _fk(self, state):
        from m3p2i_aip_tpu.models import panda_fk

        return panda_fk.fk(state.q, self.params.base_pos)

    def _motion_cost(self, state):
        """Parity: get_motion_cost panda branch (cost_functions.py:161-170)."""
        f = (
            state.contact_force[self.table_actor]
            + 4.0 * state.contact_force[self.shelf_actor]
            + state.contact_force[self.cubeB_actor]
        )
        coll = jnp.sum(jnp.abs(f[:2]))
        return jnp.where(coll > 0.1, 1000.0, 0.0)

    def _reach(self, state, mode):
        links = self._fk(state)
        ee_pos, ee_rot = links["ee"]
        cube_pos = state.body_pos[self.cubeA_slot]
        cube_quat = state.body_quat[self.cubeA_slot]

        top_goal = cube_pos.at[2].add(self.pre_height_diff)
        if self.multi_modal:
            tilt = self.tilt_cos_theta
            side_goal = cube_pos.at[0].add(-self.pre_height_diff * tilt)
            side_goal = side_goal.at[2].add(
                self.pre_height_diff * (1 - tilt**2) ** 0.5
            )
            goal = jnp.where(mode == 0, top_goal, side_goal)
            tilt_cost = jnp.where(
                mode == 0,
                general_ori_ee2cube_mat(ee_rot, cube_quat, tilt_value=0.0),
                general_ori_ee2cube_mat(ee_rot, cube_quat, tilt_value=tilt),
            )
        else:
            goal = top_goal
            tilt_cost = general_ori_ee2cube_mat(ee_rot, cube_quat, tilt_value=0.0)
        reach_cost = jnp.linalg.norm(ee_pos - goal)
        return 10.0 * reach_cost + 3.0 * tilt_cost

    def _pick(self, state, task):
        cube_pos = state.body_pos[self.cubeA_slot]
        cube_quat = state.body_quat[self.cubeA_slot]
        goal_cost = jnp.linalg.norm(task.goal[:3] - cube_pos)
        ori_cost = general_ori_cube2goal(cube_quat, task.goal[3:7])
        # re-grasp term (extension, zero while the cube is held): the
        # reference's pick cost has no EE term because PhysX friction grasps
        # over a wide basin; our attach needs the fingertip within 5 cm of
        # the cube center, and a missed/lost grasp otherwise leaves the arm
        # with NO gradient back to the cube (observed: shelf seeds stalled
        # in pick with the EE drifting away)
        ee_pos, _ = self._fk(state)["ee"]
        regrasp = (
            10.0 * jnp.linalg.norm(ee_pos - cube_pos) * (1.0 - state.attached)
        )
        # wedge gate: the z-up potential must not reshape NORMAL descents
        # past an obstacle (that measurably caused place-gate crossings at a
        # larger lateral offset -> released cube slides off the stack).  A
        # per-rollout-state velocity test cannot tell a wedge from contact
        # jitter (a wedged cube RATTLES at 0.2-0.5 m/s; measured shelf seeds
        # 106/115 never latched a <0.05 gate) — so the gate is TRACED task
        # data: the symbolic layer flags the pick as wedged when goal
        # progress stalls with the cube attached (task.zup_gate)
        return (
            10.0 * goal_cost + 15.0 * ori_cost + regrasp
            + self._motion_cost(state)
            + 30.0 * self._zup_clearance(state) * state.attached * task.zup_gate
        )

    def _zup_clearance(self, state):
        """Height deficit of the HELD cube wedged beside a static obstacle.

        Extension (z-up potential, TODO round-2): the contact-cost plateau
        can wedge the held cube against the shelf stand's side — every
        sampled nudge still touches, so the binarized motion cost gives no
        gradient and ~1 shelf seed in 20 stalls there.  When the cube
        horizontally overlaps a static's (expanded) footprint while its
        bottom is below that static's top + 2 cm — wedged beside it OR
        dragging ON its surface (a cube stuck resting on the shelf pays the
        x4 shelf contact cost on every lateral slide sample; measured: seed
        103 parked at 4 mm resting penetration with the stall gate on and
        nothing shaping the lift) — prefer height until it clears.  The
        2 cm band cannot reshape normal descents: the term is live only
        while the stall gate is on, and a carried cube rides >= 3 cm above
        the support top (pre-place height) outside genuine stalls."""
        cube = state.body_pos[self.cubeA_slot]
        half = self.params.body_half[self.cubeA_slot]
        lo = self.params.stat_min  # [S, 3]
        hi = self.params.stat_max
        overlap = (
            (cube[0] > lo[:, 0] - half[0])
            & (cube[0] < hi[:, 0] + half[0])
            & (cube[1] > lo[:, 1] - half[1])
            & (cube[1] < hi[:, 1] + half[1])
        )
        wedged = (cube[2] - half[2] - 0.02) < hi[:, 2]
        needed = jnp.maximum(hi[:, 2] + half[2] + 0.02 - cube[2], 0.0)
        return jnp.max(jnp.where(overlap & wedged, needed, 0.0))

    def _place(self, state):
        links = self._fk(state)
        lf, _ = links["leftfinger"]
        rf, _ = links["rightfinger"]
        gripper_dist = jnp.linalg.norm(lf - rf)
        return 2.0 * (1.0 - gripper_dist)

    def compute(self, state: pa.PandaEnvState, u, task: TaskParams, mode):
        ext = pa.zero_ext(self.params)

        def reach(_):
            return self._reach(state, mode)

        def pick(_):
            return self._pick(state, task)

        def place(_):
            return self._place(state)

        # panda task ids 4/5/6 -> branch 0/1/2
        idx = jnp.clip(task.task_id - 4, 0, 2)
        cost = jax.lax.switch(idx, [reach, pick, place], None)
        return cost, ext


class AlbertObjective:
    """ee_reach / navigation costs for the albert mobile manipulator.

    No reference equivalent (the reference ships only the albert asset,
    assets/urdf/albert/albert.urdf); the ``ee_reach`` task demands coordinated
    base + arm motion: drive the end effector to a 3D goal the arm alone
    cannot span from the start pose.
    """

    def __init__(self, params, cfg):
        self.params = params
        # contact envelope: robot footprint + box half — ALL the push_reach
        # geometry thresholds below derive from this one radius so a scene
        # with a different box (size-noise randomization, new YAML) moves
        # them together instead of leaving stale magic numbers
        box_half = (
            float(np.mean(np.asarray(params.box_half)))
            if getattr(params, "has_box", False)
            else 0.2
        )
        self.contact_r = float(params.base_radius) + box_half
        self.approach_r = self.contact_r + 0.03  # approach shaping boundary
        self.hover_gate_r = self.contact_r + 0.05  # hover reweight midpoint
        self.clearance_r = self.contact_r + 0.10  # reposition keep-out

    def compute(self, state, u, task: TaskParams, mode):
        from m3p2i_aip_tpu.models import albert

        ee_pos, _ = albert.fk(state)["ee"]
        ee_cost = 10.0 * jnp.linalg.norm(ee_pos - task.goal[:3])
        nav_cost = jnp.linalg.norm(state.q[:2] - task.goal[:2])
        # base-progress shaping: ranks wheel samples independently of arm
        # noise (the EE term alone lets arm wiggle drown the wheel signal,
        # deadlocking the diff-drive base on the null-action sample)
        base_cost = 3.0 * jnp.linalg.norm(state.q[:2] - task.goal[:2])

        # push_reach (task_id 9): shove the box to goal[:2] with the BASE
        # while the ARM keeps the end effector hovering over the moving box
        # at height goal[2] — base and arm are coupled through the contact
        # (every wheel sample that moves the box drags the EE target with
        # it).  Push shaping mirrors the boxer push cost: dist terms per
        # PointObjective._dist_terms, continuous side alignment for the
        # diff-drive base.
        r2b = state.box_pos - state.q[:2]
        b2g = task.goal[:2] - state.box_pos
        d_rb = jnp.linalg.norm(r2b)
        d_bg = jnp.linalg.norm(b2g)
        cos_theta = jnp.sum(-r2b * b2g) / jnp.maximum(d_rb * d_bg, 1e-9)
        # approach shaping: outside the contact envelope (contact_r =
        # base_radius + box half, derived in __init__) the wheel signal must
        # beat the arm-noise-induced hover spread or the base parks on the
        # null-action sample exactly like the documented ee_reach deadlock.
        # Measured (r4d diag, seed 5): with hover at weight 5 and no shaping
        # the base parks at d_rb=0.81 — precisely where the hover target
        # first comes into arm reach — and the box never moves for 400
        # ticks.  The extra term is zero once in contact so it never fights
        # the push itself.
        approach = 5.0 * jnp.maximum(d_rb - self.approach_r, 0.0)
        push_cost = (
            3.0 * (d_rb + d_bg * 10.0) + 1.5 * (1.0 + cos_theta) + approach
        )
        hover = jnp.concatenate(
            [state.box_pos, task.goal[2:3]]
        )  # EE target rides the box
        # contact-gated hover weight, 1.5 far -> 4.0 in contact (was a flat
        # 5.0): outside contact the hover's sample spread (7 arm channels at
        # sigma 0.8) drowned the 3/m wheel gradient in the softmax weights —
        # the parking deadlock above — so the weight stays low during the
        # approach; once pushing, the 30/m box-progress term dominates the
        # ranking, so a tight hover is affordable exactly where the task
        # wants it (the logged ee error is the final tick of an active push)
        hover_w = 1.5 + 2.5 * jax.nn.sigmoid((self.hover_gate_r - d_rb) / 0.03)
        hover_cost = hover_w * jnp.linalg.norm(ee_pos - hover)

        # reposition (task_id 8): navigate AROUND the box to the standoff —
        # the bare nav cost let the 0.35 m base plow straight through it
        # (r4d diag: every reposition leg moved the box AWAY from the goal,
        # d_bg 1.22 -> 2.06 over four recovery cycles)
        repo_cost = nav_cost + 10.0 * jnp.maximum(self.clearance_r - d_rb, 0.0)

        cost = jnp.where(
            task.task_id == 9,
            push_cost + hover_cost,
            jnp.where(
                task.task_id == 7,
                ee_cost + base_cost,
                jnp.where(task.task_id == 8, repo_cost, nav_cost),
            ),
        )
        return cost, jnp.zeros(0)
