"""Task planners: fixed-goal, active-inference (panda), and patrolling.

Behavioral port of ``src/m3p2i_aip/planners/task_planner/task_planner.py``.
Host-side by design (SURVEY.md §1 L4a): the planners consume a small
*observation view* dict of the current real-env state (produced by
``Env.view(state)``) instead of a live Isaac Gym wrapper, and emit
``(task, curr_goal)`` which the orchestrator packs into traced
:class:`~m3p2i_aip_tpu.planners.motion_planner.mppi.TaskParams` — the
host/device cut described in SURVEY.md §7 ("Host/device cut for AIP").

View schemas:
  point env : robot_pos [2], robot_vel [2], box_pos [2], box_quat [4]
  panda env : cube_state [7], cube_goal [7], ee_state [7]
"""
from __future__ import annotations

import numpy as np

from m3p2i_aip_tpu.planners.task_planner import (
    adaptive_action_selection,
    ai_agent,
    state_action_templates,
)
from m3p2i_aip_tpu.ops import general_ori_cube2goal


def set_task_planner(cfg):
    """Dispatch on env type. Parity: task_planner.set_task_planner:7-11."""
    if cfg.env_type in ("point_env", "heijn_env", "boxer_env", "albert_env"):
        return PLANNER_SIMPLE(cfg)
    return PLANNER_AIF_PANDA(cfg)


class PLANNER_SIMPLE:
    """Fixed task + goal from config. Parity: PLANNER_SIMPLE (task_planner.py:13-39)."""

    def __init__(self, cfg) -> None:
        self.task = cfg.task
        self.curr_goal = np.asarray(cfg.goal, dtype=np.float32)
        self.dist_threshold = 0.1

    def update_plan(self, view) -> None:
        pass

    def reset_plan(self) -> None:
        pass

    def check_task_success(self, view) -> bool:
        if self.task == "navigation":
            return bool(
                np.linalg.norm(np.asarray(view["robot_pos"]) - self.curr_goal[:2])
                < self.dist_threshold
            )
        if self.task in ("push", "pull", "push_pull", "hybrid"):
            return bool(
                np.linalg.norm(np.asarray(view["box_pos"]) - self.curr_goal[:2])
                <= self.dist_threshold
            )
        if self.task == "ee_reach":  # albert: end effector at a 3D goal
            return bool(
                np.linalg.norm(np.asarray(view["ee_pos"]) - self.curr_goal[:3])
                < self.dist_threshold
            )
        return False


class PLANNER_AIF_PANDA(PLANNER_SIMPLE):
    """Active-inference reach/pick/place planner for the panda env.

    Parity: PLANNER_AIF_PANDA (task_planner.py:41-107) including the
    ``pick_always`` / ``place_always`` hysteresis latches (:58-76).  The
    reference's ``sim.step()`` inside ``update_plan`` (:79) exists only to
    refresh link tensors after the state sync; here link states come from FK
    on the synced state directly, so no extra step is needed.
    """

    def __init__(self, cfg) -> None:
        self.task = "idle"
        self.curr_goal = np.zeros(7, dtype=np.float32)
        self.curr_action = "idle"
        mdp_isCubeAt = state_action_templates.MDPIsCubeAtReal()
        self.ai_agent_task = [ai_agent.AiAgent(mdp_isCubeAt)]
        self.obs = 0
        self.pick_always = False
        self.place_always = False
        self.pre_pick_place_threshold = float(cfg.pre_height_diff) + 0.005
        self.pre_place_loc = np.zeros(7, dtype=np.float32)
        self.dist_threshold = 0.1

    def get_obs(self, cube_state, cube_goal, ee_state) -> None:
        """Discrete observation {0,1,2} with hysteresis (task_planner.py:58-76)."""
        reach_cost = float(np.linalg.norm(ee_state[:3] - cube_state[:3]))
        dist_cost = float(np.linalg.norm(self.pre_place_loc[:2] - cube_state[:2]))
        ori_cost = float(
            general_ori_cube2goal(
                np.asarray(cube_goal[3:]).reshape(4), np.asarray(cube_state[3:]).reshape(4)
            )
        )
        if dist_cost + ori_cost < 0.03 or self.place_always:
            self.obs = 2
            self.ai_agent_task[0].set_preferences(np.array([[1], [0], [0], [0]]))
            self.place_always = True
        elif reach_cost < self.pre_pick_place_threshold or self.pick_always:
            self.obs = 1
            self.ai_agent_task[0].set_preferences(np.array([[1], [0], [0], [0]]))
            self.pick_always = True
        elif not self.pick_always:
            self.obs = 0
            self.ai_agent_task[0].set_preferences(np.array([[0], [1], [0], [0]]))

    def update_plan(self, view) -> None:
        cube_state = np.asarray(view["cube_state"], dtype=np.float32)
        cube_goal = np.asarray(view["cube_goal"], dtype=np.float32)
        ee_state = np.asarray(view["ee_state"], dtype=np.float32)
        self.pre_place_loc = cube_goal.copy()
        self.pre_place_loc[2] += self.pre_pick_place_threshold
        self.get_obs(cube_state, cube_goal, ee_state)
        _, self.curr_action = adaptive_action_selection.adapt_act_sel(
            self.ai_agent_task, [self.obs]
        )
        self.task = self.curr_action
        if self.curr_action == "pick":
            self.curr_goal = self.pre_place_loc

    def reset_plan(self) -> None:
        self.task = "idle"
        self.curr_action = "idle"
        self.obs = 0
        self.pick_always = False
        self.place_always = False
        mdp_isCubeAt = state_action_templates.MDPIsCubeAtReal()
        self.ai_agent_task = [ai_agent.AiAgent(mdp_isCubeAt)]

    def check_task_success(self, view) -> bool:
        """Success = cube within 0.04 of goal while placing (task_planner.py:100-107)."""
        cube_state = np.asarray(view["cube_state"], dtype=np.float32)
        dist_cost = float(np.linalg.norm(self.curr_goal[:2] - cube_state[:2]))
        return self.task == "place" and dist_cost < 0.04


class PLANNER_PATROLLING(PLANNER_SIMPLE):
    """Cycle through a goal list. Parity: PLANNER_PATROLLING (task_planner.py:109-125)."""

    def __init__(self, goals) -> None:
        self.task = "navigation"
        self.goals = np.asarray(goals, dtype=np.float32)
        self.goal_id = 0
        self.curr_goal = self.goals[self.goal_id]
        self.dist_threshold = 0.1

    def reset_plan(self) -> None:
        self.goal_id = 0
        self.curr_goal = self.goals[self.goal_id]

    def update_plan(self, view) -> None:
        robot_pos = np.asarray(view["robot_pos"], dtype=np.float32)
        if np.linalg.norm(robot_pos - self.curr_goal[:2]) < 0.1:
            self.goal_id = (self.goal_id + 1) % self.goals.shape[0]
            self.curr_goal = self.goals[self.goal_id]
