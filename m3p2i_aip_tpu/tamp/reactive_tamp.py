"""REACTIVE_TAMP orchestrator: task planner + objective + M3P2I in one loop.

Parity target: ``scripts/reactive_tamp.py`` (REACTIVE_TAMP class, :22-87).
Architectural differences (SURVEY.md §7):

  * No rollout Isaac Gym instance: the env is a pure ``step`` function and the
    K rollouts are vmapped inside the planner's single jitted ``command``.
  * No zerorpc: ``run_tamp`` takes/returns arrays in-process.  (The TCP compat
    server in ``utils/rpc.py`` wraps this same class for the two-terminal
    workflow.)
  * The task planner runs host-side and its outputs enter the jitted planner
    as traced :class:`TaskParams` — a task switch never recompiles.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from m3p2i_aip_tpu.envs import Env, make_env
from m3p2i_aip_tpu.planners.motion_planner import cost_functions
from m3p2i_aip_tpu.planners.motion_planner.m3p2i import M3P2I
from m3p2i_aip_tpu.planners.motion_planner.mppi import make_task_params
from m3p2i_aip_tpu.planners.task_planner.task_planner import set_task_planner


class ReactiveTAMP:
    def __init__(self, cfg, env: Optional[Env] = None) -> None:
        self.cfg = cfg
        self.env = env if env is not None else make_env(cfg)

        if cfg.env_type == "point_env":
            self.objective = cost_functions.PointObjective(self.env.params, cfg)
        else:
            self.objective = cost_functions.PandaObjective(self.env.params, cfg)

        self.task_planner = set_task_planner(cfg)
        self.task_success = False

        self.motion_planner = M3P2I(
            cfg,
            dynamics=self.env.step,
            running_cost=self.objective.compute,
            zero_ext=self.env.zero_ext,
            traj_point=self.env.traj_point,
        )
        self.mppi_state = self.motion_planner.init_state()
        self.suction_active = int(cfg.suction_active)
        self.top_trajs = None
        self._zero_action = jnp.zeros(self.env.nu)

    # ------------------------------------------------------------------ api
    def run_tamp(self, real_state) -> jnp.ndarray:
        """One replanning tick: sync plan, then compute the optimal action.

        Parity: REACTIVE_TAMP.run_tamp (reactive_tamp.py:43-61).  The state
        broadcast into all K rollout envs (:45-48) happens inside the jitted
        command (mppi.py `_command_impl`), not by copying tensors K times.
        Returns the first action of the optimized sequence [nu].
        """
        task_params = self.tamp_interface(real_state)
        if self.task_success:
            return self._zero_action
        action_seq, self.mppi_state, aux = self.motion_planner.command(
            self.mppi_state, real_state, task_params
        )
        self.top_trajs = aux["top_trajs"]
        return action_seq[0]

    def run_tamp_sequence(self, real_state) -> jnp.ndarray:
        """Like :meth:`run_tamp` but returns the whole [u_per_command, nu]
        sequence (the reference's ``command`` return before the ``[0]`` at
        reactive_tamp.py:60)."""
        task_params = self.tamp_interface(real_state)
        if self.task_success:
            return jnp.zeros((self.cfg.mppi.u_per_command, self.env.nu))
        action_seq, self.mppi_state, aux = self.motion_planner.command(
            self.mppi_state, real_state, task_params
        )
        self.top_trajs = aux["top_trajs"]
        return action_seq[: self.cfg.mppi.u_per_command]

    def tamp_interface(self, real_state):
        """Update plan -> gripper -> objective params -> suction -> success.

        Parity: REACTIVE_TAMP.tamp_interface (reactive_tamp.py:75-81).
        """
        view = self.env.view(real_state)
        self.task_planner.update_plan(view)
        gripper = self.motion_planner.update_gripper_command(self.task_planner.task)
        self.suction_active = self.motion_planner.get_pull_preference(self.mppi_state)
        self.task_success = self.task_planner.check_task_success(view)
        grip = gripper if self.env.env_type == "panda_env" else "none"
        return make_task_params(
            self.task_planner.task, self.task_planner.curr_goal, grip
        )

    # -------------------------------------------------------------- queries
    def get_trajs(self):
        """Top-20 rollout trajectories. Parity: reactive_tamp.py:83-84."""
        return self.top_trajs

    def get_suction(self) -> int:
        """Parity: reactive_tamp.py:86-87."""
        return int(self.suction_active)


class ReactiveTAMPServer:
    """Wire-level facade for the two-process compat workflow.

    Speaks the reference's RPC surface — ``run_tamp(dof_state, root_state)``
    with raw Isaac-layout tensors (reactive_tamp.py:43-61) — on top of the
    in-process :class:`ReactiveTAMP`.  Serve it with
    ``m3p2i_aip_tpu.utils.rpc.Server``.
    """

    def __init__(self, cfg) -> None:
        self.tamp = ReactiveTAMP(cfg)
        self._state = self.tamp.env.init_state()

    def run_tamp(self, dof_state, root_state):
        env = self.tamp.env
        state = env.load_dof_state(self._state, jnp.asarray(dof_state))
        state = env.load_root_state(state, jnp.asarray(root_state))
        self._state = state
        return np.asarray(self.tamp.run_tamp(state))

    def get_trajs(self):
        return np.asarray(self.tamp.get_trajs())

    def get_suction(self) -> int:
        return self.tamp.get_suction()
