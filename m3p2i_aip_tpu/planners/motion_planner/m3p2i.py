"""M3P2I: multi-modal MPPI with per-mode distributions + mode arbitration.

Parity target: ``src/m3p2i_aip/planners/motion_planner/m3p2i.py``.  The
multi-modal math itself (per-mode softmax weights with adaptive beta, per-mode
means/elites, m3p2i.py:46-92) lives in :class:`~.mppi.MPPI` behind the
``multi_modal`` flag — here we add the task-facing API: gripper command
selection and the push-vs-pull suction arbitration.
"""
from __future__ import annotations

import jax.numpy as jnp

from m3p2i_aip_tpu.planners.motion_planner.mppi import MPPI, MPPIState


class M3P2I(MPPI):
    def __init__(self, cfg, dynamics=None, running_cost=None, **kwargs):
        super().__init__(cfg, dynamics, running_cost, **kwargs)
        self.suction_active = bool(cfg.suction_active)
        self.gripper_command = "open"

    def update_gripper_command(self, task: str) -> str:
        """Parity: m3p2i.update_gripper_command:10-14."""
        if task in ("reach", "place"):
            self.gripper_command = "open"
        elif task == "pick":
            self.gripper_command = "close"
        return self.gripper_command

    def get_pull_preference(self, state: MPPIState) -> int:
        """Compare summed per-mode weights: 1 = pull wins.

        Parity: m3p2i.get_pull_preference:16-22.
        """
        if self.multi_modal:
            w_push = float(jnp.sum(state.weights[: self.half_K]))
            w_pull = float(jnp.sum(state.weights[self.half_K :]))
            return int(w_pull > w_push)
        return int(self.suction_active)
