#!/usr/bin/env python3
"""AIP pick-sequence demo: scripted observations drive reach->pick->place.

Parity target: ``examples/example_aip_panda.py`` — the documented expected
action progression (reach while obs=0, pick at obs=1, place at obs=2,
idle_success at obs=3) is the golden sequence asserted by
``tests/test_task_planner.py``.
"""
import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m3p2i_aip_tpu.planners.task_planner import (
    adaptive_action_selection,
    ai_agent,
    state_action_templates,
)


def main() -> None:
    mdp_isCubeAt = state_action_templates.MDPIsCubeAtReal()
    ai_agent_task = [ai_agent.AiAgent(mdp_isCubeAt)]

    for i in range(25):
        if i < 5:
            ai_agent_task[0].set_preferences(np.array([[0], [1], [0], [0]]))
            obs = [0]  # cube_at_table -> reach
        elif i < 10:
            ai_agent_task[0].set_preferences(np.array([[1], [0], [0], [0]]))
            obs = [1]  # cube_close_to_gripper -> pick
        elif i < 15:
            ai_agent_task[0].set_preferences(np.array([[1], [0], [0], [0]]))
            obs = [2]  # cube_at_pre_place -> place
        elif i < 20:
            ai_agent_task[0].set_preferences(np.array([[0], [0], [0], [1]]))
            obs = [3]  # cube_at_goal -> idle_success
        else:
            ai_agent_task[0].set_preferences(np.array([[0], [1], [0], [0]]))
            obs = [0]  # back to reach

        outcome, curr_action = adaptive_action_selection.adapt_act_sel(
            ai_agent_task, obs
        )
        print("Round:", i, "Current action:", curr_action)


if __name__ == "__main__":
    main()
