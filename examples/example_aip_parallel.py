#!/usr/bin/env python3
"""Parallel plan demo: two MDP agents with interdependent preconditions.

Parity target: ``examples/example_aip_parallel.py`` — demonstrates
:func:`par_act_sel` emitting lists of parallelizable plans.
"""
import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m3p2i_aip_tpu.planners.task_planner import (
    ai_agent,
    parallel_action_selection,
    state_action_templates,
)


def main() -> None:
    mdp_isAt = state_action_templates.MDPIsAt()
    mdp_isCloseTo = state_action_templates.MDPIsCloseTo()

    agents = [ai_agent.AiAgent(mdp_isAt), ai_agent.AiAgent(mdp_isCloseTo)]
    agents[0].set_preferences(np.array([[1.0], [0.0]]))  # want at_goal
    agents[1].set_preferences(np.array([[1.0], [0.0]]))  # want close_to

    for i in range(4):
        obs = [1, 1]  # neither satisfied
        outcome, plans = parallel_action_selection.par_act_sel(agents, obs)
        print("Round:", i, "outcome:", outcome, "plans:", plans)


if __name__ == "__main__":
    main()
