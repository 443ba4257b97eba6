"""Adaptive action selection with precondition back-chaining.

Behavioral port of
``src/m3p2i_aip/planners/task_planner/adaptive_action_selection.py:12-84``:
run active inference per MDP agent, check the chosen action's preconditions
against the current state estimates, push unmet preconditions as high-priority
preferences (value 2) while inhibiting the action, and loop until an
executable action is found — or report failure when only idle remains.
"""
from __future__ import annotations

import numpy as np


def adapt_act_sel(agents, obs):
    if not isinstance(agents, list):
        agents = [agents]
        obs = [obs]
    n = len(agents)

    # Restore habits; drop pushed preferences that are already satisfied
    # (adaptive_action_selection.py:23-30).
    for i in range(n):
        agents[i].reset_habits()
        for idx in range(len(agents[i]._mdp.C)):
            if agents[i]._mdp.C[idx] > 0 and idx == obs[i]:
                agents[i].set_preferences(0, idx)

    # Success short-circuit when a preferred state is observed (:32-38).
    for i in range(n):
        for idx in range(len(agents[i]._mdp.C)):
            if agents[i]._mdp.C[idx] == 0 and idx == obs[i]:
                return "success", "idle_success"

    u = [-1] * n
    current_states = ["null"] * n
    looking_for_alternatives = False
    max_rounds = 32  # safety bound; the reference loops unboundedly (:43)

    for _ in range(max_rounds):
        for i in range(n):
            if obs[i] != "null":
                if not looking_for_alternatives:
                    agents[i].infer_states(obs[i])
                _, u[i] = agents[i].infer_policies()
                current_states[i] = agents[i]._mdp.state_names[
                    int(np.argmax(agents[i].get_current_state()))
                ]

        if np.max(u) == 0:
            if not looking_for_alternatives:
                return "failure", "idle_fail"
            return "failure", "idle_fail"

        for i in range(n):
            if u[i] > 0:
                prec = agents[i]._mdp.preconditions[u[i]]
                unmet = False
                for item in prec:
                    if item not in current_states and item != "none":
                        unmet = True
                        looking_for_alternatives = True
                        for j in range(n):
                            if item in agents[j]._mdp.state_names:
                                agents[j].set_preferences(
                                    2, agents[j]._mdp.state_names.index(item)
                                )
                        agents[i].reset_habits(u[i])
                if not unmet:
                    return "running", agents[i]._mdp.action_names[u[i]]
    return "failure", "idle_fail"
