"""Parallel action selection: emit lists of parallelizable plans.

Behavioral port of
``src/m3p2i_aip/planners/task_planner/parallel_action_selection.py:12-106``:
unlike :func:`~.adaptive_action_selection.adapt_act_sel`, which stops at the
first applicable action, this keeps searching after each hit (inhibiting found
actions) and groups actions that touch disjoint MDP components into plans that
can run in parallel.
"""
from __future__ import annotations

import copy

import numpy as np


def par_act_sel(agents, obs):
    if not isinstance(agents, list):
        agents = [agents]
        obs = [obs]
    n = len(agents)

    some_action_found = 0
    looking_for_alternatives = False
    curr_action_plan = []

    # Restore habits; drop pushed preferences already satisfied (:24-31).
    for i in range(n):
        agents[i].reset_habits()
        for idx in range(len(agents[i]._mdp.C)):
            if agents[i]._mdp.C[idx] > 0 and idx == obs[i]:
                agents[i].set_preferences(0, idx)

    # Success short-circuit when a preferred state is observed (:34-40).
    for i in range(n):
        for idx in range(len(agents[i]._mdp.C)):
            if agents[i]._mdp.C[idx] == 0 and idx == obs[i]:
                curr_action_plan.append("idle_success")
                some_action_found = 1
                break

    u = [-1] * n
    current_states = ["null"] * n
    outcome = "failure"
    max_rounds = 32  # safety bound; the reference loops unboundedly (:45)

    rounds = 0
    while "idle_success" not in curr_action_plan and rounds < max_rounds:
        rounds += 1
        for i in range(n):
            if obs[i] != "null":
                if not looking_for_alternatives:
                    agents[i].infer_states(obs[i])
                _, u[i] = agents[i].infer_policies()
                current_states[i] = agents[i]._mdp.state_names[
                    int(np.argmax(agents[i].get_current_state()))
                ]

        # All idle: stop — failure if nothing was ever found (:52-59).
        if np.max(u) == 0:
            if not looking_for_alternatives and some_action_found == 0:
                outcome = "failure"
            break

        for i in range(n):
            if u[i] > 0:
                prec = agents[i]._mdp.preconditions[u[i]]
                unmet = False
                for item in prec:
                    if item not in current_states and item != "none":
                        unmet = True
                        looking_for_alternatives = True
                        # push the missing state as a high-priority prior (:73-78)
                        for j in range(n):
                            if item in agents[j]._mdp.state_names:
                                agents[j].set_preferences(
                                    2, agents[j]._mdp.state_names.index(item)
                                )
                        agents[i].reset_habits(u[i])
                if not unmet:
                    # action applicable: record it, inhibit it, keep looking (:81-85)
                    agents[i].reset_habits(u[i])
                    some_action_found += 1
                    outcome = "running"
                    curr_action_plan.append(
                        [agents[i]._mdp.action_names[u[i]], i]
                    )

    # Parallelize applicable actions over disjoint components (:88-104).
    parall_plans = []
    if "idle_success" not in curr_action_plan:
        for index in range(len(curr_action_plan)):
            parall_plans.append(list(copy.deepcopy(curr_action_plan[index])))
            for k in range(len(curr_action_plan)):
                if curr_action_plan[k][1] not in parall_plans[index]:
                    parall_plans[index].append(copy.deepcopy(curr_action_plan[k][0]))
                    parall_plans[index].append(copy.deepcopy(curr_action_plan[k][1]))
        for index in range(len(curr_action_plan)):
            parall_plans[index] = [
                x for x in parall_plans[index] if not isinstance(x, int)
            ]
        parall_plans = list(map(list, set(map(tuple, map(set, parall_plans)))))
    else:
        outcome = "success"
        parall_plans = curr_action_plan

    return outcome, parall_plans
