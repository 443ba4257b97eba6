"""Discrete active-inference agent (free-energy minimizing MDP).

Behavioral port of ``src/m3p2i_aip/planners/task_planner/ai_agent.py`` (the
AiAgent class of Pezzato et al.): variational state inference by marginal
message passing over a 2-step horizon, expected-free-energy policy scoring,
Bayesian model averaging, and a learning-rate update of the initial belief D.

Host-side numpy by design: the matrices are 2–4 states and run once per
control tick (SURVEY.md §1 L4a); only the resulting task id / goal are fed to
the jitted planner.
"""
from __future__ import annotations

import copy

import numpy as np


def aip_log(x):
    """Safe elementwise log. Parity: ai_agent.aip_log:146-148."""
    return np.log(np.asarray(x, dtype=np.float64) + 1e-16)


def aip_norm(x):
    """Column-normalize a probability matrix. Parity: ai_agent.aip_norm:150-158."""
    x = np.asarray(x, dtype=np.float64).copy()
    for c in range(x.shape[1]):
        s = x[:, c].sum()
        x[:, c] = x[:, c] / s if s > 0 else 1.0 / x.shape[0]
    return x


def aip_softmax(x):
    """Column softmax. Parity: ai_agent.aip_softmax:160-165."""
    x = np.asarray(x, dtype=np.float64)
    e = np.exp(x - np.max(x))
    return e / e.sum()


class AiAgent:
    def __init__(self, mdp):
        self._mdp = copy.deepcopy(mdp)
        self.n_policies = np.shape(self._mdp.V)[0]
        self.n_states = np.shape(self._mdp.B)[0]
        self.n_actions = np.shape(self._mdp.B)[2]
        self.t_horizon = 2
        self.F = np.zeros((self.n_policies, 1))
        self.policy_indexes_v = self._mdp.V

        if hasattr(self._mdp, "D"):
            self._mdp.D = aip_norm(self._mdp.D)
        else:
            self._mdp.D = aip_norm(np.ones((self.n_states, 1)))

        self._mdp.C = aip_log(self._mdp.C)
        self._mdp.E = aip_log(aip_norm(self._mdp.E))
        self.default_E = copy.deepcopy(self._mdp.E)

        self.likelihood_A = aip_norm(self._mdp.A)
        self.fwd_trans_B = np.zeros((self.n_states, self.n_states, self.n_actions))
        self.bwd_trans_B = np.zeros_like(self.fwd_trans_B)
        for a in range(self.n_actions):
            self.fwd_trans_B[:, :, a] = aip_norm(self._mdp.B[:, :, a])
            self.bwd_trans_B[:, :, a] = aip_norm(self._mdp.B[:, :, a]).T

        self.u = 0
        self.post_x = None
        self.sparse_O = None

    # ----------------------------------------------------------------- infer
    def infer_states(self, obs: int):
        """Marginal message passing over the 2-step horizon per policy.

        Parity: ai_agent.infer_states:52-109.
        """
        ns, th, npol = self.n_states, self.t_horizon, self.n_policies
        self.post_x = np.full((ns, th, npol), 1.0 / ns)
        for p in range(npol):
            self.post_x[:, 0, p] = self._mdp.D[:, 0]

        for p in range(npol):
            self.F[p] = 0.0
            self.sparse_O = np.zeros((ns, th))
            s_tau_past = None
            for tau in range(th):
                if tau == 0:
                    self.sparse_O[obs, tau] = 1.0
                else:
                    s_prev = self.post_x[:, tau - 1, p].reshape(ns, 1)
                    sampled = int(np.argmax(self.likelihood_A @ s_prev))
                    self.sparse_O[sampled, tau] = 1.0
                    s_tau_past = s_prev

                lnA = aip_log(self.likelihood_A @ self.sparse_O[:, tau]).reshape(ns, 1)

                if tau == 0:
                    lnB_past = aip_log(self._mdp.D)
                else:
                    lnB_past = aip_log(
                        self.fwd_trans_B[:, :, self.policy_indexes_v[p]] @ s_tau_past
                    )

                if tau >= th - 1:
                    lnB_future = np.zeros((ns, 1))
                else:
                    s_next = self.post_x[:, tau + 1, p].reshape(ns, 1)
                    lnB_future = aip_log(
                        self.bwd_trans_B[:, :, self.policy_indexes_v[p]] @ s_next
                    )

                s_pi_tau = aip_softmax(lnB_past + lnB_future + lnA)
                self.post_x[:, tau, p] = s_pi_tau[:, 0]
                self.F[p] += float(
                    self.post_x[:, tau, p]
                    @ (aip_log(s_pi_tau) - lnB_past - lnA)[:, 0]
                )
        return self.F, self.post_x

    def infer_policies(self):
        """Expected free energy + policy posterior + D update.

        Parity: ai_agent.infer_policies:111-144.
        """
        ns, th, npol = self.n_states, self.t_horizon, self.n_policies
        self.G = np.zeros((npol, 1))
        ambiguity = np.diagonal(self.likelihood_A.T @ aip_log(self.likelihood_A))
        for p in range(npol):
            for t in range(1, th):
                self.sparse_O[:, t] = 0.0
                o = int(
                    np.argmax(
                        self.fwd_trans_B[:, :, self.policy_indexes_v[p]]
                        @ self.post_x[:, t - 1, p]
                    )
                )
                self.sparse_O[o, t] = 1.0
                risk = (aip_log(self.sparse_O[:, t]) - self._mdp.C[:, 0]) @ self.sparse_O[:, t]
                self.G[p] += risk + float(ambiguity @ self.post_x[:, t, p])

        post_pi = aip_softmax(self._mdp.E - self.F - self.G)
        self.u = int(np.argmax(aip_softmax(aip_log(post_pi))))

        # Bayesian model average over policies, then update prior D
        self.post_x_bma = np.zeros((ns, th))
        for t in range(th):
            for p in range(npol):
                self.post_x_bma[:, t] += self.post_x[:, t, p] * post_pi[p, 0]

        self._mdp.D = aip_norm(
            self._mdp.D + self._mdp.kappa_d * self.post_x_bma[:, 0].reshape(ns, 1)
        )
        self._mdp.D[self._mdp.D < 1e-5] = 0.0
        self._mdp.D = aip_norm(self._mdp.D)
        return self.G, self.u

    # ------------------------------------------------------------- accessors
    def set_observation(self, obs):
        self._mdp.o = obs

    def set_preferences(self, pref, index="none"):
        """Parity: ai_agent.set_preferences:172-176 (stores log preferences)."""
        if index == "none":
            self._mdp.C = aip_log(pref)
        else:
            self._mdp.C[index] = aip_log(pref)

    def get_action(self):
        return self.u

    def get_current_state(self):
        return self._mdp.D

    def reset_habits(self, index="none"):
        """Parity: ai_agent.reset_habits:187-191."""
        if index == "none":
            self._mdp.E = copy.deepcopy(self.default_E)
        else:
            self._mdp.E[index] = aip_log(0)

    def reset_current_state(self):
        self._mdp.D = aip_norm(np.ones((self.n_states, 1)))
