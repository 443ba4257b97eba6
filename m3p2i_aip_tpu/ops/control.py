"""Control-sequence utilities: squashing, discounted cost-to-go, weight floors.

JAX replacements for ``src/m3p2i_aip/utils/mppi_utils.py`` (scale_ctrl:29-44,
cost_to_go:106-113) and ``skill_utils._ensure_non_zero`` (:3-4).
"""
from __future__ import annotations

import jax.numpy as jnp


def scale_ctrl(ctrl, u_min, u_max, squash_fn: str = "clamp"):
    """Squash controls into [u_min, u_max].

    Parity: mppi_utils.scale_ctrl:29-44.  ``squash_fn`` is a static string.
    """
    if squash_fn == "clamp":
        return jnp.maximum(jnp.minimum(ctrl, u_max), u_min)
    half = (u_max - u_min) / 2.0
    mid = (u_max + u_min) / 2.0
    if squash_fn == "clamp_rescale":
        ctrl = jnp.clip(ctrl, -1.0, 1.0)
    elif squash_fn == "tanh":
        ctrl = jnp.tanh(ctrl)
    elif squash_fn == "identity":
        return ctrl
    else:
        raise ValueError(f"unknown squash_fn {squash_fn!r}")
    return mid + ctrl * half


def cost_to_go(cost_seq: jnp.ndarray, gamma_seq: jnp.ndarray) -> jnp.ndarray:
    """Discounted cost-to-go along the last axis.

    Parity: mppi_utils.cost_to_go:106-113 — scale by gamma^t, reversed cumsum,
    unscale.  cost_seq [..., T], gamma_seq broadcastable [..., T].
    """
    scaled = gamma_seq * cost_seq
    ctg = jnp.flip(jnp.cumsum(jnp.flip(scaled, axis=-1), axis=-1), axis=-1)
    return ctg / gamma_seq


def discounted_traj_cost(cost_seq: jnp.ndarray, gamma_seq: jnp.ndarray) -> jnp.ndarray:
    """cost_to_go(...)[..., 0] without materializing the full matrix.

    The planner only consumes the first column (mppi.py:435-436), which is the
    plain discounted sum — a single contraction instead of a cumsum.
    """
    return jnp.sum(cost_seq * gamma_seq, axis=-1)


def ensure_non_zero(cost: jnp.ndarray, beta, factor) -> jnp.ndarray:
    """exp(-factor * (cost - beta)). Parity: skill_utils._ensure_non_zero:3-4."""
    return jnp.exp(-factor * (cost - beta))
