"""Checkpoint / resume for planner + sim state.

The reference has no checkpointing (SURVEY.md §5 "Checkpoint / resume:
none") — the planner's only cross-tick state is the MPPI means.  Here the
whole control-loop state (MPPIState pytree + env state pytree + the symbolic
planner's host state) round-trips through a single ``.npz``, so a long
reactive run can stop and resume bit-exactly.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    return arrays, treedef


def save_checkpoint(path: str, tamp, sim_state) -> str:
    """Save a SimLoop/ReactiveTAMP snapshot to ``path`` (.npz)."""
    blobs = {}
    mppi_arrays, _ = _flatten(tamp.mppi_state)
    for k, v in mppi_arrays.items():
        blobs[f"mppi/{k}"] = v
    sim_arrays, _ = _flatten(sim_state)
    for k, v in sim_arrays.items():
        blobs[f"sim/{k}"] = v

    tp = tamp.task_planner
    host = {
        "task": tp.task,
        "curr_goal": np.asarray(tp.curr_goal).tolist(),
        "pick_always": bool(getattr(tp, "pick_always", False)),
        "place_always": bool(getattr(tp, "place_always", False)),
        "suction_active": int(tamp.suction_active),
    }
    blobs["host_json"] = np.frombuffer(
        json.dumps(host).encode(), dtype=np.uint8
    )
    np.savez(path, **blobs)
    return path


def load_checkpoint(path: str, tamp, sim_state):
    """Restore a snapshot saved by :func:`save_checkpoint`.

    Returns the restored sim state; the tamp's MPPI state and host planner
    fields are updated in place.
    """
    data = np.load(path)
    mppi_leaves, mppi_def = jax.tree_util.tree_flatten(tamp.mppi_state)
    restored = [
        jnp.asarray(data[f"mppi/leaf_{i}"]) for i in range(len(mppi_leaves))
    ]
    tamp.mppi_state = jax.tree_util.tree_unflatten(mppi_def, restored)

    sim_leaves, sim_def = jax.tree_util.tree_flatten(sim_state)
    restored = [jnp.asarray(data[f"sim/leaf_{i}"]) for i in range(len(sim_leaves))]
    new_sim = jax.tree_util.tree_unflatten(sim_def, restored)

    host = json.loads(bytes(data["host_json"]).decode())
    tp = tamp.task_planner
    tp.task = host["task"]
    tp.curr_goal = np.asarray(host["curr_goal"], dtype=np.float32)
    if hasattr(tp, "pick_always"):
        tp.pick_always = host["pick_always"]
        tp.place_always = host["place_always"]
    tamp.suction_active = host["suction_active"]
    return new_sim
