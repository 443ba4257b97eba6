"""Checkpoint / resume for planner + sim state.

The reference has no checkpointing (SURVEY.md §5 "Checkpoint / resume:
none") — the planner's only cross-tick state is the MPPI means.  Here the
whole control-loop state (MPPIState pytree + env state pytree + the symbolic
planner's host state) round-trips through a single ``.npz``, so a long
reactive run can stop and resume bit-exactly.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _field_arrays(tree) -> Dict[str, np.ndarray]:
    """Dataclass pytree -> {field_name: array}.  Name-keyed (not positional)
    so checkpoints stay loadable when fields are added or reordered."""
    return {
        f.name: np.asarray(getattr(tree, f.name))
        for f in dataclasses.fields(tree)
    }


def _restore_fields(tree, data: Dict, prefix: str):
    """Replace matching fields from saved arrays; unknown saved fields are
    ignored and missing ones keep the freshly-initialized values."""
    updates = {}
    for f in dataclasses.fields(tree):
        key = f"{prefix}{f.name}"
        if key in data:
            updates[f.name] = jnp.asarray(data[key])
    return tree.replace(**updates)


def save_checkpoint(path: str, tamp, sim_state) -> str:
    """Save a SimLoop/ReactiveTAMP snapshot to ``path`` (.npz)."""
    blobs = {}
    for k, v in _field_arrays(tamp.mppi_state).items():
        blobs[f"mppi/{k}"] = v
    for k, v in _field_arrays(sim_state).items():
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
    # np.savez appends '.npz' itself when missing; normalize so the returned
    # path always names the file that exists (and round-trips to load).
    if not str(path).endswith(".npz"):
        path = f"{path}.npz"
    np.savez(path, **blobs)
    return path


def load_checkpoint(path: str, tamp, sim_state):
    """Restore a snapshot saved by :func:`save_checkpoint`.

    Returns the restored sim state; the tamp's MPPI state and host planner
    fields are updated in place.
    """
    data = np.load(path)
    tamp.mppi_state = _restore_fields(tamp.mppi_state, data, "mppi/")
    new_sim = _restore_fields(sim_state, data, "sim/")

    host = json.loads(bytes(data["host_json"]).decode())
    tp = tamp.task_planner
    tp.task = host["task"]
    tp.curr_goal = np.asarray(host["curr_goal"], dtype=np.float32)
    if hasattr(tp, "pick_always"):
        tp.pick_always = host["pick_always"]
        tp.place_always = host["place_always"]
    tamp.suction_active = host["suction_active"]
    return new_sim
