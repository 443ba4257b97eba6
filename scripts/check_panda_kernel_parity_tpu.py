#!/usr/bin/env python3
"""Measure the panda kernel-vs-XLA cost/traj maxdiff on the real TPU.

Round-2 recorded ~0.045 cost maxdiff (TODO round-2:35).  Root cause found in
round 3: the XLA path's FK matmuls ran at the MXU default precision (bf16
multiplies) while the kernel's scalar-register dots are exact f32; panda_fk
now pins Precision.HIGHEST.  This script prints the measured maxdiffs so the
TPU-gated test tolerance can be tightened with evidence.
"""
import jax
import jax.numpy as jnp
import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m3p2i_aip_tpu.config.config_store import load_config
from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP


def main() -> None:
    cfg = load_config("config_panda", ["multi_modal=True"])
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    assert mp.rollout_override is not None, "needs the TPU kernel path"

    state = tamp.env.init_state()
    tp = tamp.tamp_interface(state)
    sK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (mp.K,) + x.shape), state
    )
    rng = np.random.default_rng(0)

    ov = mp.rollout_override
    mp.rollout_override = None
    ref_fn = jax.jit(lambda s, a, t: mp._rollout(s, a, t))
    # jit traces lazily: force the trace NOW, while the override is off,
    # so ref_fn is permanently the XLA path (the closure is only read at
    # trace time)
    prime = jnp.zeros((mp.K, mp.T, 9), jnp.float32)
    jax.block_until_ready(ref_fn(sK, prime, tp))
    mp.rollout_override = ov
    pl_fn = jax.jit(lambda s, a, t: ov(s, a, t))

    worst_c = worst_t = 0.0
    for trial in range(3):
        acts = jnp.asarray(
            rng.uniform(-1.5, 1.5, size=(mp.K, mp.T, 9)).astype(np.float32)
        )
        ch_ref, tps_ref = ref_fn(sK, acts, tp)
        ch_pl, tps_pl = pl_fn(sK, acts, tp)
        dc = float(np.abs(np.asarray(ch_ref) - np.asarray(ch_pl)).max())
        dt = float(np.abs(np.asarray(tps_ref) - np.asarray(tps_pl)).max())
        worst_c, worst_t = max(worst_c, dc), max(worst_t, dt)
        print(f"trial {trial}: cost maxdiff {dc:.6f}  traj maxdiff {dt:.6f}")
    print(f"WORST: cost {worst_c:.6f}  traj {worst_t:.6f}")


if __name__ == "__main__":
    main()
