"""Pallas TPU kernel tests — skipped on CPU (Mosaic kernels need a real TPU).

The golden check (kernel output == pure-JAX `_multi_modal_exp_util`) runs in
CI only when a TPU backend is present; the CPU suite still covers the JAX
reference path the kernel must match.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p2i_aip_tpu.ops.pallas_kernels import pallas_available


@pytest.mark.skipif(not pallas_available(), reason="needs a TPU backend")
def test_multimodal_weights_matches_jax_path():
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.ops.pallas_kernels import multimodal_weights_pallas
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_point", ["task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]"]
    )
    mp = ReactiveTAMP(cfg).motion_planner
    rng = np.random.default_rng(0)
    ch = jnp.asarray(rng.uniform(0, 50, size=(mp.K, mp.T)).astype(np.float32))

    mp.use_pallas = False
    ref = jax.jit(mp._multi_modal_exp_util)(ch)
    got = multimodal_weights_pallas(ch, mp.gamma_seq, mp.half_K, 10.0, 3.0)
    for r, g in zip(ref, got):
        assert np.allclose(np.asarray(r), np.asarray(g), atol=1e-6)
        assert abs(float(jnp.sum(g)) - 1.0) < 1e-5


@pytest.mark.skipif(not pallas_available(), reason="needs a TPU backend")
def test_fused_rollout_matches_xla_path():
    """The fused point-env rollout kernel (ops/pallas_rollout.py) must match
    the XLA scan-of-vmapped-step rollout on costs and trajectories."""
    from m3p2i_aip_tpu.config.config_store import load_config
    from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP

    cfg = load_config(
        "config_point", ["task=push_pull", "multi_modal=True", "goal=[-3.75,-3.75]"]
    )
    tamp = ReactiveTAMP(cfg)
    mp = tamp.motion_planner
    assert mp.rollout_override is not None

    K, T = mp.K, mp.T
    rng = np.random.default_rng(0)
    # start states include multi-contact configurations: open space, the
    # arena wall JUNCTION (two simultaneous wall contacts — the state where
    # sequential contact resolution would diverge from the batched XLA
    # semantics), and pressed against the box near a wall
    starts = [
        (jnp.asarray([-0.3, 1.4]), jnp.asarray([0.5, 0.5])),
        (jnp.asarray([-3.7, -3.7]), jnp.asarray([-2.0, -2.0])),
        (jnp.asarray([-0.05, 1.75]), jnp.asarray([0.0, 2.0])),
    ]
    for q0, qd0 in starts:
        state = tamp.env.init_state().replace(q=q0, qd=qd0)
        tp = tamp.tamp_interface(state)
        sK = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), state
        )
        acts = jnp.asarray(rng.uniform(-3, 3, size=(K, T, 2)).astype(np.float32))

        ov = mp.rollout_override
        mp.rollout_override = None
        ch_ref, tps_ref = jax.jit(lambda s, a: mp._rollout(s, a, tp))(sK, acts)
        mp.rollout_override = ov
        ch_pl, tps_pl = jax.jit(lambda s, a: ov(s, a, tp))(sK, acts)
        assert np.allclose(np.asarray(ch_ref), np.asarray(ch_pl), atol=1e-2), q0
        assert np.allclose(np.asarray(tps_ref), np.asarray(tps_pl), atol=1e-3), q0
