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
