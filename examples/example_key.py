#!/usr/bin/env python3
"""Scripted "teleop" smoke test of the JAX sim engine.

Parity target: ``examples/example_key.py`` — the reference drives one env
with the keyboard (isaacgym_wrapper.py:439-460, WASD -> +/-2 velocity) and
optionally demos suction.  Headless TPU has no viewer, so the same velocity
commands are scripted; the ASCII renderer in
:mod:`m3p2i_aip_tpu.utils.render` shows the scene evolving.

Run: python3 examples/example_key.py [--suction]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from m3p2i_aip_tpu.config.config_store import load_config
from m3p2i_aip_tpu.envs import make_env
from m3p2i_aip_tpu.utils import skill_utils
from m3p2i_aip_tpu.utils.render import render_point_env


def main() -> None:
    cfg = load_config("config_point")
    env = make_env(cfg)
    step = jax.jit(env.step)
    state = env.init_state()

    # the keyboard_control velocity map (isaacgym_wrapper.py:439-460)
    keymap = {
        "up": jnp.asarray([0.0, 2.0]),
        "down": jnp.asarray([0.0, -2.0]),
        "left": jnp.asarray([-2.0, 0.0]),
        "right": jnp.asarray([2.0, 0.0]),
    }
    script = ["up"] * 30 + ["right"] * 20 + ["down"] * 25 + ["left"] * 20

    use_suction = "--suction" in sys.argv
    names = list(env.params.actor_names)
    box_slot = env.params.dyn_actor_idx.index(names.index("box"))

    for i, key in enumerate(script):
        u = keymap[key]
        ext = env.zero_ext()
        if use_suction:
            f_box, f_robot = skill_utils.calculate_suction(
                state.dyn_pos[box_slot], state.q, float(cfg.kp_suction), 1.5
            )
            ext = ext.replace(robot=f_robot, dyn=ext.dyn.at[box_slot].set(f_box))
        state = step(state, u, ext)
        if i % 15 == 0:
            print(f"step {i:3d} key={key:5s} robot={np.round(np.asarray(state.q), 2)}")
            print(render_point_env(env, state))


if __name__ == "__main__":
    main()
