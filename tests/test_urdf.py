"""URDF parser tests: synthetic chain + cross-validation of the native
panda FK against a real franka_panda.urdf when one is available."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from m3p2i_aip_tpu.utils.urdf import chain_to, load_chain, parse_urdf

_SYNTH = """
<robot name="rr">
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 1" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3" effort="10" velocity="1"/>
  </joint>
  <joint name="j2" type="prismatic">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="1 0 0" rpy="0 0 0"/><axis xyz="1 0 0"/>
    <limit lower="0" upper="0.5" effort="10" velocity="1"/>
  </joint>
  <joint name="jt" type="fixed">
    <parent link="l2"/><child link="tool"/>
    <origin xyz="0.1 0 0" rpy="0 0 0"/>
  </joint>
</robot>
"""


def test_synthetic_chain_fk():
    joints = parse_urdf(_SYNTH)
    assert set(joints) == {"j1", "j2", "jt"}
    chain = chain_to(joints, "tool")
    assert chain.ndof == 2
    lo, hi = chain.joint_limits
    assert lo[0] == -3 and hi[1] == 0.5

    # q = [pi/2 rotation, 0.3 extension]: the x-offset link swings to +y
    links = chain.fk(jnp.asarray([np.pi / 2, 0.3]))
    tool_pos, tool_rot = links["tool"]
    assert np.allclose(np.asarray(tool_pos), [0.0, 1.4, 1.0], atol=1e-5)


def _vendored_franka() -> str:
    from m3p2i_aip_tpu.assets import ensure_assets

    root = ensure_assets()
    return str(root / "franka_description/robots/franka_panda.urdf")


def _check_panda_fk_against(urdf_path: str, hand_link: str = "panda_hand"):
    from m3p2i_aip_tpu.models import panda_fk

    chain = load_chain(urdf_path, hand_link)
    rng = np.random.default_rng(0)
    lo = panda_fk.JOINT_LOWER[:7]
    hi = panda_fk.JOINT_UPPER[:7]
    for _ in range(5):
        q7 = rng.uniform(lo, hi).astype(np.float32)
        q9 = np.concatenate([q7, [0.02, 0.02]]).astype(np.float32)
        native = panda_fk.fk(jnp.asarray(q9), jnp.zeros(3))
        urdf_links = chain.fk(jnp.asarray(q7))
        n_pos, n_rot = native["hand"]
        u_pos, u_rot = urdf_links[hand_link]
        assert np.allclose(np.asarray(n_pos), np.asarray(u_pos), atol=1e-5), (
            n_pos,
            u_pos,
        )
        assert np.allclose(np.asarray(n_rot), np.asarray(u_rot), atol=1e-5)


def test_native_panda_fk_matches_vendored_urdf():
    """Self-contained asset loop: the vendored (emitted) franka URDF drives
    the URDF-FK path and must agree with the native matrix FK."""
    _check_panda_fk_against(_vendored_franka())


def test_vendored_urdfs_parse():
    from m3p2i_aip_tpu.assets import ensure_assets

    root = ensure_assets()
    albert = chain_to(
        parse_urdf(str(root / "albert/albert.urdf")), "panda_hand"
    )
    assert albert.ndof == 7  # base->hand chain: the 7 arm joints
    point = chain_to(parse_urdf(str(root / "pointRobot.urdf")), "base_link")
    assert point.ndof == 2
    heijn = chain_to(parse_urdf(str(root / "heijn.urdf")), "base_link")
    assert heijn.ndof == 3
    boxer = parse_urdf(str(root / "boxer/boxer.urdf"))
    assert sum(j.type != "fixed" for j in boxer.values()) == 4
    # husky: the reference's unused spare asset, vendored for 1:1 inventory
    husky = parse_urdf(str(root / "husky_description/husky.urdf"))
    assert sum(j.type != "fixed" for j in husky.values()) == 4


_REF_URDF = "/root/reference/src/m3p2i_aip/assets/urdf/franka_description/robots/franka_panda.urdf"


@pytest.mark.skipif(not os.path.exists(_REF_URDF), reason="no franka URDF available")
def test_native_panda_fk_matches_urdf():
    """The transcribed matrix FK must match FK derived from the real URDF."""
    from m3p2i_aip_tpu.models import panda_fk

    chain = load_chain(_REF_URDF, "panda_hand")
    rng = np.random.default_rng(0)
    lo = panda_fk.JOINT_LOWER[:7]
    hi = panda_fk.JOINT_UPPER[:7]
    for _ in range(5):
        q7 = rng.uniform(lo, hi).astype(np.float32)
        q9 = np.concatenate([q7, [0.02, 0.02]]).astype(np.float32)
        native = panda_fk.fk(jnp.asarray(q9), jnp.zeros(3))
        urdf_links = chain.fk(jnp.asarray(q7))
        n_pos, n_rot = native["hand"]
        u_pos, u_rot = urdf_links["panda_hand"]
        assert np.allclose(np.asarray(n_pos), np.asarray(u_pos), atol=1e-5), (
            n_pos,
            u_pos,
        )
        assert np.allclose(np.asarray(n_rot), np.asarray(u_rot), atol=1e-5)
