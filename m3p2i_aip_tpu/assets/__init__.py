"""Vendored robot assets (procedurally emitted URDFs).

The reference ships hand-written URDFs (``assets/urdf/`` — pointRobot,
heijn, boxer, albert, franka_panda).  Here the descriptions are *generated*
from the same kinematic constants the native models are built on
(models/panda_fk.py, models/albert.py), which keeps the asset loop
self-contained: URDF-driven FK (utils/urdf.py) can cross-validate the native
matrix FK in a bare checkout, with no dependency on the reference mount.
"""
from m3p2i_aip_tpu.assets.urdf_gen import (  # noqa: F401
    emit_albert_urdf,
    emit_boxer_urdf,
    emit_franka_urdf,
    emit_heijn_urdf,
    emit_point_urdf,
    ensure_assets,
)
