#!/usr/bin/env python3
"""Planner server — the reference's two-terminal workflow, terminal 1.

Parity target: ``scripts/reactive_tamp.py`` (run_reactive_tamp:89-94).

Run in the command line:
    python3 scripts/reactive_tamp.py task=navigation goal="[-3, 3]"
    python3 scripts/reactive_tamp.py task=push goal="[-1, -1]"
    python3 scripts/reactive_tamp.py task=pull goal="[0, 0]"
    python3 scripts/reactive_tamp.py task=push_pull multi_modal=True goal="[-3.75, -3.75]"
    python3 scripts/reactive_tamp.py -cn config_panda
    python3 scripts/reactive_tamp.py -cn config_panda multi_modal=True cube_on_shelf=True

Prefer the single-process ``scripts/run_tamp.py`` unless you specifically
want the planner and the actuated sim in separate terminals.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m3p2i_aip_tpu.config.config_store import load_config_from_argv
from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMPServer
from m3p2i_aip_tpu.utils import rpc


def run_reactive_tamp(argv) -> None:
    # localhost by default (the reference binds 0.0.0.0 — reactive_tamp.py:92 —
    # but both terminals always run on one host); M3P2I_RPC_HOST=0.0.0.0 opts in
    # to a remote sim terminal.
    import os

    host = os.environ.get("M3P2I_RPC_HOST", "127.0.0.1")
    cfg = load_config_from_argv(argv, default_config="config_point")
    server = rpc.Server(ReactiveTAMPServer(cfg), host, 4242)
    print(f"planner listening on tcp://{host}:4242")
    server.run()


if __name__ == "__main__":
    run_reactive_tamp(sys.argv[1:])
