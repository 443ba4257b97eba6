"""TAMP orchestration: the planner-side REACTIVE_TAMP and the real-system loop.

The reference splits these into two OS processes bridged by zerorpc
(``scripts/reactive_tamp.py`` + ``scripts/sim.py``); here both live in one
process and share the same jitted engine (SURVEY.md §2.2 "Planner/actuator
process parallelism").  A thin TCP-RPC compatibility layer for the original
two-terminal workflow lives in :mod:`m3p2i_aip_tpu.utils.rpc`.
"""
from m3p2i_aip_tpu.tamp.reactive_tamp import ReactiveTAMP
from m3p2i_aip_tpu.tamp.sim_loop import SimLoop, run_sim
