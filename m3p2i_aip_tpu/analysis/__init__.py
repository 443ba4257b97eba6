"""Experiment logging + offline statistics (parity: the reference's plot/)."""
from m3p2i_aip_tpu.analysis.run_logger import (
    RunLogger,
    finalize_albert_row,
    finalize_panda_row,
    finalize_point_row,
)
from m3p2i_aip_tpu.analysis.stats import (
    point_costs,
    panda_costs,
    summarize,
    mean_std,
)
