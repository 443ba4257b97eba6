"""Core math ops: quaternions, quasi-random sampling, splines, filters, control."""
from m3p2i_aip_tpu.ops.quat import (
    quat_to_rotmat,
    mat_to_quat,
    quat_mul,
    quat_conj,
    quat_rotate,
    quat_inv_rotate,
    quat_from_yaw,
    yaw_from_quat,
    quat_normalize,
    quat_integrate,
    ori_cost_cube2goal,
    ori_cost_ee2cube,
    general_ori_cube2goal,
    general_ori_ee2cube,
    general_ori_ee2cube_mat,
)
from m3p2i_aip_tpu.ops.sampling import (
    generate_prime_numbers,
    van_der_corput,
    halton_samples,
    gaussian_halton_samples,
)
from m3p2i_aip_tpu.ops.spline import bspline_interp_matrix
from m3p2i_aip_tpu.ops.filters import savgol_matrix
from m3p2i_aip_tpu.ops.control import (
    scale_ctrl,
    cost_to_go,
    discounted_traj_cost,
    ensure_non_zero,
)
