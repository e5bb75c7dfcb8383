from acmpc_tpu.mpc.control_qp import assemble_control_qp, solve_control_qp
from acmpc_tpu.mpc.spatial_mpc import MPCConfig, MPCState, SpatialMPC

__all__ = [
    "MPCConfig",
    "MPCState",
    "SpatialMPC",
    "assemble_control_qp",
    "solve_control_qp",
]
