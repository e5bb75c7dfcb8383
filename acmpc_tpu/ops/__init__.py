from acmpc_tpu.ops.pallas_admm import admm_iterations_pallas
from acmpc_tpu.ops.spd_inverse import spd_inverse
from acmpc_tpu.ops.tridiag import tridiag_matvec, tridiag_solve
from acmpc_tpu.ops.tridiag_sharded import tridiag_solve_sharded

__all__ = [
    "admm_iterations_pallas",
    "spd_inverse",
    "tridiag_matvec",
    "tridiag_solve",
    "tridiag_solve_sharded",
]
