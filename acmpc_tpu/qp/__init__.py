from acmpc_tpu.qp.admm import ADMMConfig, QPSolution, solve_box_qp

__all__ = ["ADMMConfig", "QPSolution", "solve_box_qp"]
