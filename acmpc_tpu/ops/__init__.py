from acmpc_tpu.ops.tridiag import tridiag_matvec, tridiag_solve

__all__ = ["tridiag_matvec", "tridiag_solve"]
