from acmpc_tpu.dashboard.server import Dashboard

__all__ = ["Dashboard"]
