from acmpc_tpu.bench.lap_sweep import LapSweep, SweepGrid

__all__ = ["LapSweep", "SweepGrid"]
