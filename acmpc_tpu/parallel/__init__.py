from acmpc_tpu.parallel.mesh import (
    make_mesh,
    sharded_get_control,
    scenario_sharding,
)

__all__ = ["make_mesh", "scenario_sharding", "sharded_get_control"]
