from acmpc_tpu.config.schema import (
    AgentConfig,
    LocalisationConfig,
    PIDConfig,
    PerceptionConfig,
    load_config,
)

__all__ = [
    "AgentConfig",
    "LocalisationConfig",
    "PIDConfig",
    "PerceptionConfig",
    "load_config",
]
