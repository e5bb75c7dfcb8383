from acmpc_tpu.mapping.map_maker import MapMaker

__all__ = ["MapMaker"]
