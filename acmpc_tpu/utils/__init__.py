from acmpc_tpu.utils.radians import convert_radians_to_plus_minus_pi

__all__ = ["convert_radians_to_plus_minus_pi"]
