from acmpc_tpu.models.fpn_resnet18 import FPNResNet18

__all__ = ["FPNResNet18"]
