from tpupose.models.backbones.resnet import ResNet, resnet_spec

__all__ = ["ResNet", "resnet_spec"]
