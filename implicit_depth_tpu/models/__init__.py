from implicit_depth_tpu.models.embedder import positional_encoding, posenc_dim
from implicit_depth_tpu.models.imnet import IMNet, IEF
from implicit_depth_tpu.models.pointnet import PointNet2Stage
from implicit_depth_tpu.models.resnet import ResNet34_8s

__all__ = [
    "positional_encoding",
    "posenc_dim",
    "IMNet",
    "IEF",
    "PointNet2Stage",
    "ResNet34_8s",
]
