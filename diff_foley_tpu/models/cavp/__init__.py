from .cnn14 import Cnn14
from .slowonly import ResNet3dSlowOnly
from .cavp import CAVPModel, CAVPConfig
from .x3d import X3D, X3DConfig, I3DResNet, I3DConfig
from .r2plus1d import ResNet2Plus1d, R2Plus1dConfig
from .spec_towers import (
    SpecResNet50,
    SpecResNetConfig,
    SpecViT,
    SpecViTConfig,
    SpecViTMean,
)
