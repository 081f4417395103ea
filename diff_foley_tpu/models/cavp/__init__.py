from .cnn14 import Cnn14
from .slowonly import ResNet3dSlowOnly
from .cavp import CAVPModel, CAVPConfig
