from .unet import UNetModel, ClassifierBackbone
from .vae import AutoencoderKL, DiagonalGaussian
from .cond_encoder import VideoFeatEncoderPosembed
