from .unet2d import UNet2DConditionConfig, UNet2DConditionModel
from .vae import AutoencoderKLConfig, AutoencoderKL
from .hifigan import HifiGanConfig, HifiGanGenerator

__all__ = [
    "UNet2DConditionConfig",
    "UNet2DConditionModel",
    "AutoencoderKLConfig",
    "AutoencoderKL",
    "HifiGanConfig",
    "HifiGanGenerator",
]
