"""Diffusion-guided novel-view subsystem (ReconFusion-inspired).

TPU-native (flax) rebuild of the reference's diffusion package
(/root/reference/tinysplat/diffusion/ — unwired "upcoming work", never
imported by the trainer; SURVEY.md L5). The reference leans on HF `diffusers`
(UNet2DModel, DiffusionPipeline) and torch; neither is assumed here — the
UNet, VAE, DDIM scheduler, and pipeline are first-party flax modules, and the
PixelNeRF-style feature-volume conditioning is pure jnp.
"""
from .unet import UNet2D, UNet2DCondition
from .vae import AutoencoderKL
from .scheduler import DDIMScheduler
from .model_diffusion import FeatureVolumeEncoder, FeatureAggregator, EmbeddingMLP
from .pipeline import TinysplatDiffusionPipeline

__all__ = [
    "UNet2D",
    "UNet2DCondition",
    "AutoencoderKL",
    "DDIMScheduler",
    "FeatureVolumeEncoder",
    "FeatureAggregator",
    "EmbeddingMLP",
    "TinysplatDiffusionPipeline",
]
