"""Model zoo: CLIP text/vision, SD UNet, VAE — all Flax linen, NHWC, bf16-ready."""
from flexdiffuse_tpu.models.clip import CLIPTextModel, CLIPVisionModel
from flexdiffuse_tpu.models.configs import (CLIP_VIT_L14_TEXT,
                                            CLIP_VIT_L14_VISION,
                                            OPENCLIP_H_TEXT,
                                            OPENCLIP_BIGG_VISION,
                                            OPENCLIP_H_VISION, SD14_UNET,
                                            SD14_VAE, SD21_UNET, SD21_VAE,
                                            SDXL_REFINER_UNET, SDXL_UNET,
                                            SDXL_VAE, TINY_REFINER_UNET,
                                            TINY_SDXL_UNET,
                                            TINY_TEXT, TINY_UNET, TINY_VAE,
                                            TINY_VISION, CLIPTextConfig,
                                            CLIPVisionConfig, UNetConfig,
                                            VAEConfig)
from flexdiffuse_tpu.models.controlnet import ControlNetModel
from flexdiffuse_tpu.models.unet import UNet2DCondition
from flexdiffuse_tpu.models.vae import AutoencoderKL, sample_latents

__all__ = [
    'CLIPTextModel', 'CLIPVisionModel', 'UNet2DCondition', 'AutoencoderKL',
    'ControlNetModel',
    'sample_latents', 'CLIPTextConfig', 'CLIPVisionConfig', 'UNetConfig',
    'VAEConfig', 'TINY_TEXT', 'TINY_VISION', 'TINY_UNET', 'TINY_VAE',
    'SD14_UNET', 'SD14_VAE', 'CLIP_VIT_L14_TEXT', 'CLIP_VIT_L14_VISION',
    'SD21_UNET', 'SD21_VAE', 'OPENCLIP_H_TEXT', 'OPENCLIP_H_VISION',
    'SDXL_UNET', 'SDXL_VAE', 'SDXL_REFINER_UNET', 'TINY_SDXL_UNET',
    'TINY_REFINER_UNET', 'OPENCLIP_BIGG_VISION'
]
