from depth_completion_tpu.models.registry import (
    MARIGOLD_UNET_CONFIG,
    SD_VAE_CONFIG,
    SD2_TEXT_CONFIG,
    TAESD_CONFIG,
)

__all__ = [
    "MARIGOLD_UNET_CONFIG",
    "SD_VAE_CONFIG",
    "SD2_TEXT_CONFIG",
    "TAESD_CONFIG",
]
