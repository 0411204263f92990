from timetuning_tpu.models.vit import (
    ViTConfig,
    VisionTransformer,
    vit_tiny,
    vit_small,
    vit_base,
)

__all__ = [
    "ViTConfig",
    "VisionTransformer",
    "vit_tiny",
    "vit_small",
    "vit_base",
]
