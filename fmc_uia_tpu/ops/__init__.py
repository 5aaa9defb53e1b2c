from fmc_uia_tpu.ops.centernet import (
    gaussian_radius,
    make_centernet_targets,
    decode_centernet,
    decode_grid_detection,
)
from fmc_uia_tpu.ops.image import (
    normalize_images,
    random_brightness_contrast,
    random_gauss_noise,
    augment_and_normalize,
)

__all__ = [
    "gaussian_radius",
    "make_centernet_targets",
    "decode_centernet",
    "decode_grid_detection",
    "normalize_images",
    "random_brightness_contrast",
    "random_gauss_noise",
    "augment_and_normalize",
]
