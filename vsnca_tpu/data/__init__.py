from vsnca_tpu.data.preprocess import (
    preprocess_style_image,
    preprocess_target_images,
    preprocess_video,
    rgb_to_grayscale_mean,
    synthetic_style_image,
    synthetic_video,
)
from vsnca_tpu.data.dataset import ConditioningDataset
