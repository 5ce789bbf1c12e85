from vsnca_tpu.ops.filters import (
    SOBEL_X,
    SOBEL_Y,
    LAPLACIAN,
    IDENTITY,
    gaussian_kernel_2d,
    matlab_gaussian_kernel_2d,
)
from vsnca_tpu.ops.perception import (
    depthwise_3x3,
    perceive,
    perceive_multiscale,
    edge_extract,
)
from vsnca_tpu.ops.cpe import cartesian_positional_encoding
from vsnca_tpu.ops.resize import resize_bilinear, resize_nearest_1d
from vsnca_tpu.ops.padding import pad2d, symmetric_pad_2d
from vsnca_tpu.ops.grid_sample import grid_sample_bilinear, tf_consistent_bilinear_upsample
from vsnca_tpu.ops.pallas_step import (
    fused_rollout,
    fused_rollout_chw,
    fused_rollout_stream_chw,
    fused_rollout_supported,
    fused_stream_supported,
)
from vsnca_tpu.ops.pallas_train import (
    fused_rollout_train,
    fused_train_supported,
)
