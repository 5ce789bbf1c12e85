from vsnca_tpu.losses.overflow import overflow_loss
from vsnca_tpu.losses.appearance import (
    gram_matrix,
    gram_loss,
    sliced_wasserstein_loss,
    ot_style_loss,
    appearance_loss,
)
from vsnca_tpu.losses.content import content_loss
from vsnca_tpu.losses.auxiliary import auxiliary_loss
from vsnca_tpu.losses.vector_field import (
    get_motion_vector_field_by_name,
    vector_field_motion_loss,
)
from vsnca_tpu.losses.video_motion import video_motion_loss, motion_feature
from vsnca_tpu.losses.orchestrator import LossState, make_loss_fn, set_loss_weight
