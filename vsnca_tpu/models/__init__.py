from vsnca_tpu.models.dynca import (
    dynca_init,
    dynca_step,
    dynca_seed,
    dynca_rollout,
    dynca_rollout_with_taps,
    make_conditioning,
    to_rgb,
    param_count,
)
from vsnca_tpu.models.conditioned_nca import (
    conditioned_nca_init,
    conditioned_nca_step,
    conditioned_nca_seed,
    conditioned_nca_grow,
    encode_goal,
)
from vsnca_tpu.models.encoder import image_encoder_init, image_encoder_apply
