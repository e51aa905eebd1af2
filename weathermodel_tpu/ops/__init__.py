from weathermodel_tpu.ops.losses import (
    gaussian_log_likelihood,
    gaussian_kl_divergence,
    mixture_kl_divergence,
)
from weathermodel_tpu.ops.masking import (
    bert_mask,
    feature_mask,
    segment_mask,
    make_mask,
)
from weathermodel_tpu.ops.normalize import normalize_year_interval_coords
from weathermodel_tpu.ops.schedules import epoch_lr_schedule
