from .algorithms import (  # noqa: F401
    find_clip_val_minmax_weight,
    tensor_cali_dispatcher,
    tensor_calibration,
)
from .stats import StatsRunner  # noqa: F401
