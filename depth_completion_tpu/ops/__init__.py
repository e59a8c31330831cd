from depth_completion_tpu.ops.stats import (
    kld_stdnorm,
    masked_mae,
    masked_minmax,
    masked_quantile,
    masked_rmse,
)

__all__ = [
    "kld_stdnorm",
    "masked_mae",
    "masked_minmax",
    "masked_quantile",
    "masked_rmse",
]
