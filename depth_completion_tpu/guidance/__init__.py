from depth_completion_tpu.guidance.affine import (
    affine_to_metric_closed_form,
    affine_to_metric_learned,
    compute_affine_params,
)
from depth_completion_tpu.guidance.losses import SUPPORTED_LOSS_FUNCS, compute_loss
from depth_completion_tpu.guidance.optim import make_optimizer
from depth_completion_tpu.guidance.projection import (
    DepthNormalization,
    denormalize_depth,
    normalize_sparse,
    project,
    renormalize_to_guidance,
)

__all__ = [
    "affine_to_metric_closed_form",
    "affine_to_metric_learned",
    "compute_affine_params",
    "SUPPORTED_LOSS_FUNCS",
    "compute_loss",
    "make_optimizer",
    "DepthNormalization",
    "denormalize_depth",
    "normalize_sparse",
    "project",
    "renormalize_to_guidance",
]
