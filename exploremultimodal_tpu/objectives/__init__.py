from exploremultimodal_tpu.objectives.losses import (
    compute_accuracy,
    compute_irtr,
    compute_itc,
    compute_itm,
    compute_mim,
    compute_mlm,
    compute_mpp,
    compute_nlvr2,
    compute_vqa,
    compute_vqa_score,
)

__all__ = [
    "compute_accuracy",
    "compute_irtr",
    "compute_itc",
    "compute_itm",
    "compute_mim",
    "compute_mlm",
    "compute_mpp",
    "compute_nlvr2",
    "compute_vqa",
    "compute_vqa_score",
]
