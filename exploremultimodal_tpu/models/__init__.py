from exploremultimodal_tpu.models.task import (
    VlmoConfig,
    VlmoTask,
    build_model,
    total_loss,
)
from exploremultimodal_tpu.models.vlmo import VLMO, expert_layout

__all__ = [
    "VLMO",
    "VlmoConfig",
    "VlmoTask",
    "build_model",
    "expert_layout",
    "total_loss",
]
