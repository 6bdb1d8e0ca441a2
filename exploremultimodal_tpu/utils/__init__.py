from exploremultimodal_tpu.utils.logging import create_logger
from exploremultimodal_tpu.utils.metrics import MetricLogger, SmoothedValue

__all__ = ["create_logger", "MetricLogger", "SmoothedValue"]
