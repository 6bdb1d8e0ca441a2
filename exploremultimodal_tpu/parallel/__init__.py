from exploremultimodal_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    TENSOR_AXIS,
    create_mesh,
    initialize_runtime,
)
from exploremultimodal_tpu.parallel.collectives import (
    all_gather_with_grad,
    concat_all_gather,
)

__all__ = [
    "DATA_AXIS",
    "FSDP_AXIS",
    "TENSOR_AXIS",
    "create_mesh",
    "initialize_runtime",
    "all_gather_with_grad",
    "concat_all_gather",
]
