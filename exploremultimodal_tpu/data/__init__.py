from exploremultimodal_tpu.data.datamodule import MultiTaskData
from exploremultimodal_tpu.data.datasets import (
    ConcatDataset,
    ImageTextArrowDataset,
    Nlvr2ArrowDataset,
    SyntheticDataset,
    TextCorpusDataset,
    VqaArrowDataset,
)
from exploremultimodal_tpu.data.masking import MaskingGenerator
from exploremultimodal_tpu.data.pipeline import DeviceFeeder, ShardedLoader, collate
from exploremultimodal_tpu.data.tokenization import MlmCollator, get_tokenizer

__all__ = [
    "ConcatDataset",
    "DeviceFeeder",
    "ImageTextArrowDataset",
    "MaskingGenerator",
    "MlmCollator",
    "MultiTaskData",
    "Nlvr2ArrowDataset",
    "ShardedLoader",
    "SyntheticDataset",
    "TextCorpusDataset",
    "VqaArrowDataset",
    "collate",
    "get_tokenizer",
]
