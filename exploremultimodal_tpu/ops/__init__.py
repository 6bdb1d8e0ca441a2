from exploremultimodal_tpu.ops.attention import multi_head_attention
from exploremultimodal_tpu.ops.stochastic import FastDropout, drop_path

__all__ = ["multi_head_attention", "drop_path", "FastDropout"]
