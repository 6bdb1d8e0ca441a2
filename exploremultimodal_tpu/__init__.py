"""exploremultimodal_tpu — a TPU-native VLMo-style vision-language framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
fanzhongyi/ExploreMultiModal (VLMo mixture-of-modality-experts pretraining +
finetuning): shared-attention transformer with modality-routed FFN experts, a
frozen DALL-E discrete-VAE image tokenizer for BEiT-style masked image
modeling, multitask pretraining (MLM + ITC + ITM + MIM), and VQAv2 / NLVR2
finetuning — expressed as sharded, jitted functional programs over a device
mesh rather than DDP/DeepSpeed engines.

Layer map (bottom → top), mirroring the reference's implicit layering
(see SURVEY.md §1):

  parallel/    mesh construction, sharding presets (dp / zero1 / fsdp / tp),
               gradient-preserving gather collective
  config/      YAML-composed config groups (model sizes, train phases,
               parallelism presets) with dotted CLI overrides
  ops/         compute kernels: attention (XLA + Pallas flash), fused LN,
               on-device image preprocessing
  models/      VLMo backbone, task heads, DALL-E dVAE tokenizer + importers
  objectives/  pure-function losses: mlm / itc / itm / mim / vqa / nlvr2 ...
  data/        arrow datasets, tokenization + whole-word masking, blockwise
               image masking, augmentations, double-buffered device feed
  train/       generic trainer (one jitted train_step, phases as plugins),
               optimizer factory, LR schedules, orbax checkpointing
  utils/       logging, metric meters with cross-process sync, profiling
"""

__version__ = "0.1.0"
