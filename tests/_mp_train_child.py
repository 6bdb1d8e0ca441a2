"""Child process for the 2-process END-TO-END train test
(tests/test_multiprocess_train.py). Two real JAX processes (2 fake CPU
devices each, data=4 global mesh) run the production Trainer —
init_state + make_train_step — for 2 steps on the synthetic dataset and
assert the globally-reduced loss is finite and IDENTICAL across
processes (the reference's actual operating mode: torchrun multi-process
DDP/DeepSpeed, utils/utils.py:298-334)."""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, pid, preset = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from exploremultimodal_tpu.config import load_config  # noqa: E402
from exploremultimodal_tpu.train.trainer import Trainer  # noqa: E402

assert jax.process_count() == 2
assert len(jax.devices()) == 4

cfg = load_config([
    "model=vlmo_debug",
    "train=pretrain_mum",
    f"parallel={preset}",
    "runtime.mesh.data=4",
    "train.datasets=[synthetic]",
    "data.batch_size=4",  # per-process (reference per-GPU semantics) → global 8
    "data.synthetic_size=32",
    "model.img_size=32",
    "model.max_text_len=16",
    "data.num_mask_patches=2",
    "data.min_mask_patches_per_block=1",
    "data.num_workers=0",
    "train.discrete_vae_type=random",
    "train.warmup_steps=2",
    "compute_dtype=float32",
    f"exp_dir=/tmp/emm_mp_train_{preset}_{pid}",
    "log_level=error",
])
trainer = Trainer(cfg)
feed = trainer.feeder(iter(trainer.data.train_loader()))
batch = next(feed)
state = trainer.init_state(batch)
train_step = trainer.make_train_step()

losses = []
for step_i in range(2):
    state, metrics = train_step(state, batch, jnp.asarray(0.0))
    jax.block_until_ready(metrics)
    losses.append(float(metrics["total_loss"]))
    if step_i == 0:
        batch = next(feed)

assert all(np.isfinite(losses)), losses
# the loss is globally reduced inside the step — every process must see
# the exact same values
gathered = np.asarray(
    multihost_utils.process_allgather(jnp.asarray(losses), tiled=False)
)
np.testing.assert_array_equal(gathered[0], gathered[1])

print(f"child {pid} OK {preset} losses={losses}", flush=True)
