"""Generic trainer: ONE jitted train step, phases as task plugins.

Replaces the reference's four copy-pasted phase drivers
(train/pretrain/{multimodal,text,visual}.py, train/finetune/vqa.py) with a
single Trainer parameterized by config — the consolidation SURVEY.md §1 calls
for. The hot loop is one jit-compiled function over a GSPMD mesh:

  uint8 batch → fused preprocess → frozen dVAE tokens (MIM) → multitask
  losses → grads (optionally lax.scan-accumulated) → AdamW update → EMA /
  queue / ISDA state updates

Parallelism note: under jit+GSPMD the batch is global, so the "naive"
in-batch ITC similarity ALREADY spans the full global batch — XLA inserts the
gradient-preserving gather the reference builds by hand (GatherLayer +
global_reduce). ITM hard negatives likewise sample from the global batch.
The explicit shard_map collective (parallel/collectives.py) exists for
kernel-level control and parity tests.

Mixed precision: params/optimizer fp32, activations in cfg.compute_dtype
(bf16 on TPU — no loss scaler needed, replacing the reference's fp16
GradScaler/DeepSpeed dynamic loss scale).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from exploremultimodal_tpu.data import DeviceFeeder, MultiTaskData
from exploremultimodal_tpu.models import build_model, total_loss
from exploremultimodal_tpu.models.dvae import create_d_vae
from exploremultimodal_tpu.models.task import VlmoTask
from exploremultimodal_tpu.ops.preprocess import preprocess_batch
from exploremultimodal_tpu.parallel import create_mesh, initialize_runtime
from exploremultimodal_tpu.parallel.partitioning import (
    opt_state_specs,
    param_specs,
    to_shardings,
)
from exploremultimodal_tpu.train import checkpoints as ckpt_lib
from exploremultimodal_tpu.train.optim import (
    create_optimizer,
    global_norm,
    merge_frozen,
    phase_frozen_predicate,
    split_frozen,
)
from exploremultimodal_tpu.train.state import (
    TrainState,
    create_train_state,
    ema_update,
    queue_update,
)
from exploremultimodal_tpu.utils import MetricLogger, create_logger
from exploremultimodal_tpu.utils.experiment_log import ExperimentLogger

METRIC_KEYS = ("_task_loss", "_Loss", "_mean_acc", "_mean_score", "itc_temp",
               "_dropped_positions")


def _metrics_from_outputs(outputs: dict) -> dict:
    keep = {}
    for k, v in outputs.items():
        if any(k.endswith(s) or k == s.strip("_") for s in METRIC_KEYS):
            if hasattr(v, "ndim") and v.ndim == 0:
                keep[k] = v
    return keep


class Trainer:
    def __init__(self, cfg: Any, logger=None):
        self.cfg = cfg
        initialize_runtime(cfg)  # idempotent: PRNG impl + multi-host
        # output_dir = this run's dir (checkpoints/logs); exp_dir = the
        # stable tag-level dir auto-resume scans across timestamped subruns
        # (reference main.py:102-105 + utils.py auto_load_model)
        self.output_dir = (
            cfg.get("run_dir") or cfg.get("exp_dir")
            or cfg.get("output_dir", "output")
        )
        self.exp_dir = cfg.get("exp_dir") or self.output_dir
        self.logger = logger or create_logger(
            self.output_dir, jax.process_index(), level=cfg.get("log_level", "info")
        )
        self.mesh = create_mesh(cfg)
        # canonical sharding preset derived from the yaml FLAGS, so custom
        # presets (e.g. fsdp_offload) inherit the right partition rules
        par = cfg.parallel
        if par.get("tensor_parallel"):
            self.preset = "tp"
        elif par.get("shard_params"):
            self.preset = "fsdp"
        elif par.get("shard_opt_state"):
            self.preset = "zero1"
        else:
            self.preset = "dp"
        self.task: VlmoTask = build_model(cfg)

        self.dvae = None
        if "mim" in self.task.config.loss_names:
            self.dvae = create_d_vae(
                cfg.train.get("discrete_vae_weight_path", ""),
                self._dvae_type(),
                cfg.model.img_size // 2,
                dtype=self.task.config.dtype,
                quantize=cfg.train.get("discrete_vae_quantize", "none"),
            )

        self.data = MultiTaskData(cfg)
        self.feeder = DeviceFeeder(self.mesh)
        self.exp_logger = None

    def _dvae_type(self) -> str:
        kind = self.cfg.train.get("discrete_vae_type", "dall-e")
        path = self.cfg.train.get("discrete_vae_weight_path", "")
        if kind == "dall-e" and not os.path.exists(
            os.path.join(path, "encoder.pkl")
        ):
            self.logger.warning(
                "dVAE weights not found at %r — using a randomly initialized "
                "tokenizer (MIM targets will be untrained codes)", path
            )
            return "random"
        return kind

    # ------------------------------------------------------------------ init

    def init_state(self, sample_batch: dict) -> TrainState:
        cfg = self.cfg
        sample_batch = {
            k: v for k, v in sample_batch.items() if not isinstance(v, list)
        }
        model_batch = jax.eval_shape(preprocess_batch, sample_batch)
        model_batch = {
            k: jnp.zeros(v.shape, v.dtype) if hasattr(v, "shape") else v
            for k, v in model_batch.items()
        }
        if self.dvae is not None:
            grid = (cfg.model.img_size // 2) // 8
            model_batch["mim_labels"] = jnp.zeros(
                (sample_batch["image_u8"].shape[0], grid * grid), jnp.int32
            )
        variables = self.task.init(
            {"params": jax.random.key(cfg.seed), "sample": jax.random.key(1)},
            model_batch,
            method=VlmoTask.init_streams,
        )
        params = variables["params"]

        steps_per_epoch = max(len(self.data.train_loader()), 1)
        self.steps_per_epoch = steps_per_epoch
        # Params outside the phase's gradient graph (e.g. vision experts in
        # pretrain_txt, the text side in pretrain_vis) are excluded from the
        # optimizer entirely — torch semantics (grad-None params are skipped,
        # so no weight decay / moments for them) plus the bandwidth win of
        # not reading/writing their moments every step.
        t_cfg = cfg.train
        self.frozen_pred = phase_frozen_predicate(
            tuple(t_cfg.loss_names),
            t_cfg.get("phase"),
            t_cfg.get("mim_head_pos", "img"),
        )
        trainable, _frozen = split_frozen(params, self.frozen_pred)
        if self.frozen_pred is not None and _frozen is None:
            self.frozen_pred = None  # nothing actually matched
        self.optimizer, self.schedule = create_optimizer(
            cfg, trainable, steps_per_epoch
        )

        # two independent EMA trees, like the reference: vlmo_ema is the ITC
        # momentum encoder (vlmo_module.py:120-131, decay 0.995); model_ema is
        # the checkpointed eval EMA (utils/utils.py:486-508, decay 0.9999).
        # Both may be enabled together (conf/config.yaml:136-141).
        t = cfg.train
        state = create_train_state(
            params,
            self.optimizer,
            jax.random.key(cfg.seed + 7),
            trainable=trainable,
            use_ema=cfg.get("vlmo_ema", False),
            ema_decay=cfg.get("vlmo_ema_decay", 0.995),
            use_model_ema=cfg.get("model_ema", False),
            model_ema_decay=cfg.get("model_ema_decay", 0.9999),
            queue_size=t.get("queue_size", 0) if t.get("neg_queue") else 0,
            itc_dim=cfg.model.itc_dim,
            isda_classes=(
                cfg.data.vqav2_label_size
                if float(t.get("isda_lambda", 0)) > 0
                else 0
            ),
            isda_dim=2 * cfg.model.embed_dim,
        )
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        p_specs = param_specs(state.params, self.preset, self.mesh)
        o_specs = opt_state_specs(state.opt_state, self.preset, self.mesh)
        self._offload = bool(self.cfg.parallel.get("offload_opt_state", False))
        if self._offload and jax.devices()[0].platform == "cpu":
            # host-only backend: "pinned_host" is not a distinct memory space
            # (device memory IS host memory) and jit rejects the mixed memory
            # kinds — keep the fsdp_offload SHARDING but skip the staging, so
            # the virtual-mesh dryrun still validates the preset's partition
            # rules; the real offload path is exercised on TPU
            self._offload = False
        self._opt_dev_shardings = to_shardings(o_specs, self.mesh)
        if self._offload:
            # optimizer state parks in pinned host memory (ZeRO-offload
            # analogue); staged to HBM around the update inside the step
            self._opt_host_shardings = jax.tree_util.tree_map(
                lambda ns: NamedSharding(
                    ns.mesh, ns.spec, memory_kind="pinned_host"
                ),
                self._opt_dev_shardings,
                is_leaf=lambda x: isinstance(x, NamedSharding),
            )
        else:
            self._opt_host_shardings = self._opt_dev_shardings
        self.state_shardings = TrainState(
            step=NamedSharding(self.mesh, P()),
            params=to_shardings(p_specs, self.mesh),
            opt_state=self._opt_host_shardings,
            rng=NamedSharding(self.mesh, P()),
            ema_params=(
                to_shardings(p_specs, self.mesh)
                if state.ema_params is not None
                else None
            ),
            ema_decay=state.ema_decay,
            model_ema_params=(
                to_shardings(p_specs, self.mesh)
                if state.model_ema_params is not None
                else None
            ),
            model_ema_decay=state.model_ema_decay,
            img_queue=NamedSharding(self.mesh, P())
            if state.img_queue is not None else None,
            txt_queue=NamedSharding(self.mesh, P())
            if state.txt_queue is not None else None,
            queue_ptr=NamedSharding(self.mesh, P())
            if state.queue_ptr is not None else None,
            isda=jax.tree_util.tree_map(
                lambda _: NamedSharding(self.mesh, P()), state.isda
            )
            if state.isda is not None else None,
        )
        def put(x, s):
            if s is None:
                return x
            if jax.process_count() > 1 and not s.is_fully_addressable:
                # multi-process: device_put rejects shardings spanning
                # non-addressable devices; build the global array from each
                # process's identical host copy (init is seed-deterministic,
                # so every process holds the full value)
                if jnp.issubdtype(
                    getattr(x, "dtype", None), jax.dtypes.prng_key
                ):
                    impl = jax.random.key_impl(x)
                    data = np.asarray(jax.random.key_data(x))
                    arr = jax.make_array_from_callback(
                        data.shape, s, lambda idx: data[idx]
                    )
                    return jax.random.wrap_key_data(arr, impl=impl)
                arr = np.asarray(x)
                return jax.make_array_from_callback(
                    arr.shape, s, lambda idx: arr[idx]
                )
            return jax.device_put(x, s)

        return jax.tree_util.tree_map(
            put, state, self.state_shardings, is_leaf=lambda x: x is None
        )

    # ------------------------------------------------------------- the step

    def _model_batch(self, batch: dict, params=None) -> dict:
        """Fused preprocessing + frozen-tokenizer MIM labels (inside jit)."""
        batch = {
            k: v for k, v in batch.items()
            if k != "index" and not isinstance(v, list)
        }
        model_batch = preprocess_batch(batch, self.task.config.dtype)
        if self.dvae is not None and "image4dalle" in model_batch:
            ids = self.dvae.get_codebook_indices(model_batch["image4dalle"])
            model_batch["mim_labels"] = jax.lax.stop_gradient(ids)
        return model_batch

    def make_train_step(self):
        cfg = self.cfg
        accum = int(cfg.train.get("accumulation_steps", 1))
        use_momentum = cfg.get("vlmo_ema", False)
        use_model_ema = cfg.get("model_ema", False)
        use_queue = bool(cfg.train.get("neg_queue"))
        isda_lambda = float(cfg.train.get("isda_lambda", 0.0))
        total_epochs = int(cfg.train.epochs)
        watch = bool(cfg.get("wandb", {}).get("watch", False))

        def momentum_branch(state: TrainState, model_batch):
            """EMA-encoder features for the ITC momentum mode. Computed once
            per step outside the grad; the SAME features feed the loss and
            the queue update (reference enqueues i_feat_m/t_feat_m,
            objectives.py:158/464)."""
            if not (use_momentum and state.ema_params is not None):
                return None, None
            momentum_feats = jax.lax.stop_gradient(
                self.task.apply(
                    {"params": state.ema_params},
                    model_batch,
                    method=VlmoTask.itc_momentum_feats,
                )
            )
            queue = (
                {"img": state.img_queue, "txt": state.txt_queue}
                if use_queue
                else None
            )
            return momentum_feats, queue

        flat_loss = bool(cfg.train.get("flat_loss", False))

        # train.global_reduce=true routes the loss through shard_map over the
        # data axis so the gradient-preserving ITC gather
        # (parallel/collectives.py, reference GatherLayer objectives.py:392-426)
        # actually executes. Under plain jit+GSPMD the in-batch branch already
        # has global-batch semantics (the batch is global), so this flag only
        # changes WHERE the gather happens, not the math — parity is tested on
        # an 8-device mesh (tests/test_parallel.py). On a 1-device data axis
        # the gather is an identity, same as the reference at world_size 1.
        use_gather = (
            bool(cfg.train.get("global_reduce", False))
            and self.mesh.shape["data"] > 1
        )
        if use_gather:
            if self.preset in ("fsdp", "tp"):
                raise ValueError(
                    "train.global_reduce=true needs params replicated over "
                    "the data axis (dp/zero1 presets); with "
                    f"parallel={self.preset} leave it false — jit+GSPMD "
                    "already gives global-batch ITC semantics"
                )
            if isda_lambda:
                raise ValueError(
                    "global_reduce + ISDA are unsupported together (the "
                    "reference uses them in disjoint phases)"
                )

        frozen_pred = self.frozen_pred

        def loss_fn(trainable, frozen, model_batch, rngs, isda_state, epoch,
                    momentum_feats, queue, pos_offset=0):
            params = merge_frozen(trainable, frozen)
            isda_ratio = (
                isda_lambda * epoch / max(total_epochs, 1) if isda_lambda else 0.0
            )
            outputs = self.task.apply(
                {"params": params},
                model_batch,
                deterministic=False,
                momentum_feats=momentum_feats,
                queue=queue,
                isda_state=isda_state,
                isda_ratio=isda_ratio,
                pos_offset=pos_offset,
                rngs=rngs,
            )
            return total_loss(outputs, flat=flat_loss), outputs

        def value_and_grad_fn(trainable, frozen, model_batch, rngs, isda_state,
                              epoch, momentum_feats, queue, pos_offset=0):
            """((loss, outputs), grads) — plain value_and_grad, or the
            shard_map global_reduce path where each data shard computes its
            local loss against gathered features and grads are pmean'd
            (reference: local loss + GatherLayer backward + DDP allreduce).
            Gradients cover only the trainable subtree (torch grad-None
            skip: frozen params are outside the phase's gradient graph)."""
            if not use_gather:
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    trainable, frozen, model_batch, rngs, isda_state, epoch,
                    momentum_feats, queue, pos_offset,
                )

            from jax import shard_map

            def inner(trainable, frozen, model_batch, rngs, epoch,
                      momentum_feats, queue):
                local_rngs = {
                    k: jax.random.fold_in(r, jax.lax.axis_index("data"))
                    for k, r in rngs.items()
                }

                def local_loss(p):
                    outputs = self.task.apply(
                        {"params": merge_frozen(p, frozen)},
                        model_batch,
                        deterministic=False,
                        axis_name="data",
                        momentum_feats=momentum_feats,
                        queue=queue,
                        rngs=local_rngs,
                    )
                    return total_loss(outputs, flat=flat_loss), outputs

                (loss, outputs), grads = jax.value_and_grad(
                    local_loss, has_aux=True
                )(trainable)
                # count-style metrics (per-shard sums, e.g.
                # *_dropped_positions) must psum to the global count; the
                # rest are means, matching the single-jit path where the
                # whole batch is in one trace
                met = {
                    k: (jax.lax.psum if k.endswith("_dropped_positions")
                        else jax.lax.pmean)(
                        jnp.asarray(v, jnp.float32), "data")
                    for k, v in _metrics_from_outputs(outputs).items()
                }
                return (
                    (jax.lax.pmean(loss, "data"), met),
                    jax.lax.pmean(grads, "data"),
                )

            P_ = P
            mf_spec = P_("data") if momentum_feats is not None else P_()
            inner_s = shard_map(
                inner,
                mesh=self.mesh,
                in_specs=(P_(), P_(), P_("data"), P_(), P_(), mf_spec, P_()),
                out_specs=P_(),
                check_vma=False,
            )
            return inner_s(trainable, frozen, model_batch, rngs, epoch,
                           momentum_feats, queue)

        def train_step(state: TrainState, batch: dict, epoch: jax.Array):
            rngs = state.step_rngs("dropout", "droppath", "sample")
            model_batch = self._model_batch(batch)
            momentum_feats, queue = momentum_branch(state, model_batch)
            # trainable = the phase's gradient-reachable subtree; frozen
            # leaves bypass autodiff and the optimizer entirely (torch
            # grad-None skip). For all-trainable phases frozen is None and
            # this is an identity split.
            trainable, frozen = split_frozen(state.params, frozen_pred)

            if accum > 1:
                # Microbatch loop with full carry: grads + scalar metrics +
                # ISDA state. Momentum features stay FULL-BATCH: each
                # microbatch contrasts against every full-batch momentum
                # feature, with its positives on the pos_offset diagonal —
                # the effective negative count is accum-invariant (reference
                # contrasts bs rows per forward, objectives.py:110-164; the
                # queue is held fixed across the step's microbatches and
                # enqueued once afterwards, equivalent to the per-forward
                # enqueue up to within-step ordering, objectives.py:438-465).
                def metrics_of(out):
                    return {
                        k: jnp.asarray(v, jnp.float32)
                        for k, v in _metrics_from_outputs(out).items()
                    }

                def mb_slice(tree, i):
                    return jax.tree_util.tree_map(
                        lambda v: v.reshape((accum, -1) + v.shape[1:])[i], tree
                    )

                def micro(i, carry):
                    grads_acc, loss_acc, met_acc, isda_carry = carry
                    mb = mb_slice(model_batch, i)
                    mb_size = next(
                        v.shape[0] // accum
                        for v in jax.tree_util.tree_leaves(model_batch)
                    )
                    micro_rngs = {
                        k: jax.random.fold_in(r, i) for k, r in rngs.items()
                    }
                    (loss, out), g = value_and_grad_fn(
                        trainable, frozen, mb, micro_rngs, isda_carry, epoch,
                        momentum_feats, queue, i * mb_size,
                    )
                    met = metrics_of(out)
                    return (
                        jax.tree_util.tree_map(jnp.add, grads_acc, g),
                        loss_acc + loss,
                        {k: met_acc[k] + met[k] for k in met_acc},
                        out.get("isda_state", isda_carry),
                    )

                zero = jax.tree_util.tree_map(
                    lambda p: jnp.zeros_like(p, jnp.float32), trainable
                )
                mb0 = mb_slice(model_batch, 0)
                mfeats0 = (
                    mb_slice(momentum_feats, 0)
                    if momentum_feats is not None else None
                )
                out_shapes = jax.eval_shape(
                    lambda p: loss_fn(
                        p, frozen, mb0, rngs, state.isda, epoch, mfeats0, queue
                    )[1],
                    trainable,
                )
                met0 = {
                    k: jnp.zeros((), jnp.float32)
                    for k, v in out_shapes.items()
                    if any(k.endswith(sfx) or k == sfx.strip("_")
                           for sfx in METRIC_KEYS)
                    and getattr(v, "ndim", None) == 0
                }
                grads, loss, met_sum, isda_final = jax.lax.fori_loop(
                    0, accum, micro,
                    (zero, jnp.zeros((), jnp.float32), met0, state.isda),
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                loss = loss / accum
                outputs = {k: v / accum for k, v in met_sum.items()}
                if isda_final is not None:
                    outputs["isda_state"] = isda_final
            else:
                (loss, outputs), grads = value_and_grad_fn(
                    trainable, frozen, model_batch, rngs, state.isda, epoch,
                    momentum_feats, queue,
                )

            opt_state = state.opt_state
            if self._offload:
                opt_state = jax.device_put(opt_state, self._opt_dev_shardings)
            updates, new_opt_state = self.optimizer.update(
                grads, opt_state, trainable
            )
            if self._offload:
                new_opt_state = jax.device_put(
                    new_opt_state, self._opt_host_shardings
                )
            import optax

            new_params = merge_frozen(
                optax.apply_updates(trainable, updates), frozen
            )

            new_ema = state.ema_params
            if use_momentum and state.ema_params is not None:
                new_ema = ema_update(state.ema_params, new_params, state.ema_decay)
            new_model_ema = state.model_ema_params
            if use_model_ema and state.model_ema_params is not None:
                new_model_ema = ema_update(
                    state.model_ema_params, new_params, state.model_ema_decay
                )

            img_q, txt_q, ptr = state.img_queue, state.txt_queue, state.queue_ptr
            if use_queue and momentum_feats is not None:
                img_q, txt_q, ptr = queue_update(
                    img_q, txt_q, ptr,
                    momentum_feats["i_feat_m"].astype(jnp.float32),
                    momentum_feats["t_feat_m"].astype(jnp.float32),
                )

            new_isda = outputs.get("isda_state", state.isda) if outputs else state.isda

            metrics = _metrics_from_outputs(outputs) if outputs else {}
            metrics["total_loss"] = loss
            metrics["grad_norm"] = global_norm(grads)
            metrics["lr"] = self.schedule(state.step)
            if watch:
                # wandb.watch(model, log='all') equivalent (reference
                # pretrain/multimodal.py:142): per-top-level-module param and
                # grad norms, computed in-graph so logging stays async
                for mod in new_params:
                    metrics[f"watch_param_norm/{mod}"] = global_norm(
                        new_params[mod]
                    )
                    if mod in grads:  # frozen-only modules have no grads
                        metrics[f"watch_grad_norm/{mod}"] = global_norm(
                            grads[mod]
                        )

            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=new_ema,
                model_ema_params=new_model_ema,
                img_queue=img_q,
                txt_queue=txt_q,
                queue_ptr=ptr,
                isda=new_isda,
            )
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,))

    def make_eval_step(self):
        # cached: jit keys on callable identity, so a fresh wrapper per
        # evaluate() would recompile every epoch
        if getattr(self, "_eval_step", None) is not None:
            return self._eval_step

        def eval_step(params, batch, rng):
            model_batch = self._model_batch(batch)
            outputs = self.task.apply(
                {"params": params},
                model_batch,
                deterministic=True,
                rngs={"sample": rng},
            )
            metrics = _metrics_from_outputs(outputs)
            metrics["total_loss"] = total_loss(outputs)
            counts = {
                k: v for k, v in outputs.items()
                if k.endswith("_count") and hasattr(v, "ndim") and v.ndim == 0
            }
            extra = {
                k: outputs[k]
                for k in ("vqa_logits", "nlvr2_logits")
                if k in outputs
            }
            return metrics, counts, extra

        self._eval_step = jax.jit(eval_step)
        return self._eval_step

    # ------------------------------------------------------------ train loop

    def train(self) -> dict:
        cfg = self.cfg
        loader = self.data.train_loader()
        sample = next(iter(loader))
        state = self.init_state(sample)

        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
        self.logger.info(
            f"phase={cfg.train.phase} model={cfg.model.name} "
            f"params={n_params/1e6:.1f}M mesh={dict(self.mesh.shape)} "
            f"preset={self.preset} steps/epoch={self.steps_per_epoch}"
        )

        # auto-resume (utils.py:531-644 semantics)
        start_epoch = int(cfg.train.get("start_epoch", 0))
        if cfg.train.get("auto_resume", True):
            restored = ckpt_lib.auto_load(
                self.exp_dir, state, cfg, logger=self.logger
            )
            if restored is not None:
                state, start_epoch = restored

        self.exp_logger = ExperimentLogger(
            cfg, self.output_dir,
            enable=jax.process_index() == 0,
        )
        train_step = self.make_train_step()

        best_metric = None
        minimize = cfg.get("minimize_metric") or "total_loss"
        history = []
        for epoch in range(start_epoch, int(cfg.train.epochs)):
            loader.set_epoch(epoch)
            state, epoch_stats = self.train_one_epoch(
                state, loader, train_step, epoch
            )
            val_stats = {}
            val_loader = self.data.val_loader()
            if len(val_loader) > 0:
                val_stats = self.evaluate(state, val_loader)

            metric = val_stats.get(minimize, epoch_stats.get(minimize))
            is_best = best_metric is None or (
                metric is not None and metric < best_metric
            )
            if is_best and metric is not None:
                best_metric = metric

            if (epoch + 1) % int(cfg.train.get("save_freq", 1)) == 0:
                ckpt_lib.save(
                    self.output_dir, state, cfg, epoch,
                    is_best=is_best, scan_root=self.exp_dir,
                    logger=self.logger,
                )
            stats = {"epoch": epoch, **epoch_stats,
                     **{f"val_{k}": v for k, v in val_stats.items()}}
            history.append(stats)
            if jax.process_index() == 0:
                with open(os.path.join(self.output_dir, "log_stats.json"), "a") as f:
                    f.write(json.dumps({k: float(v) if isinstance(v, (int, float, np.floating)) else v
                                        for k, v in stats.items()}) + "\n")
        if self.exp_logger and cfg.get("wandb", {}).get("alert", False):
            # end-of-phase alert (reference train/*/…:225-264, wandb.alert)
            self.exp_logger.alert(
                f"{cfg.train.phase} end",
                f"best {minimize} {best_metric} after "
                f"{int(cfg.train.epochs)} epochs (tag {cfg.get('tag', '')})",
            )
        self.exp_logger.finish()
        return {"best_metric": best_metric, "history": history, "state": state}

    def train_one_epoch(self, state, loader, train_step, epoch):
        from exploremultimodal_tpu.utils.profiling import check_finite_and_dump

        cfg = self.cfg
        meter = MetricLogger(logger=self.logger)
        epoch_arr = jnp.asarray(epoch, jnp.float32)
        print_freq = int(cfg.train.get("print_freq", 300))
        profile_steps = int(cfg.get("profile_steps", 0)) if epoch == 0 else 0
        profile_at = 3  # after warmup/compile
        i = 0
        for batch in meter.log_every(
            self.feeder(iter(loader)), print_freq, header=f"Epoch [{epoch}]"
        ):
            if profile_steps and i == profile_at:
                jax.profiler.start_trace(os.path.join(self.output_dir, "profile"))
            arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
            state, metrics = train_step(state, arrays, epoch_arr)
            if profile_steps and i == profile_at + profile_steps - 1:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                self.logger.info(
                    f"profiler trace written to {self.output_dir}/profile"
                )
                profile_steps = 0
            meter.update(**{k: v for k, v in metrics.items()})
            # host syncs happen only at logging cadence; the in-graph
            # per-loss isfinite filter handles transient components
            if i % print_freq == 0:
                check_finite_and_dump(
                    metrics, int(state.step), self.output_dir, self.logger
                )
            if self.exp_logger and i % 50 == 0:
                self.exp_logger.log(
                    head="train", step=int(state.step),
                    **{k: float(np.asarray(v)) for k, v in metrics.items()},
                )
            i += 1
        meter.synchronize_between_processes()
        return state, {k: m.global_avg for k, m in meter.meters.items()}

    # ------------------------------------------------------------------ eval

    def evaluate(self, state, loader) -> dict:
        """Count-weighted eval; with model_ema=true the dedicated eval EMA
        tree is evaluated (reference model_ema flag, conf/config.yaml:136-141
        + utils/utils.py:602-623) — independent of the vlmo_ema momentum
        encoder, so both may be enabled together."""
        eval_params = (
            state.model_ema_params
            if self.cfg.get("model_ema", False)
            and state.model_ema_params is not None
            else state.params
        )
        eval_step = self.make_eval_step()
        sums: dict[str, float] = {}
        weights: dict[str, float] = {}
        rng = jax.random.key(0)

        def add(key: str, value: float, weight: float) -> None:
            sums[key] = sums.get(key, 0.0) + value * weight
            weights[key] = weights.get(key, 0.0) + weight

        for batch in self.feeder(iter(loader)):
            rng, sub = jax.random.split(rng)
            arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
            metrics, counts, extra = eval_step(eval_params, arrays, sub)
            for k, v in metrics.items():
                count_key = k.replace("_mean_acc", "_count").replace(
                    "_mean_score", "_count"
                )
                if count_key != k and count_key not in counts:
                    # a per-sample-averaged metric MUST have its count; a
                    # silent weight-1 default would skew averages unnoticed
                    raise KeyError(
                        f"eval metric '{k}' has no matching '{count_key}' in "
                        f"counts {sorted(counts)}; emit it from the objective"
                    )
                add(k, float(np.asarray(v)),
                    float(np.asarray(counts.get(count_key, 1.0))))
            # NLVR2 dev/test bucketing by table_name (objectives.py:917-941)
            if "nlvr2_logits" in extra and isinstance(batch.get("table_name"), list):
                preds = np.asarray(extra["nlvr2_logits"]).argmax(-1)
                answers = np.asarray(batch["answers"])
                for bucket in ("dev", "test"):
                    sel = np.array(
                        [bucket in t for t in batch["table_name"]], bool
                    )
                    if sel.any():
                        add(f"nlvr2_{bucket}_acc",
                            float((preds[sel] == answers[sel]).mean()),
                            float(sel.sum()))
        return {k: sums[k] / max(weights[k], 1e-9) for k in sums}

    # ------------------------------------------------------- throughput mode

    def throughput(self, n_warmup: int = 20, n_iters: int = 200) -> float:
        """samples/sec of the full train step (reference throughput_mode,
        multimodal.py:458-482, measured with device sync instead of CUDA
        events). Timed in 4 chunks so a single compile/GC hiccup shows up as
        variance instead of silently moving the headline number."""
        loader = self.data.train_loader()
        batch = self.feeder(iter(loader)).__next__()
        state = self.init_state(batch)
        train_step = self.make_train_step()
        epoch_arr = jnp.asarray(0, jnp.float32)

        def sync(metrics):
            # tunneled backends: block_until_ready returns early; a host
            # readback is the reliable fence
            float(np.asarray(metrics["total_loss"]))

        for _ in range(n_warmup):
            state, m = train_step(state, batch, epoch_arr)
        sync(m)
        bs = self.cfg.data.batch_size
        n_chunks = 4
        per_chunk = max(n_iters // n_chunks, 1)
        chunk_sps = []
        for _ in range(n_chunks):
            t0 = time.perf_counter()
            for _ in range(per_chunk):
                state, m = train_step(state, batch, epoch_arr)
            sync(m)
            chunk_sps.append(per_chunk * bs / (time.perf_counter() - t0))
        sps = float(np.mean(chunk_sps))
        std = float(np.std(chunk_sps))
        self.logger.info(
            f"throughput: {sps:.1f} ± {std:.1f} samples/s "
            f"({bs / sps * 1000:.1f} ms/step, batch {bs}, "
            f"{n_chunks}×{per_chunk} iters)"
        )
        return sps
