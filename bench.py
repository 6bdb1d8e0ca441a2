"""Benchmarks for the five BASELINE.json configs.

Default (driver contract): the flagship VLMo-Base multitask pretrain step —
prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "images/s/chip", "vs_baseline": N}

`BENCH_MODE` selects other configs (BASELINE.json "configs"):
  vlmo_pretrain  full jitted pretrain step: on-device preprocess + frozen
                 dVAE tokenize + MLM+ITC+ITM+MIM + backward + AdamW  [default]
  dvae           DALL-E dVAE encoder tokenization, 256×256 → 32×32 codes
  dvae_w8a8      dvae with the trunk convs on the int8 MXU (quant_conv)
  bert_mlm       text-only MLM forward, seq len 196
  beit_mim       ViT-B/16 vision-only masked-image-modeling step (dVAE targets)
  vqa            VQAv2 finetune step (3129-way head)
  bert_mlm_w8a8  bert_mlm with the fused-MLP int8 kernel (serving config)
  vqa_serving    the serving API's VQA endpoint forward (infer._vqa_fn), b64
  vqa_serving_w8a8  same with the fused-MLP int8 kernel
  vlmo_large_pretrain  the full pretrain step at the reference's documented
                 operating scale (vlmo_large, misc/Dockerfile:24-28), b16
  all            run everything, write BENCHMARKS.json, print the flagship line

vs_baseline: ratio against estimated A100 throughput for the same op (the
reference publishes no numbers — see BENCH.md for the derivations).
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# estimated A100 reference throughputs (img/s or samples/s per chip); BENCH.md
A100_BASELINE = {
    "vlmo_pretrain": 150.0,
    # large/huge: backbone cost scales ~3.56x vs base (24·1024² / 12·768²
    # block-params ratio) while the dVAE/head terms stay fixed; the same
    # 40%-MFU A100 estimate gives 150/3.56 ≈ 42 img/s (the reference's real
    # operating point — misc/Dockerfile:24-28 trains vlmo_large)
    "vlmo_large_pretrain": 42.0,
    "vlmo_huge_pretrain": 42.0,  # reference "huge" == large scaling (SURVEY §2.2)
    "dvae": 1100.0,      # 256² dVAE encoder fwd, fp16 torch
    "bert_mlm": 2400.0,  # BERT-base fwd seq 196
    "beit_mim": 700.0,   # ViT-B/16 MIM train step
    "vqa": 480.0,        # VLMo-Base VQA train step (1 fused fwd + bwd)
    "vqa_serving": 1440.0,  # serving fwd ≈ 3× the train-step estimate (1/3 FLOPs)
}


def _setup_cache() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("EMM_JAX_CACHE", "/tmp/emm_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# canonical per-config batch sizes (single source of truth — BENCH.md cites
# BENCHMARKS.json produced with these; override all with BENCH_BATCH)
DEFAULT_BATCH = {
    "vlmo_pretrain": 32,
    "vlmo_large_pretrain": 16,  # largest validated on one v5e chip (BENCH.md)
    "vlmo_huge_pretrain": 16,
    "dvae": 32,
    "bert_mlm": 256,  # fwd-only bench: large batch is the realistic serving shape
    "beit_mim": 32,
    "vqa": 32,
    "vqa_serving": 64,  # serving bucket size (infer.Predictor max_batch default)
}

# v5e chip physics for the roofline columns (BENCH.md "Roofline" section):
# 197 TFLOP/s bf16 peak (115 TFLOP/s measured sustained matmul), ~819 GB/s HBM
V5E_PEAK_TFLOPS = 197.0
V5E_SUSTAINED_TFLOPS = 115.0
V5E_HBM_GBPS = 819.0


def _cost_analysis(compiled) -> dict:
    """flops / bytes accessed from XLA's cost model, plus roofline %s."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
    except Exception:
        return {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return {"flops": flops, "bytes_accessed": byts}


def _roofline(detail: dict) -> None:
    """Annotate a result's detail with achieved TFLOP/s + roofline fractions.
    `bytes accessed` is XLA's pre-fusion operand count, an UPPER bound on HBM
    traffic — the bandwidth %% is therefore a ceiling on how bandwidth-bound
    the config can be, not a measurement."""
    dt = detail.get("step_ms", 0.0) / 1e3
    if not dt or "flops" not in detail:
        return
    tflops = detail["flops"] / dt / 1e12
    gbps = detail["bytes_accessed"] / dt / 1e9
    detail["achieved_tflops"] = round(tflops, 1)
    detail["pct_sustained_matmul"] = round(100 * tflops / V5E_SUSTAINED_TFLOPS, 1)
    detail["pct_peak"] = round(100 * tflops / V5E_PEAK_TFLOPS, 1)
    detail["xla_bytes_gbps_upper"] = round(gbps, 1)
    detail["pct_hbm_upper"] = round(100 * gbps / V5E_HBM_GBPS, 1)


def _sync(out) -> None:
    # shared fence (utils/timing.py) — kept as an alias for the profiler
    # scripts that fence through the bench module
    from exploremultimodal_tpu.utils.timing import sync

    sync(out)


def _timeit(step, n_warmup: int, n_iters: int) -> float:
    # shared timing core (utils/timing.py): readback-fenced, same
    # methodology as the serving-latency sweep and throughput_mode
    from exploremultimodal_tpu.utils.timing import timeit

    return timeit(step, n_warmup, n_iters)


def _trainer(overrides: list[str]):
    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(overrides)
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    batch = next(iter(trainer.feeder(iter(loader))))
    state = trainer.init_state(batch)
    return trainer, state, batch


def _train_step_bench(
    metric: str,
    baseline_key: str,
    overrides: list[str],
    batch_size: int,
    n_warmup: int,
    n_iters: int,
) -> dict:
    import jax
    import jax.numpy as jnp

    trainer, state, batch = _trainer(overrides)
    train_step = trainer.make_train_step()
    epoch = jnp.asarray(0.0)
    holder = {"state": state, "metrics": None}

    def step():
        holder["state"], holder["metrics"] = train_step(
            holder["state"], batch, epoch
        )
        return holder["metrics"]["total_loss"]

    dt = _timeit(step, n_warmup, n_iters)
    n_chips = jax.device_count()
    ips = batch_size / dt / n_chips
    detail = {
        "batch_size": batch_size,
        "step_ms": round(dt * 1000, 1),
        "chips": n_chips,
        "platform": jax.devices()[0].platform,
        "total_loss": round(float(holder["metrics"]["total_loss"]), 3),
    }
    detail.update(_cost_analysis(
        train_step.lower(holder["state"], batch, epoch).compile()
    ))
    _roofline(detail)
    return {
        "metric": metric,
        "value": round(ips, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(ips / A100_BASELINE[baseline_key], 3),
        "detail": detail,
    }


def bench_vlmo_pretrain(batch_size: int, n_warmup: int, n_iters: int,
                        model: str) -> dict:
    size = model.removeprefix("vlmo_")
    baseline_key = (
        f"vlmo_{size}_pretrain"
        if f"vlmo_{size}_pretrain" in A100_BASELINE
        else "vlmo_pretrain"
    )
    # large/huge default to the remat policy the on-chip A/B picked:
    # dots 371.8 ms vs true 399.8 ms vs false OOM at b16 (BENCH.md r4
    # "vlmo_large" — the opposite of base scale, where dots regressed);
    # BENCH_REMAT still overrides
    default_remat = "dots" if size in ("large", "huge") else "false"
    result = _train_step_bench(
        f"vlmo_{size}_pretrain_step_images_per_sec_per_chip",
        baseline_key,
        [
            f"model={model}",
            "train=pretrain_mum",
            "train.datasets=[synthetic]",
            f"data.batch_size={batch_size}",
            f"data.synthetic_size={4 * batch_size}",
            "data.num_workers=4",
            "train.discrete_vae_type=random",
            "compute_dtype=bfloat16",
            # attention-prob dropout off by default (modern recipe;
            # hidden/droppath dropout stay on); BENCH_ATTN_DROP=0.1 exposes
            # the reference-default scenario for the in-kernel-dropout A/B
            f"model.attn_drop_rate={os.environ.get('BENCH_ATTN_DROP', '0.0')}",
            f"attn_impl={os.environ.get('BENCH_ATTN', 'recompute')}",
            # BENCH_REMAT: false (default; dots for large/huge) | true | dots
            f"parallel.remat={os.environ.get('BENCH_REMAT', default_remat)}",
            # BENCH_QUANTIZE=w8a8: backbone dots on the int8 MXU (ops/quant.py)
            f"model.quantize={os.environ.get('BENCH_QUANTIZE', 'none')}",
            # BENCH_MLP=fused: bf16 whole-MLP Pallas kernel — REGRESSES the
            # multitask step (204.8→211.1 ms, BENCH.md r5 A/B: the small-M
            # single-modality streams pay kernel overhead and the opaque
            # VJP breaks XLA's cross-op bwd fusions), so xla stays default
            f"model.mlp_impl={os.environ.get('BENCH_MLP', 'xla')}",
            # BENCH_DVAE_QUANT=w8a8: frozen tokenizer trunk on the int8 MXU
            # (ops/quant_conv.py; headline-step A/B for the dvae_w8a8 mode)
            "train.discrete_vae_quantize="
            + os.environ.get("BENCH_DVAE_QUANT", "none"),
            "train.warmup_steps=2",
            "exp_dir=/tmp/emm_bench",
            "log_level=error",
        ],
        batch_size, n_warmup, n_iters,
    )
    result["detail"]["losses"] = "mlm+itc+itm+mim (incl. dVAE tokenize)"
    result["detail"]["attn"] = (
        os.environ.get("BENCH_ATTN", "recompute")
        + f" (attn_drop {os.environ.get('BENCH_ATTN_DROP', '0.0')})"
    )
    return result


def bench_beit_mim(batch_size: int, n_warmup: int, n_iters: int) -> dict:
    # BENCH_ATTN_DROP / BENCH_ATTN expose the attn_drop=0.1 A/B scenario
    # (reference default, conf/model/vlmo_base.yaml): XLA-recompute pays a
    # materialized (B,H,N,N) mask pipeline there; impl=pallas regenerates the
    # mask inside the flash kernels (ops/flash_attention.py)
    attn_drop = os.environ.get("BENCH_ATTN_DROP", "0.0")
    result = _train_step_bench(
        "beit_vitb16_mim_step_images_per_sec_per_chip",
        "beit_mim",
        [
            "model=vlmo_base",
            "train=pretrain_vis",
            "train.datasets=[synthetic]",
            f"data.batch_size={batch_size}",
            f"data.synthetic_size={4 * batch_size}",
            "data.num_workers=4",
            "train.discrete_vae_type=random",
            "compute_dtype=bfloat16",
            # same modern-recipe setting as the headline config
            f"model.attn_drop_rate={attn_drop}",
            f"attn_impl={os.environ.get('BENCH_ATTN', 'recompute')}",
            # bf16 whole-MLP Pallas kernel wins here: 57.6→55.2 ms
            # (BENCH.md r5 A/B); BENCH_MLP=xla restores the mega-fusion
            f"model.mlp_impl={os.environ.get('BENCH_MLP', 'fused')}",
            "train.warmup_steps=2",
            "exp_dir=/tmp/emm_bench_mim",
            "log_level=error",
        ],
        batch_size, n_warmup, n_iters,
    )
    result["detail"]["attn"] = (
        os.environ.get("BENCH_ATTN", "recompute") + f" (attn_drop {attn_drop})"
    )
    return result


def bench_vqa(batch_size: int, n_warmup: int, n_iters: int) -> dict:
    return _train_step_bench(
        "vlmo_base_vqa_finetune_step_images_per_sec_per_chip",
        "vqa",
        [
            "model=vlmo_base",
            "train=finetune_vqa",
            "train.datasets=[synthetic]",
            f"data.batch_size={batch_size}",
            f"data.synthetic_size={4 * batch_size}",
            "data.num_workers=4",
            "compute_dtype=bfloat16",
            # same modern-recipe setting as the headline config
            "model.attn_drop_rate=0.0",
            f"attn_impl={os.environ.get('BENCH_ATTN', 'recompute')}",
            # bf16 whole-MLP Pallas kernel wins here too: 54.6-55.1 →
            # 53.9 ms (BENCH.md r5 A/B — every single-fused-stream config
            # gains; only the multi-stream headline keeps xla)
            f"model.mlp_impl={os.environ.get('BENCH_MLP', 'fused')}",
            "train.warmup_steps=2",
            "exp_dir=/tmp/emm_bench_vqa",
            "log_level=error",
        ],
        batch_size, n_warmup, n_iters,
    )


def bench_dvae(batch_size: int, n_warmup: int, n_iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from exploremultimodal_tpu.models.dvae import DalleVAE, map_pixels

    # bf16 compute (vs the fp16 torch A100 baseline); fused=False — the XLA
    # conv path beats the Pallas fused kernel ~2.2× at this shape (BENCH.md).
    # BENCH_DVAE_QUANT=w8a8|w8a8_shifted: trunk convs on the int8 MXU
    vae = DalleVAE(256, dtype=jnp.bfloat16,
                   fused=os.environ.get("BENCH_DVAE_FUSED", "") == "1",
                   quantize=os.environ.get("BENCH_DVAE_QUANT", "none"))
    vae.init_random(jax.random.key(0))
    img = jnp.asarray(
        np.random.default_rng(0).random((batch_size, 256, 256, 3)), jnp.float32
    )
    tokenize = jax.jit(lambda x: vae.get_codebook_indices(map_pixels(x)))

    dt = _timeit(lambda: tokenize(img), n_warmup, n_iters)
    n_chips = jax.device_count()
    ips = batch_size / dt / n_chips
    ids = tokenize(img)
    assert ids.shape == (batch_size, 32 * 32)
    detail = {"batch_size": batch_size, "step_ms": round(dt * 1000, 2),
              "tokens": "32x32",
              "quantize": os.environ.get("BENCH_DVAE_QUANT", "none")}
    detail.update(_cost_analysis(tokenize.lower(img).compile()))
    _roofline(detail)
    return {
        "metric": "dvae_tokenize_256_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(ips / A100_BASELINE["dvae"], 3),
        "detail": detail,
    }


def bench_bert_mlm(batch_size: int, n_warmup: int, n_iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.models import build_model
    from exploremultimodal_tpu.models.task import VlmoTask

    cfg = load_config(
        ["model=vlmo_base", "train=pretrain_txt", "model.max_text_len=196",
         "compute_dtype=bfloat16", "model.drop_rate=0.0",
         "model.attn_drop_rate=0.0", "model.drop_path_rate=0.0",
         # BENCH_ATTN: xla | recompute | pallas | jax_flash (r4 A/B; the
         # default 'auto' resolves to recompute with dropout off)
         f"attn_impl={os.environ.get('BENCH_ATTN', 'auto')}",
         # BENCH_QUANTIZE=w8a8: forward-only config — the int8 MXU scenario
         f"model.quantize={os.environ.get('BENCH_QUANTIZE', 'none')}",
         # bf16 whole-MLP Pallas kernel wins here: 129.4→123.6 ms (BENCH.md
         # r5 A/B; the int8 fused MLP is faster still for int8-tolerant
         # serving — bert_mlm_w8a8); BENCH_MLP=xla restores the mega-fusion
         f"model.mlp_impl={os.environ.get('BENCH_MLP', 'fused')}"]
    )
    task = build_model(cfg)
    rng = np.random.default_rng(0)
    L = 196
    batch = {
        "image": jnp.zeros((1, 224, 224, 3)),
        "text_ids": jnp.asarray(rng.integers(0, 30522, (batch_size, L))),
        "text_ids_mlm": jnp.asarray(rng.integers(0, 30522, (batch_size, L))),
        "text_labels_mlm": jnp.asarray(
            np.where(rng.random((batch_size, L)) < 0.15,
                     rng.integers(0, 30522, (batch_size, L)), -100)
        ),
        "text_mask": jnp.ones((batch_size, L), jnp.int32),
    }
    # no image: pretrain_txt's expert layout has no 'vl' route, so MLM must
    # run text-only; init_streams builds its own dummy image for the 'v'
    # experts the layout keeps
    init_batch = {k: v for k, v in batch.items() if k != "image"}
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        init_batch, method=VlmoTask.init_streams,
    )
    fwd_batch = dict(init_batch)
    fwd_batch["image"] = None

    @jax.jit
    def fwd(params):
        out = task.apply({"params": params}, fwd_batch,
                         rngs={"sample": jax.random.key(2)})
        return out["mlm_task_loss"]

    dt = _timeit(lambda: fwd(variables["params"]), n_warmup, n_iters)
    n_chips = jax.device_count()
    sps = batch_size / dt / n_chips
    detail = {"batch_size": batch_size, "step_ms": round(dt * 1000, 2),
              "quantize": os.environ.get("BENCH_QUANTIZE", "none")}
    detail.update(_cost_analysis(fwd.lower(variables["params"]).compile()))
    _roofline(detail)
    return {
        "metric": "bert_base_mlm_fwd_seq196_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / A100_BASELINE["bert_mlm"], 3),
        "detail": detail,
    }


def bench_vqa_serving(batch_size: int, n_warmup: int, n_iters: int) -> dict:
    """The serving API's VQA endpoint forward (infer._vqa_fn: uint8 image
    normalize → fused img-txt stream → 3129-way head), deterministic, at a
    serving bucket size. BENCH_QUANTIZE=w8a8_pallas_mlp measures the int8
    fused-MLP configuration on the flagship serving path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.infer import _vqa_fn
    from exploremultimodal_tpu.models import build_model
    from exploremultimodal_tpu.models.task import VlmoTask

    quant = os.environ.get("BENCH_QUANTIZE", "none")
    cfg = load_config(
        ["model=vlmo_base", "train=finetune_vqa", "compute_dtype=bfloat16",
         "model.drop_rate=0.0", "model.attn_drop_rate=0.0",
         "model.drop_path_rate=0.0", f"model.quantize={quant}",
         # bf16 fused whole-MLP kernel wins the bf16 serving path: 30.9 →
         # 26.5 ms (BENCH.md r5 A/B; accuracy-neutral vs the int8 path's
         # 1.5% answer-flip rate). No-op under quantize=w8a8_pallas_mlp
         # (the int8 whole-MLP branch takes precedence at the mlp site).
         f"model.mlp_impl={os.environ.get('BENCH_MLP', 'fused')}"]
    )
    task = build_model(cfg)
    c = task.config
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 256, (batch_size, c.img_size, c.img_size, 3)),
        jnp.uint8,
    )
    ids = jnp.asarray(rng.integers(0, 30522, (batch_size, c.max_text_len)),
                      jnp.int32)
    mask = jnp.ones((batch_size, c.max_text_len), jnp.int32)
    dummy = {
        "image": jnp.zeros((1, c.img_size, c.img_size, 3), jnp.float32),
        "text_ids": jnp.zeros((1, c.max_text_len), jnp.int32),
        "text_mask": jnp.ones((1, c.max_text_len), jnp.int32),
    }
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        dummy, method=VlmoTask.init_inference,
    )

    fwd = jax.jit(lambda v, i, t, m: task.apply(v, i, t, m, method=_vqa_fn))
    dt = _timeit(lambda: fwd(variables, img, ids, mask), n_warmup, n_iters)
    n_chips = jax.device_count()
    ips = batch_size / dt / n_chips
    detail = {"batch_size": batch_size, "step_ms": round(dt * 1000, 2),
              "quantize": quant, "text_len": int(c.max_text_len)}
    detail.update(_cost_analysis(
        fwd.lower(variables, img, ids, mask).compile()))
    _roofline(detail)
    return {
        "metric": "vlmo_base_vqa_serving_fwd_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/s/chip",
        # denominator in the same family as the others: a forward pass is
        # ~1/3 of a train step's FLOPs, so the A100 serving estimate is
        # 3 × the 480 img/s train-step estimate (derivation in BENCH.md)
        "vs_baseline": round(ips / A100_BASELINE["vqa_serving"], 3),
        "detail": detail,
    }


def _arm_watchdog(default_s: float = 7200.0) -> None:
    """Hard wall-clock limit (BENCH_TIMEOUT_S, default 2h; 5h for all-mode):
    if the tunneled TPU backend wedges mid-run (observed: jax.devices()/
    execution blocking indefinitely after a tunnel outage), emit a
    machine-readable error line instead of hanging the driver forever."""
    import threading

    limit = float(os.environ.get("BENCH_TIMEOUT_S", str(default_s)))

    def _abort():
        print(json.dumps({
            "metric": "error",
            "value": 0,
            "unit": "",
            "vs_baseline": 0,
            "detail": {"error": f"bench watchdog: exceeded {limit:.0f}s "
                                "(TPU tunnel hang?)"},
        }), flush=True)
        os._exit(75)  # EX_TEMPFAIL

    t = threading.Timer(limit, _abort)
    t.daemon = True
    t.start()


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "vlmo_pretrain")
    _arm_watchdog(default_s=18000.0 if mode == "all" else 7200.0)
    _setup_cache()
    batch_env = os.environ.get("BENCH_BATCH")
    n_warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    model = os.environ.get("BENCH_MODEL", "vlmo_base")

    def bs(key: str) -> int:
        return int(batch_env) if batch_env else DEFAULT_BATCH[key]

    def pretrain_bs(m: str) -> int:
        # resolve the canonical batch from the MODEL size (BENCH_MODEL=
        # vlmo_large/huge under mode vlmo_pretrain must pick the validated
        # b16, not base's b32)
        key = f"vlmo_{m.removeprefix('vlmo_')}_pretrain"
        return bs(key if key in DEFAULT_BATCH else "vlmo_pretrain")

    runners = {
        "vlmo_pretrain": lambda: bench_vlmo_pretrain(
            pretrain_bs(model), n_warmup, n_iters, model),
        # the reference's documented operating point (misc/Dockerfile:24-28)
        "vlmo_large_pretrain": lambda: bench_vlmo_pretrain(
            bs("vlmo_large_pretrain"), n_warmup, n_iters, "vlmo_large"),
        "dvae": lambda: bench_dvae(bs("dvae"), n_warmup, n_iters),
        # int8-MXU trunk convs (ops/quant_conv.py; BENCH.md "dvae int8")
        "dvae_w8a8": lambda: (
            os.environ.setdefault("BENCH_DVAE_QUANT", "w8a8"),
            bench_dvae(bs("dvae"), n_warmup, n_iters),
        )[1],
        "bert_mlm": lambda: bench_bert_mlm(bs("bert_mlm"), n_warmup, n_iters),
        # the fused-MLP int8 serving configuration (ops/quant_pallas.py;
        # BENCH.md "Pallas fused W8A8"): same forward, quantize=w8a8_pallas_mlp
        "bert_mlm_w8a8": lambda: (
            os.environ.__setitem__("BENCH_QUANTIZE", "w8a8_pallas_mlp"),
            bench_bert_mlm(bs("bert_mlm"), n_warmup, n_iters),
        )[1],
        "beit_mim": lambda: bench_beit_mim(bs("beit_mim"), n_warmup, n_iters),
        "vqa": lambda: bench_vqa(bs("vqa"), n_warmup, n_iters),
        "vqa_serving": lambda: bench_vqa_serving(
            bs("vqa_serving"), n_warmup, n_iters),
        "vqa_serving_w8a8": lambda: (
            os.environ.__setitem__("BENCH_QUANTIZE", "w8a8_pallas_mlp"),
            bench_vqa_serving(bs("vqa_serving"), n_warmup, n_iters),
        )[1],
    }

    if mode == "all":
        # Each config runs in its OWN subprocess with its own timeout: a
        # tunnel hang or OOM in one config can't take down the rest, and
        # every config gets a fresh TPU client (observed: a wedged client
        # poisons all later work in the same process).
        import subprocess
        import sys as _sys

        per_cfg_timeout = float(os.environ.get("BENCH_CONFIG_TIMEOUT_S",
                                               "3600"))
        results = {}
        for name in runners:
            env = dict(os.environ)
            env["BENCH_MODE"] = name
            if name == "bert_mlm_w8a8":
                env["BENCH_QUANTIZE"] = "w8a8_pallas_mlp"
            env.setdefault("BENCH_TIMEOUT_S", str(per_cfg_timeout))
            try:
                proc = subprocess.run(
                    [_sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True,
                    timeout=per_cfg_timeout + 60,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                line = next(
                    (l for l in reversed(proc.stdout.splitlines())
                     if l.startswith("{")), None,
                )
                if line is None:
                    raise RuntimeError(
                        f"no JSON line (rc={proc.returncode}); stderr tail: "
                        + proc.stderr[-300:]
                    )
                results[name] = json.loads(line)
            except Exception as e:  # keep going; record the failure
                results[name] = {"error": f"{type(e).__name__}: {e}"}
        with open("BENCHMARKS.json", "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(results.get("vlmo_pretrain", {})))
        return

    print(json.dumps(runners[mode]()))


if __name__ == "__main__":
    sys.exit(main())
