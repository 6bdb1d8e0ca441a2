"""One-command parity harness for REAL reference weights (VERDICT r3 ask 4).

The repo's parity evidence is oracle-based (random weights through both
implementations). The BASELINE.json north star additionally demands parity
against the reference *recipe* with real pretrained checkpoints (OpenAI dVAE
pkl, BEiT/VLMo .pth) — unavailable in this offline environment. This script
is the harness that closes that gap the moment weights/data exist:

  python scripts/verify_parity.py --ckpt vlmo_base.pth \
      [--model vlmo_base] [--dvae encoder.pkl] \
      [--arrow /data/arrow --datasets coco --task mlm --max-batches 8]

Stages (each runs only if its input is given; all results on one JSON line):

  ckpt    torch .pth → import_torch_state (BEiT/VLMo auto-detect, pos-embed
          interpolation — models/import_torch.py, reference
          vlmo_module.py:301-319) → loaded/missing key report.
  logits  imported backbone re-exported to the functional torch oracle
          (tests/torch_oracle.py) and both run fp32 on deterministic inputs:
          per-stream (img_only / txt_only / fused) max-abs-diff + pooler —
          the "VLMo logits within fp32 tolerance" check, now on REAL weights.
  dvae    encoder.pkl (torch module or state dict) → import_dalle_torch_state
          → flax token ids; if the pickle yields a runnable torch module,
          bit-exact token agreement vs its argmax ids (reference
          modeling_discrete_vae.py:246-248).
  data    arrow dir present → Trainer.evaluate with the imported params on
          the val split: MLM accuracy / VQA score / ITC-ITM metrics
          (reference train/finetune/vqa.py:408-483 evaluate).

Offline test: tests/test_verify_parity.py drives every stage with generated
checkpoints + fixture arrow shards.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FP32_TOL = 5e-4  # max |Δ| on unit-scale logits ≈ fp32 accumulation noise


def _build_task(model: str, loss_names: str, max_text_len: int | None):
    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.models import build_model

    overrides = [
        f"model={model}",
        "train=pretrain_mum",
        f"train.loss_names=[{loss_names}]",
        "compute_dtype=float32",
        "model.drop_rate=0.0",
        "model.attn_drop_rate=0.0",
        "model.drop_path_rate=0.0",
    ]
    if max_text_len:
        overrides.append(f"model.max_text_len={max_text_len}")
    cfg = load_config(overrides)
    return build_model(cfg)


def stage_ckpt(task, ckpt_path: str) -> tuple[dict, object]:
    import jax

    from exploremultimodal_tpu.models.import_torch import (
        import_torch_state,
        load_torch_checkpoint,
    )
    from exploremultimodal_tpu.models.task import VlmoTask

    sd = load_torch_checkpoint(ckpt_path)
    c = task.config
    n_patch = (c.img_size // c.patch_size) ** 2
    batch = {
        "image": np.zeros((1, c.img_size, c.img_size, 3), np.float32),
        "text_ids": np.zeros((1, c.max_text_len), np.int32),
        "text_ids_mlm": np.zeros((1, c.max_text_len), np.int32),
        "text_labels_mlm": np.full((1, c.max_text_len), -100, np.int32),
        "text_mask": np.ones((1, c.max_text_len), np.int32),
        "image_bool_masked_pos": np.zeros((1, n_patch), np.int32),
        "mim_labels": np.zeros((1, n_patch), np.int32),
    }
    if "vqa" in c.loss_names:
        batch["vqa_targets"] = np.zeros((1, c.vqa_label_size), np.float32)
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        batch, method=VlmoTask.init_streams,
    )
    params, loaded, missing = import_torch_state(
        sd, variables["params"], max_text_len=c.max_text_len
    )
    report = {
        "torch_keys": len(sd),
        "loaded": len(loaded),
        "missing_target_paths": len(missing),
        "missing_sample": missing[:8],
    }
    return report, params


def stage_logits(task, params) -> dict:
    """Imported flax params vs the functional torch oracle, fp32, all three
    streams — fp32-tolerance logit parity on the REAL weights."""
    import jax.numpy as jnp
    import torch

    from exploremultimodal_tpu.models.vlmo import VLMO
    from tests import torch_oracle as oracle

    c = task.config
    bb = params["transformer"]
    w = oracle.export_backbone_weights(bb)
    rng = np.random.default_rng(0)
    B = 2
    img = rng.normal(size=(B, c.img_size, c.img_size, 3)).astype(np.float32)
    txt = rng.integers(0, c.vocab_size, (B, c.max_text_len))
    mask = np.ones((B, c.max_text_len), np.int64)
    mask[1, c.max_text_len // 2:] = 0
    n_patches = (c.img_size // c.patch_size) ** 2
    bmp = (rng.random((B, n_patches)) < 0.4).astype(np.int64)

    model = VLMO(
        img_size=c.img_size, patch_size=c.patch_size, embed_dim=c.embed_dim,
        depth=c.depth, num_heads=c.num_heads, max_text_len=c.max_text_len,
        vocab_size=c.vocab_size, fusion_layer=c.fusion_layer,
        init_values=c.init_values, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0,
    )
    variables = {"params": bb}
    t_img, t_txt, t_mask = (
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
        torch.from_numpy(txt),
        torch.from_numpy(mask),
    )

    out = {}
    ours_img, _ = model.apply(
        variables, img=jnp.asarray(img), bool_masked_pos=jnp.asarray(bmp),
        deterministic=True, method=VLMO.forward_features,
    )
    ref_img, _ = oracle.forward_features(
        w, c.depth, c.num_heads, c.fusion_layer,
        img=t_img, bool_masked_pos=torch.from_numpy(bmp),
    )
    out["img_only_max_abs"] = float(
        np.abs(np.asarray(ours_img) - ref_img.numpy()).max()
    )

    ours_txt, _ = model.apply(
        variables, txt=jnp.asarray(txt), txt_mask=jnp.asarray(mask),
        deterministic=True, method=VLMO.forward_features,
    )
    ref_txt, _ = oracle.forward_features(
        w, c.depth, c.num_heads, c.fusion_layer, txt=t_txt, txt_mask=t_mask,
    )
    out["txt_only_max_abs"] = float(
        np.abs(np.asarray(ours_txt) - ref_txt.numpy()).max()
    )

    ours_co, _ = model.apply(
        variables, img=jnp.asarray(img), txt=jnp.asarray(txt),
        txt_mask=jnp.asarray(mask), deterministic=True,
        method=VLMO.forward_features,
    )
    ref_co, _ = oracle.forward_features(
        w, c.depth, c.num_heads, c.fusion_layer,
        img=t_img, txt=t_txt, txt_mask=t_mask,
    )
    out["fused_max_abs"] = float(
        np.abs(np.asarray(ours_co) - ref_co.numpy()).max()
    )
    scale = float(np.abs(ref_co.numpy()).max())
    out["fused_ref_scale"] = round(scale, 3)
    out["pass"] = all(
        out[k] <= FP32_TOL * max(1.0, scale)
        for k in ("img_only_max_abs", "txt_only_max_abs", "fused_max_abs")
    )
    return out


def stage_dvae(pkl_path: str, image_size: int = 256, n_images: int = 4) -> dict:
    import jax.numpy as jnp
    import torch

    from exploremultimodal_tpu.models.dvae import (
        DalleEncoder,
        import_dalle_torch_state,
        map_pixels,
    )

    obj = torch.load(pkl_path, map_location="cpu", weights_only=False)
    module = obj if isinstance(obj, torch.nn.Module) else None
    sd = module.state_dict() if module is not None else dict(obj)
    # encoder hyperparameters inferred from the checkpoint itself (works for
    # the real OpenAI shapes 256/2/8192 and any reduced test fixture)
    n_hid = int(sd["blocks.input.w"].shape[0])
    vocab = int(sd["blocks.output.conv.w"].shape[0])
    n_blk = max(
        int(k.split(".block_")[1].split(".")[0])
        for k in sd if ".block_" in k
    )
    params = import_dalle_torch_state(sd, "encoder")
    enc = DalleEncoder(n_hid=n_hid, n_blk_per_group=n_blk, vocab_size=vocab,
                       dtype=jnp.float32)

    rng = np.random.default_rng(0)
    imgs = rng.random((n_images, image_size, image_size, 3)).astype(np.float32)
    logits = enc.apply({"params": params}, map_pixels(jnp.asarray(imgs)))
    ours = np.asarray(jnp.argmax(logits, axis=-1).reshape(n_images, -1))
    report = {"tokens_shape": list(ours.shape)}
    if module is not None:
        with torch.no_grad():
            x = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))
            eps = 0.1
            x = (1 - 2 * eps) * x + eps  # map_pixels (dall_e/utils.py:51-65)
            logits = module(x)
            ref = torch.argmax(logits, dim=1).reshape(n_images, -1).numpy()
        report["agreement"] = float((ours == ref).mean())
        report["bit_exact"] = bool((ours == ref).all())
    else:
        report["note"] = (
            "state-dict-only pickle: imported; no torch module to diff "
            "against (install the upstream dall_e package for golden tokens)"
        )
    return report


def stage_data(
    model: str, params, arrow_root: str, datasets: str, task_kind: str,
    max_batches: int,
) -> dict:
    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.train.trainer import Trainer

    loss_names = {"mlm": "mlm", "vqa": "vqa", "itc": "itc,itm"}[task_kind]
    phase = "finetune_vqa" if task_kind == "vqa" else "pretrain_mum"
    cfg = load_config([
        f"model={model}",
        f"train={phase}",
        f"train.loss_names=[{loss_names}]",
        f"train.datasets=[{','.join(d.strip() for d in datasets.split(','))}]",
        f"data.data_root={arrow_root}",
        "data.batch_size=8",
        "data.num_workers=2",
        "compute_dtype=float32",
        "exp_dir=/tmp/emm_verify_parity",
        "log_level=error",
    ])
    trainer = Trainer(cfg)
    loader = trainer.data.val_loader()
    batch = next(iter(trainer.feeder(iter(loader))))
    state = trainer.init_state(batch)
    state = state.replace(params=params)

    # bound the pass for quick checks
    def bounded(it):
        for i, b in enumerate(it):
            if i >= max_batches:
                break
            yield b

    metrics = trainer.evaluate(state, bounded(iter(loader)))
    return {k: round(float(v), 4) for k, v in metrics.items()}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", help="reference .pth checkpoint (VLMo or BEiT)")
    ap.add_argument("--model", default="vlmo_base")
    ap.add_argument("--loss-names", default="mlm,itc,itm,mim",
                    help="heads to construct before import")
    ap.add_argument("--max-text-len", type=int, default=None)
    ap.add_argument("--dvae", help="OpenAI dVAE encoder.pkl")
    ap.add_argument("--dvae-size", type=int, default=256)
    ap.add_argument("--arrow", help="arrow data root for accuracy eval")
    ap.add_argument("--datasets", default="coco")
    ap.add_argument("--task", default="mlm", choices=("mlm", "vqa", "itc"))
    ap.add_argument("--max-batches", type=int, default=32)
    ap.add_argument("--json", help="write the full report here too")
    args = ap.parse_args()

    if not (args.ckpt or args.dvae):
        ap.error("need --ckpt and/or --dvae")

    report: dict = {}
    params = None
    if args.ckpt:
        task = _build_task(args.model, args.loss_names, args.max_text_len)
        report["ckpt"], params = stage_ckpt(task, args.ckpt)
        report["logits"] = stage_logits(task, params)
    if args.dvae:
        report["dvae"] = stage_dvae(args.dvae, args.dvae_size)
    if args.arrow and params is not None:
        report["data"] = stage_data(
            args.model, params, args.arrow, args.datasets, args.task,
            args.max_batches,
        )
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
