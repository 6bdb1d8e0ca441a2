"""VlmoTask: backbone + per-loss heads + the multitask forward.

Reference parity: models/vlmo/vlmo_module.py (VlmoModule). One linen module
owns the VLMO backbone and every head gated by loss_names, exposes the same
`infer(batch, infer_mode, mask_txt, mask_img, image_token_type_idx)` contract
(vlmo_module.py:321-393), and `__call__(batch)` unions the active objectives
(vlmo_module.py:395-436). Config is a frozen dataclass so the module is
hashable for jit.

The frozen dVAE is NOT a submodule: MIM token targets are computed outside
the task apply by the tokenizer (train/trainer.py) and arrive in the batch as
`mim_labels` — keeping the task a pure function of (params, batch, rng).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from exploremultimodal_tpu.models import heads as H
from exploremultimodal_tpu.models.vlmo import VLMO, expert_layout
from exploremultimodal_tpu.objectives import losses as obj


@dataclasses.dataclass(frozen=True)
class VlmoConfig:
    """Static model+task configuration (hashable for jit)."""

    # backbone (conf/model/*.yaml)
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.1
    drop_path_rate: float = 0.1
    norm_eps: float = 1e-12
    init_values: float | None = 0.1
    vocab_size: int = 30522
    max_text_len: int = 40
    fusion_layer: int = 6
    img_vocab_size: int = 8192
    itc_dim: int = 256
    itc_temp: float = 0.07
    num_classes: int = 0

    # task (conf/train/*.yaml)
    phase: str | None = None
    loss_names: tuple[str, ...] = ()
    vqa_label_size: int = 3129
    mim_head_pos: str = "img"
    global_reduce: bool = False
    kl_alpha: float = 0.0
    isda_lambda: float = 0.0
    # masked-head gather caps (fraction of positions the MLM/MIM vocab heads
    # compute logits for; 1.0 = full sequence, reference behavior). MLM
    # default leaves >6 sigma over mlm_prob=0.15 incl. WWM bursts; the
    # blockwise/random image mask generators never exceed num_mask_patches
    # (75 of 196 = 0.383 by default), so 0.4 is exact for MIM.
    mlm_gather_cap: float = 0.375
    mim_gather_cap: float = 0.4

    # compute
    dtype_name: str = "float32"
    attn_impl: str = "xla"
    remat: bool | str = False
    # "w8a8"/"w8a8_pallas": backbone qkv/proj/fc1/fc2 forwards on the int8
    # MXU (ops/quant.py; _pallas fuses quantization into the matmul kernel,
    # ops/quant_pallas.py), straight-through bf16 backward. Beyond-the-
    # reference option (the reference is fp16 AMP); parity configs use "none".
    quantize: str = "none"
    # "fused": bf16 whole-MLP Pallas kernel (ops/mlp_pallas.py) — the
    # hidden never hits HBM; gated to shapes whose weights fit VMEM
    mlp_impl: str = "xla"

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_name)

    @classmethod
    def from_config(cls, cfg) -> "VlmoConfig":
        m, t = cfg.model, cfg.train
        return cls(
            img_size=m.img_size,
            patch_size=m.patch_size,
            embed_dim=m.embed_dim,
            depth=m.depth,
            num_heads=m.num_heads,
            mlp_ratio=float(m.mlp_ratio),
            drop_rate=m.drop_rate,
            attn_drop_rate=m.attn_drop_rate,
            drop_path_rate=m.drop_path_rate,
            norm_eps=m.get("norm_eps", 1e-12),
            init_values=m.init_values,
            vocab_size=m.vocab_size,
            max_text_len=m.max_text_len,
            fusion_layer=m.fusion_layer,
            img_vocab_size=m.img_vocab_size,
            itc_dim=m.itc_dim,
            itc_temp=m.itc_temp,
            num_classes=int(m.get("num_classes", 0)),
            phase=t.phase,
            loss_names=tuple(t.loss_names),
            vqa_label_size=cfg.data.get("vqav2_label_size", 3129),
            mim_head_pos=t.get("mim_head_pos", "img"),
            global_reduce=bool(t.get("global_reduce", False)),
            kl_alpha=float(t.get("kl_alpha", 0.0)),
            isda_lambda=float(t.get("isda_lambda", 0.0)),
            mlm_gather_cap=float(t.get("mlm_gather_cap", 0.375)),
            mim_gather_cap=float(t.get("mim_gather_cap", 0.4)),
            dtype_name=cfg.get("compute_dtype", "float32"),
            attn_impl=cfg.get("attn_impl", "xla"),
            quantize=str(m.get("quantize", "none")),
            mlp_impl=str(m.get("mlp_impl", "xla")),
            # false | true | 'dots' (selective save-dots policy)
            remat=(lambda r: r if isinstance(r, str) else bool(r))(
                cfg.select("parallel.remat", False)),
        )


class VlmoTask(nn.Module):
    config: VlmoConfig

    def setup(self) -> None:
        c = self.config
        num_token_types = 3 if "nlvr2" in c.loss_names else 2
        self.transformer = VLMO(
            img_size=c.img_size,
            patch_size=c.patch_size,
            embed_dim=c.embed_dim,
            depth=c.depth,
            num_heads=c.num_heads,
            mlp_ratio=c.mlp_ratio,
            drop_rate=c.drop_rate,
            attn_drop_rate=c.attn_drop_rate,
            drop_path_rate=c.drop_path_rate,
            norm_eps=c.norm_eps,
            init_values=c.init_values,
            vocab_size=c.vocab_size,
            max_text_len=c.max_text_len,
            fusion_layer=c.fusion_layer,
            num_token_types=num_token_types,
            experts_per_block=expert_layout(c.depth, c.fusion_layer, c.phase),
            dtype=c.dtype,
            attn_impl=c.attn_impl,
            remat=c.remat,
            quantize=c.quantize,
            mlp_impl=c.mlp_impl,
        )
        hs = c.embed_dim
        if "mlm" in c.loss_names:
            self.mlm_head = H.MLMTransform(
                dim=hs, vocab_size=c.vocab_size, norm_eps=c.norm_eps, dtype=c.dtype
            )
        if "itc" in c.loss_names:
            self.itc_head = H.ITCHead(out_dim=c.itc_dim, dtype=c.dtype)
            self.itc_temp = self.param(
                "itc_temp",
                lambda _: jnp.asarray(np.log(1.0 / c.itc_temp), jnp.float32),
            )
        if "itm" in c.loss_names:
            self.itm_head = H.ITMHead(dtype=c.dtype)
        if "mim" in c.loss_names:
            self.mim_head = H.MIMHead(vocab_size=c.img_vocab_size, dtype=c.dtype)
        if "mpp" in c.loss_names:
            self.mpp_head = H.MPPHead(dim=hs, norm_eps=c.norm_eps, dtype=c.dtype)
        if "mae" in c.loss_names:
            self.mae_head = H.MAEHead(patch_size=c.patch_size, dtype=c.dtype)
        if "vqa" in c.loss_names:
            self.vqa_classifier = H.VQAClassifier(
                dim=hs, num_classes=c.vqa_label_size, norm_eps=c.norm_eps,
                dtype=c.dtype,
            )
        if "nlvr2" in c.loss_names:
            self.nlvr2_classifier = H.NLVR2Classifier(
                dim=hs, norm_eps=c.norm_eps, dtype=c.dtype
            )
        if "irtr" in c.loss_names:
            self.rank_output = H.RankHead(dtype=c.dtype)
        if "imgcls" in c.loss_names:
            self.img_classifier = H.ImgClsHead(
                num_classes=c.num_classes or 1000, dtype=c.dtype
            )
        if "refcoco" in c.loss_names:
            self.ref_head = H.RefHead(
                dim=hs, norm_eps=c.norm_eps, dtype=c.dtype
            )

    # -------------------------------------------------------------- infer

    def infer(
        self,
        batch: dict,
        infer_mode: str = "img-txt",
        mask_txt: bool = False,
        mask_img: bool = False,
        image_token_type_idx: int = 1,
        deterministic: bool = True,
    ) -> dict:
        """Reference vlmo_module.py:321-393 contract."""
        assert infer_mode in ("img_only", "txt_only", "img-txt")

        img = bool_masked_pos = None
        txt_ids = txt_labels = txt_mask = None

        if "img" in infer_mode:
            imgkey = (
                f"image_{image_token_type_idx - 1}"
                if f"image_{image_token_type_idx - 1}" in batch
                else "image"
            )
            img = batch[imgkey]
            if mask_img:
                bool_masked_pos = batch["image_bool_masked_pos"]

        if "txt" in infer_mode:
            suffix = "_mlm" if mask_txt else ""
            txt_ids = batch[f"text_ids{suffix}"]
            txt_labels = batch[f"text_labels{suffix}"] if mask_txt else None
            txt_mask = batch["text_mask"]

        co_feats, co_masks = self.transformer.forward_features(
            img=img,
            txt=txt_ids,
            txt_mask=txt_mask,
            bool_masked_pos=bool_masked_pos,
            img_token_type_idx=image_token_type_idx,
            deterministic=deterministic,
        )

        if txt_ids is not None:
            txt_feats = co_feats[:, : self.config.max_text_len]
            img_feats = co_feats[:, self.config.max_text_len:]
        else:
            txt_feats, img_feats = None, co_feats

        return {
            "txt_feats": txt_feats,
            "img_feats": img_feats,
            "co_feats": co_feats,
            "cls_feats": self.transformer.pool(co_feats),
            "img_bool_masked_pos": bool_masked_pos,
            "txt_labels": txt_labels,
            "txt_ids": txt_ids,
            "txt_masks": txt_mask,
            "co_masks": co_masks,
        }

    # ------------------------------------------------------------ head fns

    def mlm_logits(self, txt_feats: jax.Array) -> jax.Array:
        h = self.mlm_head(txt_feats)
        return self.transformer.attend_vocab(h) + self.mlm_head.bias()

    def itc_project(self, feats: jax.Array, route: str) -> jax.Array:
        return self.itc_head(feats, route)

    def itc_temp_value(self) -> jax.Array:
        return self.itc_temp

    def itm_logits(self, cls_feats: jax.Array) -> jax.Array:
        return self.itm_head(cls_feats)

    def mim_logits(self, patch_feats: jax.Array) -> jax.Array:
        return self.mim_head(patch_feats)

    def mpp_logits(self, patch_feats: jax.Array) -> jax.Array:
        return self.mpp_head(patch_feats)

    def mae_logits(self, patch_feats: jax.Array) -> jax.Array:
        return self.mae_head(patch_feats)

    def vqa_logits(self, cls_feats: jax.Array, return_hidden: bool = False):
        return self.vqa_classifier(cls_feats, return_hidden=return_hidden)

    def vqa_last_kernel(self) -> jax.Array:
        return self.vqa_classifier.variables["params"]["fc2"]["kernel"]

    def nlvr2_logits(self, cls_feats: jax.Array) -> jax.Array:
        return self.nlvr2_classifier(cls_feats)

    def ref_box(self, cls_feats: jax.Array) -> jax.Array:
        return self.ref_head(cls_feats)

    def rank_logits(self, cls_feats: jax.Array) -> jax.Array:
        return self.rank_output(cls_feats)

    def imgcls_logits(self, cls_feats: jax.Array) -> jax.Array:
        return self.img_classifier(cls_feats)

    def stream_below_fusion(self, img=None, txt=None, txt_mask=None,
                            deterministic=True):
        return self.transformer.stream_below_fusion(
            img=img, txt=txt, txt_mask=txt_mask, deterministic=deterministic
        )

    def fuse_from_hidden(self, img_hidden, txt_hidden, txt_mask,
                         deterministic=True):
        return self.transformer.fuse_from_hidden(
            img_hidden, txt_hidden, txt_mask, deterministic=deterministic
        )

    def continue_single_stream(self, x, mask, route, deterministic=True):
        return self.transformer.continue_single_stream(
            x, mask, route, deterministic=deterministic
        )

    def pool_feats(self, co_feats):
        return self.transformer.pool(co_feats)

    def backbone_interval_img(
        self, img, bool_masked_pos, out_layer, deterministic=True
    ):
        """MIM mim_head_pos='fusion' path: image stream through
        blocks[0:fusion_layer] only (objectives.py:556-567)."""
        B = img.shape[0]
        mask = jnp.ones((B, self.transformer.num_patches + 1), jnp.int32)
        return self.transformer.forward_interval(
            img,
            mask=mask,
            route="v",
            need_embed=True,
            bool_masked_pos=bool_masked_pos,
            in_layer=0,
            out_layer=out_layer,
            need_norm=True,
            deterministic=deterministic,
        )

    # ----------------------------------------------------------- momentum

    def itc_momentum_feats(self, batch: dict) -> dict:
        """Projected global (and local) features for the momentum branch of
        ITC (objectives.py:116-137). Applied with the EMA params by the
        trainer; runs the augmented image when present."""
        aug = dict(batch)
        if batch.get("image_aug") is not None:
            aug["image"] = batch["image_aug"]
        img_infer = self.infer(aug, infer_mode="img_only")
        txt_infer = self.infer(aug, infer_mode="txt_only")
        i_feat_m = self.itc_project(img_infer["co_feats"][:, 0], "v")
        t_feat_m = self.itc_project(txt_infer["co_feats"][:, 0], "l")
        i_feat_l = self.itc_project(img_infer["co_feats"][:, 1:], "v")
        t_feat_l = self.itc_project(txt_infer["co_feats"][:, 1:], "l")
        return {
            "i_feat_m": i_feat_m,
            "t_feat_m": t_feat_m,
            "i_feat_l_m": obj.patch_pooling(i_feat_l),
            "t_feat_l_m": t_feat_l,
            # text mask matching t_feat_l_m's rows — carried with the feats so
            # the g2l loss stays full-batch under gradient accumulation
            "t_mask_m": batch["text_mask"][:, 1:],
        }

    # ------------------------------------------------------------ forward

    def __call__(
        self,
        batch: dict,
        deterministic: bool = True,
        axis_name: str | None = None,
        momentum_feats: dict | None = None,
        queue: dict | None = None,
        isda_state=None,
        isda_ratio: float = 0.0,
        pos_offset: jax.Array | int = 0,
    ) -> dict:
        """Union of active objectives (vlmo_module.py:395-436). `pos_offset`
        is this microbatch's row offset into full-batch momentum features
        under gradient accumulation (see compute_itc)."""
        names = self.config.loss_names
        ret: dict = {}
        if not names:
            ret.update(self.infer(batch, deterministic=deterministic))
            return ret

        # ITC runs first: its below-fusion single-modality hidden states
        # (itc_h_img/itc_h_txt) are shared with MLM's fused forward and
        # ITM's pair streams — one computation feeds all three objectives
        # (the reference recomputes these streams per objective).
        if "itc" in names:
            ret.update(
                obj.compute_itc(
                    self, batch, deterministic,
                    axis_name=axis_name,
                    momentum_feats=momentum_feats,
                    queue=queue,
                    pos_offset=pos_offset,
                )
            )
        shared = ret if "itc" in names else None
        # (A merged MLM+ITM fused-top pass — both objectives' rows through
        # ONE 4·bs fuse_from_hidden over the shared vl-expert weights — was
        # A/B'd in round 3 and REGRESSED the headline step 209→229 ms: the
        # (4·bs, N, C) concats materialize ~76 MB/step and XLA schedules the
        # two smaller streams better. See BENCH.md round 3.)
        if "mlm" in names:
            ret.update(obj.compute_mlm(self, batch, deterministic, shared=shared))
        if "mim" in names:
            ret.update(obj.compute_mim(self, batch, deterministic))
        if "itm" in names:
            ret.update(obj.compute_itm(self, batch, shared,
                                       deterministic=deterministic,
                                       pos_offset=pos_offset))
        if "vqa" in names:
            ret.update(
                obj.compute_vqa(
                    self, batch, deterministic,
                    isda_state=isda_state, isda_ratio=isda_ratio,
                )
            )
        if "nlvr2" in names:
            ret.update(obj.compute_nlvr2(self, batch, deterministic))
        if "irtr" in names:
            ret.update(obj.compute_irtr(self, batch, deterministic))
        if "mpp" in names:
            ret.update(obj.compute_mpp(self, batch, deterministic))
        if "mae" in names:
            ret.update(obj.compute_mae(self, batch, deterministic))
        if "imgcls" in names:
            ret.update(obj.compute_imgcls(self, batch, deterministic))
        if "refcoco" in names:
            ret.update(obj.compute_refcoco(self, batch, deterministic))
        return ret

    def init_inference(self, batch: dict) -> dict:
        """Init every route + head from an INFERENCE batch (image/text_ids/
        text_mask only — no training loss fields). The serving path
        (infer.py Predictor) uses this so loading a checkpoint never
        requires constructing MLM labels, masks, or dVAE targets."""
        c = self.config
        self.transformer.init_streams(
            batch["image"], batch["text_ids"], batch["text_mask"]
        )
        B = batch["image"].shape[0]
        cls = jnp.zeros((B, c.embed_dim), c.dtype)
        seq = jnp.zeros((B, 1, c.embed_dim), c.dtype)
        out: dict = {}
        names = c.loss_names
        if "mlm" in names:
            out["mlm"] = self.mlm_logits(seq)
        if "itc" in names:
            out["itc_v"] = self.itc_project(cls, "v")
            out["itc_l"] = self.itc_project(cls, "l")
        if "itm" in names:
            out["itm"] = self.itm_logits(cls)
        if "mim" in names:
            out["mim"] = self.mim_logits(seq)
        if "mpp" in names:
            out["mpp"] = self.mpp_logits(seq)
        if "mae" in names:
            out["mae"] = self.mae_logits(seq)
        if "vqa" in names:
            out["vqa"] = self.vqa_logits(cls)
        if "nlvr2" in names:
            # the nlvr2 head sees the CONCATENATED two-image cls feats
            out["nlvr2"] = self.nlvr2_logits(
                jnp.zeros((B, 2 * c.embed_dim), c.dtype)
            )
        if "irtr" in names:
            out["irtr"] = self.rank_logits(cls)
        if "imgcls" in names:
            out["imgcls"] = self.imgcls_logits(cls)
        if "refcoco" in names:
            out["refcoco"] = self.ref_box(cls)
        return out

    def init_streams(self, batch: dict) -> dict:
        """Init helper touching every route + head the config needs. Text-only
        phases still initialize the 'v' experts (the reference keeps them,
        deleting only 'vl'; vlmo_module.py:150-153) via a dummy image."""
        c = self.config
        img = batch.get("image")
        txt_ids = batch.get("text_ids")
        txt_mask = batch.get("text_mask")
        B = img.shape[0] if img is not None else txt_ids.shape[0]
        if img is None:
            img = jnp.zeros((B, c.img_size, c.img_size, 3), jnp.float32)
        if txt_ids is None:  # vision-only phases (imgcls/mae)
            txt_ids = jnp.zeros((B, c.max_text_len), jnp.int32)
            txt_mask = jnp.ones((B, c.max_text_len), jnp.int32)
        self.transformer.init_streams(img, txt_ids, txt_mask)
        return self(batch, deterministic=True)


def total_loss(outputs: dict, flat: bool = False) -> jax.Array:
    """Σ *_task_loss with non-finite components dropped
    (reference multimodal.py:281-284). With flat=True each component is
    divided by its own detached value (multimodal.py:301-307) so every task
    contributes an equal-magnitude gradient regardless of loss scale."""
    total = jnp.asarray(0.0, jnp.float32)
    for k, v in outputs.items():
        if k.endswith("_task_loss"):
            v = jnp.asarray(v, jnp.float32)
            if flat:
                v = v / jnp.maximum(jnp.abs(jax.lax.stop_gradient(v)), 1e-12)
            total = total + jnp.where(jnp.isfinite(v), v, 0.0)
    return total


def adjust_downstream_params(params: dict, loss_names: tuple[str, ...]) -> dict:
    """Downstream warm-start surgery (vlmo_module.py:169-185): initialize the
    IRTR rank head from the ITM head's 'match' logit row. (The NLVR2
    token-type copy happens in the torch importer, which maps
    token_type_embeddings into the 3-row table directly.)"""
    if "irtr" in loss_names and "itm_head" in params and "rank_output" in params:
        itm_kernel = params["itm_head"]["fc"]["kernel"]  # (hs, 2)
        itm_bias = params["itm_head"]["fc"]["bias"]
        params = dict(params)
        params["rank_output"] = {
            "fc": {
                "kernel": itm_kernel[:, 1:2],
                "bias": itm_bias[1:2],
            }
        }
    return params


def build_model(cfg) -> VlmoTask:
    """Model factory (reference models/build.py:4-12)."""
    if cfg.model.type != "VLMO":
        raise NotImplementedError(f"model type {cfg.model.type}")
    return VlmoTask(VlmoConfig.from_config(cfg))
