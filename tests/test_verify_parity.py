"""Offline test of scripts/verify_parity.py against GENERATED checkpoints.

The harness exists for the day real reference weights are available
(VERDICT r3 ask 4); this test proves every stage works today: a
reference-format .pth is generated via `export_reference_state` (the exact
inverse of the import mapping), round-tripped through the full
stage_ckpt → stage_logits path, and a reference-format dVAE pickle drives
stage_dvae's module (token-agreement) and state-dict-only branches.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "verify_parity", os.path.join(REPO, "scripts", "verify_parity.py")
)
verify_parity = importlib.util.module_from_spec(_spec)
sys.modules["verify_parity"] = verify_parity
_spec.loader.exec_module(verify_parity)


def _tiny_task():
    from exploremultimodal_tpu.models.task import VlmoConfig, VlmoTask

    cfg = VlmoConfig(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        max_text_len=12, vocab_size=64, fusion_layer=1, init_values=0.1,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        img_vocab_size=24, itc_dim=16,
        loss_names=("mlm", "itc", "itm", "mim"), phase="pretrain_mum",
    )
    task = VlmoTask(cfg)
    batch = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "text_ids": jnp.zeros((1, 12), jnp.int32),
        "text_ids_mlm": jnp.zeros((1, 12), jnp.int32),
        "text_labels_mlm": jnp.full((1, 12), -100, jnp.int32),
        "text_mask": jnp.ones((1, 12), jnp.int32),
        "image_bool_masked_pos": jnp.zeros((1, 4), jnp.int32),
        "mim_labels": jnp.zeros((1, 4), jnp.int32),
    }
    variables = task.init(
        {"params": jax.random.key(3), "sample": jax.random.key(4)},
        batch, method=type(task).init_streams,
    )
    params = variables["params"]
    # make zero-initialized embellishments non-trivial so parity is strict
    k = jax.random.key(9)
    for name in ("img_mask_token", "img_cls_token", "pos_embed"):
        k, sub = jax.random.split(k)
        params["transformer"][name] = 0.02 * jax.random.normal(
            sub, params["transformer"][name].shape
        )
    return task, params


def test_roundtrip_export_import_and_logit_parity(tmp_path):
    """export_reference_state → .pth → stage_ckpt → stage_logits: the
    imported model's three streams match the torch oracle on real-format
    checkpoint flow (not just in-memory trees)."""
    from exploremultimodal_tpu.models.import_torch import (
        export_reference_state,
    )

    task, params = _tiny_task()
    sd = export_reference_state(params)
    # the donor tree round-trips: reference namespace covers the backbone
    assert any(k.startswith("transformer.blocks.0.mlp.v") for k in sd)
    assert "transformer.pos_embed" in sd
    ckpt = tmp_path / "generated_vlmo.pth"
    torch.save({"model": {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                "epoch": 7}, ckpt)

    report, imported = verify_parity.stage_ckpt(task, str(ckpt))
    assert report["loaded"] >= len(sd) - 2  # itc_temp etc. may be aliased
    # every exported tensor landed identically where it came from
    np.testing.assert_allclose(
        np.asarray(imported["transformer"]["pos_embed"]),
        np.asarray(params["transformer"]["pos_embed"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(
            imported["transformer"]["blocks_1"]["mlp_vl"]["fc1"]["kernel"]
        ),
        np.asarray(params["transformer"]["blocks_1"]["mlp_vl"]["fc1"]["kernel"]),
        rtol=1e-6,
    )

    logits = verify_parity.stage_logits(task, imported)
    assert logits["pass"], logits
    for key in ("img_only_max_abs", "txt_only_max_abs", "fused_max_abs"):
        assert logits[key] < 5e-4 * max(1.0, logits["fused_ref_scale"])


class _TorchDalleEncoder(torch.nn.Module):
    """Pickle-able torch module with the OpenAI encoder interface
    (module(x) → (B, vocab, h, w) logits), backed by the functional oracle
    from tests/test_dvae.py."""

    def __init__(self, state):
        super().__init__()
        self._state = {k: v.clone() for k, v in state.items()}

    def state_dict(self, *a, **kw):  # noqa: D102 - OpenAI-pkl surface
        return dict(self._state)

    def forward(self, x):
        from tests.test_dvae import torch_encoder_forward

        return torch_encoder_forward(self._state, x)


def test_stage_dvae_module_token_agreement(tmp_path):
    from tests.test_dvae import make_torch_state

    state = make_torch_state(np.random.default_rng(0))
    pkl = tmp_path / "encoder.pkl"
    torch.save(_TorchDalleEncoder(state), pkl)

    report = verify_parity.stage_dvae(str(pkl), image_size=32, n_images=2)
    assert report["tokens_shape"] == [2, 16]  # 32/8 = 4x4 grid
    assert report["bit_exact"] is True
    assert report["agreement"] == 1.0


def test_stage_dvae_state_dict_only(tmp_path):
    from tests.test_dvae import make_torch_state

    state = make_torch_state(np.random.default_rng(1))
    pkl = tmp_path / "encoder_sd.pkl"
    torch.save(state, pkl)

    report = verify_parity.stage_dvae(str(pkl), image_size=32, n_images=2)
    assert report["tokens_shape"] == [2, 16]
    assert "note" in report and "bit_exact" not in report
