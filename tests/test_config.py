from exploremultimodal_tpu.config import ConfigDict, load_config


def test_default_composition():
    cfg = load_config()
    assert cfg.model.name == "vlmo_debug"
    assert cfg.train.phase == "pretrain_mum"
    assert cfg.parallel.name == "dp"
    # interpolation: data.img_size mirrors model.img_size
    assert cfg.data.img_size == cfg.model.img_size == 224


def test_group_swap_and_leaf_overrides():
    cfg = load_config(
        ["model=vlmo_base", "train=finetune_vqa", "parallel=fsdp",
         "data.batch_size=8", "train.base_lr=1e-5", "seed=42"]
    )
    assert cfg.model.embed_dim == 768
    assert cfg.model.fusion_layer == 6
    assert cfg.train.phase == "finetune_vqa"
    assert cfg.train.loss_names == ["vqa"]
    assert cfg.parallel.shard_params is True
    assert cfg.data.batch_size == 8
    assert cfg.train.base_lr == 1e-5
    assert cfg.seed == 42


def test_all_model_sizes_load():
    dims = {"vlmo_debug": 96, "vlmo_tiny": 192, "vlmo_small": 384,
            "vlmo_base": 768, "vlmo_large": 1024, "vlmo_huge": 1024}
    for name, dim in dims.items():
        cfg = load_config([f"model={name}"])
        assert cfg.model.embed_dim == dim


def test_all_phases_load():
    phases = [
        "pretrain_mum", "pretrain_txt", "pretrain_vis",
        "finetune_vqa", "finetune_nlvr2", "finetune_retrieval",
        "finetune_caption", "finetune_ref", "finetune_inpainting", "finetune_vis",
    ]
    for phase in phases:
        cfg = load_config([f"train={phase}"])
        assert cfg.train.phase == phase
        assert isinstance(cfg.train.loss_names, list)


def test_configdict_dotted_and_merge():
    cfg = ConfigDict._wrap({"a": {"b": 1}, "c": [1, 2]})
    cfg.set_dotted("a.d.e", 5)
    assert cfg.select("a.d.e") == 5
    assert cfg.select("missing.key", "fallback") == "fallback"
    cfg.merge({"a": {"b": 2}, "new": True})
    assert cfg.a.b == 2 and cfg.new is True
    roundtrip = ConfigDict._wrap(cfg.to_dict())
    assert roundtrip.a.d.e == 5


def test_yaml_typed_overrides():
    cfg = load_config(["vlmo_ema=true", "train.clip_grad=3.5",
                       "train.loss_names=[mlm,itc]"])
    assert cfg.vlmo_ema is True
    assert cfg.train.clip_grad == 3.5
    assert cfg.train.loss_names == ["mlm", "itc"]


def test_model_config_numeric_fields_are_numbers():
    """PyYAML (YAML 1.1) parses '1e-5' (no dot) as a STRING — the
    vlmo_large/huge init_values used exactly that form and crashed Block
    setup. Guard every model config's numeric fields."""
    from exploremultimodal_tpu.config import load_config

    for model in ("vlmo_debug", "vlmo_tiny", "vlmo_small", "vlmo_base",
                  "vlmo_large", "vlmo_huge"):
        cfg = load_config([f"model={model}"])
        for field in ("init_values", "drop_rate", "attn_drop_rate",
                      "drop_path_rate", "mlp_ratio", "itc_temp"):
            v = cfg.model.get(field)
            if v is not None:
                assert isinstance(v, (int, float)), (model, field, repr(v))
