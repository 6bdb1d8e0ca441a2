import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from exploremultimodal_tpu.parallel import create_mesh
from exploremultimodal_tpu.parallel.partitioning import (
    batch_specs,
    opt_state_specs,
    param_specs,
    to_shardings,
)


def params_tree():
    return {
        "big": jnp.zeros((512, 128)),       # shardable
        "odd": jnp.zeros((513, 127)),       # no divisible axis → replicate
        "small": jnp.zeros((8, 8)),         # under threshold → replicate
        "blocks_0": {
            "mlp_v": {"fc1": {"kernel": jnp.zeros((256, 1024))},
                      "fc2": {"kernel": jnp.zeros((1024, 256))}},
            "attn": {"qkv": {"kernel": jnp.zeros((256, 768))},
                     "proj": {"kernel": jnp.zeros((256, 256))}},
        },
    }


def test_dp_replicates_everything(eight_devices):
    mesh = create_mesh(data=-1)
    specs = param_specs(params_tree(), "dp", mesh)
    flat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert all(s == P() for s in flat)


def test_fsdp_shards_largest_divisible_axis(eight_devices):
    mesh = create_mesh(data=4, fsdp=2)
    specs = param_specs(params_tree(), "fsdp", mesh)
    assert specs["big"] == P("fsdp", None)
    assert specs["odd"] == P(None, None) or specs["odd"] == P()
    assert specs["small"] == P()
    assert specs["blocks_0"]["mlp_v"]["fc1"]["kernel"] == P(None, "fsdp")


def test_tp_megatron_split(eight_devices):
    mesh = create_mesh(data=2, fsdp=1, tensor=4)
    specs = param_specs(params_tree(), "tp", mesh)
    assert specs["blocks_0"]["mlp_v"]["fc1"]["kernel"] == P(None, "tensor")
    assert specs["blocks_0"]["mlp_v"]["fc2"]["kernel"] == P("tensor", None)
    assert specs["blocks_0"]["attn"]["qkv"]["kernel"] == P(None, "tensor")
    assert specs["blocks_0"]["attn"]["proj"]["kernel"] == P("tensor", None)


def test_zero1_shards_moments_not_params(eight_devices):
    mesh = create_mesh(data=4, fsdp=2)
    params = params_tree()
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    p_specs = param_specs(params, "zero1", mesh)
    assert all(
        s == P() for s in jax.tree.leaves(p_specs, is_leaf=lambda x: isinstance(x, P))
    )
    o_specs = opt_state_specs(opt_state, "zero1", mesh)
    flat = [
        s for s in jax.tree.leaves(o_specs, is_leaf=lambda x: isinstance(x, P))
        if s != P()
    ]
    assert len(flat) > 0  # ADAM moments of big tensors got sharded


def test_sharded_update_matches_dense(eight_devices):
    """FSDP-sharded AdamW step must produce the same params as unsharded."""
    mesh = create_mesh(data=4, fsdp=2)
    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(512, 128)),
                               jnp.float32)}
    grads = {"w": jnp.asarray(np.random.default_rng(1).normal(size=(512, 128)),
                              jnp.float32)}
    opt = optax.adamw(1e-3)

    def step(p, g, s):
        u, s2 = opt.update(g, s, p)
        return optax.apply_updates(p, u)

    dense = step(params, grads, opt.init(params))

    p_specs = param_specs(params, "fsdp", mesh)
    p_shard = to_shardings(p_specs, mesh)
    params_s = jax.device_put(params, p_shard)
    grads_s = jax.device_put(grads, p_shard)
    state_s = opt.init(params_s)
    sharded = jax.jit(step, out_shardings=p_shard)(params_s, grads_s, state_s)
    np.testing.assert_allclose(
        np.asarray(dense["w"]), np.asarray(sharded["w"]), rtol=1e-5, atol=1e-6
    )
    assert sharded["w"].sharding.spec == P("fsdp", None)


def test_batch_specs_leading_dim():
    batch = {"image": jnp.zeros((8, 4, 4, 3)), "ids": jnp.zeros((8, 12))}
    specs = batch_specs(batch)
    assert specs["image"] == P(("data", "fsdp"), None, None, None)
    assert specs["ids"] == P(("data", "fsdp"), None)


def test_preset_derives_mesh_axes(eight_devices):
    """parallel=fsdp with default mesh must actually shard: the fsdp axis
    takes all devices (round-1 advisor finding: preset flags and mesh were
    never reconciled, so `parallel=fsdp` silently degenerated to DP)."""
    from exploremultimodal_tpu.config import load_config

    cfg = load_config(["parallel=fsdp"])
    mesh = create_mesh(cfg)
    assert mesh.shape["fsdp"] == 8 and mesh.shape["data"] == 1

    cfg = load_config(["parallel=zero1"])
    mesh = create_mesh(cfg)
    assert mesh.shape["fsdp"] == 8 and mesh.shape["data"] == 1

    cfg = load_config(["parallel=tp"])
    mesh = create_mesh(cfg)
    assert mesh.shape["tensor"] == 8 and mesh.shape["data"] == 1

    # explicit mesh overrides always win
    cfg = load_config(
        ["parallel=fsdp", "runtime.mesh.data=4", "runtime.mesh.fsdp=2"]
    )
    mesh = create_mesh(cfg)
    assert mesh.shape == {"data": 4, "fsdp": 2, "tensor": 1}

    # dp untouched: data absorbs everything
    cfg = load_config(["parallel=dp"])
    mesh = create_mesh(cfg)
    assert mesh.shape["data"] == 8


def test_fsdp_batch_shards_over_fsdp_axis(eight_devices):
    """Under an fsdp mesh the DeviceFeeder splits the batch over the joint
    ('data','fsdp') axes — no redundant compute per fsdp shard."""
    import numpy as onp

    from exploremultimodal_tpu.data.pipeline import DeviceFeeder

    mesh = create_mesh(data=2, fsdp=4)
    feeder = DeviceFeeder(mesh)
    batch = {"x": onp.zeros((16, 3), onp.float32)}
    staged = next(iter(feeder(iter([batch]))))
    assert staged["x"].sharding.spec == P(("data", "fsdp"), None)
    # each device holds 16/8 = 2 rows
    assert staged["x"].addressable_shards[0].data.shape == (2, 3)


def test_fsdp_offload_preset_loads_and_dp_unaffected(eight_devices):
    """fsdp_offload preset (ZeRO-offload analogue): the trainer canonicalizes
    presets from the yaml FLAGS, so fsdp_offload must actually shard params
    over the fsdp axis (the offload transfer itself needs TPU pinned-host
    memory and is smoke-verified on-chip — BENCH.md round notes)."""
    from exploremultimodal_tpu.config import load_config

    cfg = load_config(["parallel=fsdp_offload"])
    assert cfg.parallel.offload_opt_state is True
    assert cfg.parallel.shard_params is True

    from exploremultimodal_tpu.train.trainer import Trainer

    cfg_sh = load_config([
        "model=vlmo_debug", "train=pretrain_txt", "train.datasets=[synthetic]",
        "parallel=fsdp_offload", "parallel.offload_opt_state=false",
        "runtime.mesh.data=4", "runtime.mesh.fsdp=2",
        "data.batch_size=8", "data.synthetic_size=8", "data.num_workers=1",
        "model.img_size=32", "model.embed_dim=64", "model.num_heads=2",
        "model.max_text_len=8", "model.drop_rate=0.0",
        "model.attn_drop_rate=0.0", "model.drop_path_rate=0.0",
        "data.num_mask_patches=2", "data.min_mask_patches_per_block=1",
        "compute_dtype=float32", "exp_dir=/tmp/emm_offload_shard",
    ])
    tr = Trainer(cfg_sh)
    assert tr.preset == "fsdp"  # flags canonicalize the preset
    state = tr.init_state(next(iter(tr.data.train_loader())))
    specs = {
        s.spec for s in jax.tree.leaves(tr.state_shardings.params)
    }
    assert any(s != P() for s in specs)  # something actually sharded

    # non-offload presets keep device memory kinds end to end
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg2 = load_config([
        "model=vlmo_debug", "train=pretrain_txt", "train.datasets=[synthetic]",
        "data.batch_size=8", "data.synthetic_size=8", "data.num_workers=1",
        "model.img_size=32", "model.embed_dim=32", "model.num_heads=2",
        "model.max_text_len=8", "model.drop_rate=0.0",
        "model.attn_drop_rate=0.0", "model.drop_path_rate=0.0",
        "data.num_mask_patches=2", "data.min_mask_patches_per_block=1",
        "compute_dtype=float32", "exp_dir=/tmp/emm_presets",
    ])
    trainer = Trainer(cfg2)
    state = trainer.init_state(next(iter(trainer.data.train_loader())))
    assert trainer._offload is False


def test_tp_e2e_step_on_fake_mesh(eight_devices):
    """Full jitted train step under the tensor-parallel preset on a
    (data=4, tensor=2) fake mesh: Megatron-split params, one real update,
    finite loss — the e2e counterpart of test_tp_megatron_split."""
    import jax.numpy as jnp

    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config([
        "model=vlmo_debug", "train=pretrain_mum", "train.datasets=[synthetic]",
        "parallel=tp", "runtime.mesh.data=4", "runtime.mesh.tensor=2",
        "data.batch_size=8", "data.synthetic_size=16", "data.num_workers=1",
        "model.img_size=32", "model.embed_dim=64", "model.num_heads=2",
        "model.max_text_len=8",
        "data.num_mask_patches=2", "data.min_mask_patches_per_block=1",
        "train.warmup_steps=2", "compute_dtype=float32",
        "exp_dir=/tmp/emm_tp_e2e", "log_level=error",
    ])
    trainer = Trainer(cfg)
    assert trainer.preset == "tp"
    batch = next(iter(trainer.feeder(iter(trainer.data.train_loader()))))
    state = trainer.init_state(batch)
    # at least one param is split over the tensor axis
    specs = {s.spec for s in jax.tree.leaves(trainer.state_shardings.params)}
    assert any("tensor" in str(s) for s in specs)
    step = trainer.make_train_step()
    state, metrics = step(state, batch, jnp.asarray(0.0))
    total = float(metrics["total_loss"])
    assert np.isfinite(total)
