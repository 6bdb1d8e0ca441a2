"""CLI entry point + phase dispatch.

Reference parity: main.py — setup (runtime init, seeding, output dir
output/<phase>/<model>/<tag>/<timestamp>, per-process logger, config
snapshot, code snapshot tarball) then dispatch on cfg.train.phase.

Usage:
  python -m exploremultimodal_tpu.main train=pretrain_mum model=vlmo_base \
      data.batch_size=180 parallel=fsdp
"""

from __future__ import annotations

import os
import sys
import tarfile
import time

# fail fast in offline environments instead of retrying the HF hub
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


def setup(overrides: list[str]):
    import jax

    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.parallel import initialize_runtime
    from exploremultimodal_tpu.utils import create_logger

    # persistent XLA compilation cache: restarts/resumes skip recompiles
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("EMM_JAX_CACHE", "/tmp/emm_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = load_config(overrides)
    initialize_runtime(cfg)

    # Directory scheme (reference main.py:102-105 + utils.py auto_load_model):
    #   exp_dir = output/<phase>/<model>/<tag>      — stable across restarts;
    #             auto-resume scans exp_dir/**/checkpoint-* so a relaunched
    #             run finds earlier timestamps' checkpoints
    #   run_dir = exp_dir/<timestamp>               — this run's checkpoints,
    #             logs, and config/code snapshots
    if not cfg.get("exp_dir"):
        cfg.exp_dir = os.path.join(
            cfg.get("output_dir", "output"),
            cfg.train.phase,
            cfg.model.name,
            str(cfg.get("tag", "default")),
        )
    if not cfg.get("run_dir"):
        stamp = time.strftime("%Y%m%d-%H%M%S")
        cfg.run_dir = os.path.join(cfg.exp_dir, stamp)
    if jax.process_index() == 0:
        os.makedirs(cfg.run_dir, exist_ok=True)

    logger = create_logger(
        cfg.run_dir, jax.process_index(), level=cfg.get("log_level", "info")
    )

    if jax.process_index() == 0:
        with open(os.path.join(cfg.run_dir, "config.yaml"), "w") as f:
            f.write(cfg.to_yaml())
        _snapshot_code(cfg.run_dir)

    logger.info(f"devices: {jax.device_count()} ({jax.devices()[0].platform})")
    logger.info(f"exp_dir: {cfg.exp_dir}  run_dir: {cfg.run_dir}")
    return cfg, logger


def _snapshot_code(exp_dir: str) -> None:
    """Code snapshot tarball (main.py:114-121)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(exp_dir, "code_snapshot.tar.gz")
    try:
        with tarfile.open(out, "w:gz") as tar:
            tar.add(pkg_dir, arcname="exploremultimodal_tpu",
                    filter=lambda ti: None if "__pycache__" in ti.name else ti)
    except OSError:
        pass


def main(argv: list[str] | None = None) -> int:
    overrides = argv if argv is not None else sys.argv[1:]
    cfg, logger = setup(overrides)

    from exploremultimodal_tpu.train.phases import dispatch

    try:
        result = dispatch(cfg, logger)
    except Exception:
        if cfg.get("ipdb"):
            import pdb

            pdb.post_mortem()
        raise

    # final config re-save (main.py:139-142)
    import jax

    if jax.process_index() == 0:
        with open(os.path.join(cfg.run_dir, "config.yaml"), "w") as f:
            f.write(cfg.to_yaml())
    if isinstance(result, dict) and "best_metric" in result:
        logger.info(f"best metric: {result['best_metric']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
