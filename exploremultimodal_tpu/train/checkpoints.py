"""Checkpoint save / auto-resume with orbax.

Reference parity (utils/utils.py:479-644):
  save        checkpoint-{epoch} dirs holding {state pytree} + meta.json
              {phase, tag, epoch, step}; process-0 writes
  auto_load   scan the experiment dir (including timestamped subruns) for the
              latest checkpoint-* epoch; resume optimizer/EMA/queue state
              only when (phase, tag) match the checkpoint's meta
              (utils.py:590-607) — otherwise params only (warm start)
  retention   keep only the latest + best epochs (remove_models,
              utils.py:518-527)
  torch import  .pth files (BEiT/VLMo) route through models.import_torch
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

CKPT_PREFIX = "checkpoint-"


def _ckpt_dir(output_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"{CKPT_PREFIX}{epoch}")


def _unkey(x):
    """Typed PRNG keys → raw uint32 (orbax/numpy can't hold key dtypes)."""
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(x)
    return x


def _rekey(template, x):
    if hasattr(template, "dtype") and jax.dtypes.issubdtype(
        template.dtype, jax.dtypes.prng_key
    ):
        return jax.random.wrap_key_data(jnp.asarray(np.asarray(x), jnp.uint32))
    return x


def save(
    output_dir: str,
    state: Any,
    cfg: Any,
    epoch: int,
    *,
    is_best: bool = False,
    scan_root: str | None = None,
    logger=None,
) -> str:
    """Save checkpoint-{epoch} under output_dir (the run dir). Retention
    (keep latest+best, remove_models semantics) is applied under scan_root —
    the tag-level exp_dir — so stale checkpoints from earlier timestamped
    subruns are cleaned too."""
    path = _ckpt_dir(output_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    # hand orbax the jax.Arrays directly — it coordinates multi-host sharded
    # saves itself; np.asarray would fail on non-addressable shards
    state_dict = serialization.to_state_dict(
        jax.tree_util.tree_map(_unkey, _arrays_only(state))
    )
    if os.path.exists(path) and jax.process_index() == 0:
        shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_rmtree")
    ckptr.save(path, state_dict)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        meta = {
            "phase": cfg.train.phase,
            "tag": cfg.get("tag", "default"),
            "epoch": epoch,
            "step": int(np.asarray(state.step)),
            "best": bool(is_best),
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        _apply_retention(scan_root or output_dir, keep_epoch=epoch, logger=logger)
    if logger:
        logger.info(f"saved checkpoint {path}" + (" (best)" if is_best else ""))
    return path


def _arrays_only(state: Any) -> Any:
    """Drop None leaves (orbax can't serialize them)."""
    return jax.tree_util.tree_map(lambda x: x, state)


def _scan(output_dir: str) -> list[tuple[int, str]]:
    hits = []
    for path in glob.glob(
        os.path.join(output_dir, "**", f"{CKPT_PREFIX}*"), recursive=True
    ) + glob.glob(os.path.join(output_dir, f"{CKPT_PREFIX}*")):
        m = re.search(rf"{CKPT_PREFIX}(\d+)$", path)
        if m and os.path.isdir(path):
            hits.append((int(m.group(1)), path))
    return sorted(set(hits))


def _apply_retention(output_dir: str, keep_epoch: int, logger=None) -> None:
    """Keep latest + best (remove_models semantics)."""
    for epoch, path in _scan(output_dir):
        if epoch == keep_epoch:
            continue
        meta_path = os.path.join(path, "meta.json")
        best = False
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                best = json.load(f).get("best", False)
        if not best:
            shutil.rmtree(path, ignore_errors=True)
            if logger:
                logger.info(f"removed old checkpoint {path}")


def _fetch_url_checkpoint(url: str, logger=None, sha256: str = "") -> str:
    """Download a checkpoint URL into a local cache dir (idempotent) and
    return the cached path — the torch.hub.load_state_dict_from_url analogue
    (reference utils.py:566-569) without the torch.hub dependency.

    Integrity, matching torch.hub's check_hash=True convention: https only
    (http downgrades raise; file:// is local and exempt), and the expected
    digest comes from `sha256` (cfg.train.resume_sha256) or, like torch.hub,
    from a `<name>-<hexprefix>.pth` filename — the download's sha256 must
    start with that prefix or the file is discarded."""
    import hashlib
    import tempfile
    import urllib.parse
    import urllib.request

    if url.startswith("http://"):
        raise ValueError(
            f"refusing plain-http checkpoint URL {url!r}: downloads are "
            "unauthenticated and the file feeds a pickle importer — use "
            "https:// (reference utils.py:566-569 is https + check_hash)"
        )
    expect = (sha256 or "").lower()
    name = os.path.basename(urllib.parse.urlparse(url).path) or "checkpoint"
    if not expect:
        # torch.hub filename convention: resnet50-0676ba61.pth
        m = re.search(r"-([0-9a-f]{8,64})\.[a-zA-Z]+$", name)
        if m:
            expect = m.group(1)

    cache_dir = os.environ.get(
        "EMM_CKPT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "emm_checkpoints"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    dest = os.path.join(
        cache_dir, f"{hashlib.sha256(url.encode()).hexdigest()[:12]}_{name}"
    )
    if not os.path.exists(dest):
        if logger:
            logger.info(f"downloading checkpoint {url} -> {dest}")
        # unique temp name: concurrent processes (multi-host auto_load, or
        # two runs sharing EMM_CKPT_CACHE) must not interleave writes into
        # one shared .part file; os.replace makes the install atomic and
        # last-writer-wins with identical content
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".part")
        os.close(fd)
        try:
            urllib.request.urlretrieve(url, tmp)
            if expect:
                h = hashlib.sha256()
                with open(tmp, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
                if not h.hexdigest().startswith(expect):
                    raise ValueError(
                        f"checkpoint {url} sha256 {h.hexdigest()[:16]}… does "
                        f"not match expected prefix {expect!r}"
                    )
            os.replace(tmp, dest)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    elif logger:
        logger.info(f"using cached checkpoint {dest} for {url}")
    return dest


def _is_torch_file(path: str) -> bool:
    """Detect a torch checkpoint by content: a zip archive (torch>=1.6
    zipfile serialization) or a pickle protocol-2+ stream (legacy format) —
    so URLs whose basename lacks a .pth/.pt extension (e.g. …/download?id=x)
    still route to the torch importer instead of dying in the orbax path."""
    if not os.path.isfile(path):
        return False
    with open(path, "rb") as f:
        magic = f.read(2)
    return magic[:2] == b"PK" or (len(magic) == 2 and magic[0] == 0x80)


def auto_load(
    output_dir: str,
    state: Any,
    cfg: Any,
    *,
    logger=None,
) -> tuple[Any, int] | None:
    """Resume from the newest checkpoint under output_dir, or from
    cfg.train.resume (.pth → torch importer; http(s)/file URL → fetched to a
    local cache first, reference utils.py:566-569). Returns
    (state, next_epoch)."""
    resume = cfg.train.get("resume") or ""
    if resume.startswith(("http://", "https://", "file://")):
        resume = _fetch_url_checkpoint(
            resume, logger, sha256=cfg.train.get("resume_sha256", "")
        )
    if resume.endswith((".pth", ".pt", ".ckpt")) or _is_torch_file(resume):
        return _load_torch(resume, state, cfg, logger), int(
            cfg.train.get("start_epoch", 0)
        )

    candidates = _scan(output_dir)
    if resume and os.path.isdir(resume):
        m = re.search(rf"{CKPT_PREFIX}(\d+)$", resume)
        candidates = [(int(m.group(1)) if m else 0, resume)]
    if not candidates:
        return None

    epoch, path = candidates[-1]
    ckptr = ocp.StandardCheckpointer()

    def abstract(x):
        # sharding-aware template: multi-host restore loads each process's
        # shards directly (np.asarray would crash on non-addressable arrays)
        x = _unkey(x)
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return np.asarray(x)

    template = serialization.to_state_dict(
        jax.tree_util.tree_map(abstract, state)
    )
    restored = ckptr.restore(os.path.abspath(path), template)

    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    same_run = (
        meta.get("phase") == cfg.train.phase
        and meta.get("tag") == cfg.get("tag", "default")
    )
    if same_run:
        restored = jax.tree_util.tree_map(
            lambda t, x: _rekey(t, x),
            serialization.to_state_dict(state),
            restored,
        )
        new_state = serialization.from_state_dict(state, restored)
        if logger:
            logger.info(f"resumed full state from {path} (epoch {epoch})")
        return new_state, epoch + 1

    # phase/tag mismatch: warm-start params only (utils.py:590-607)
    new_params = serialization.from_state_dict(
        jax.tree_util.tree_map(lambda x: x, state.params), restored["params"]
    ) if "params" in restored else state.params
    new_state = state.replace(params=new_params)
    if logger:
        logger.info(
            f"loaded params from {path} (phase/tag mismatch: "
            f"{meta.get('phase')}/{meta.get('tag')} vs "
            f"{cfg.train.phase}/{cfg.get('tag')}); optimizer state reset"
        )
    return new_state, int(cfg.train.get("start_epoch", 0))


def _load_torch(path: str, state: Any, cfg: Any, logger=None) -> Any:
    from exploremultimodal_tpu.models.import_torch import (
        import_torch_state,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path)
    new_params, loaded, missing = import_torch_state(
        sd, state.params, max_text_len=cfg.model.max_text_len
    )
    if logger:
        logger.info(
            f"imported torch checkpoint {path}: {len(loaded)} tensors loaded, "
            f"{len(missing)} params kept at init"
        )
        if missing[:10]:
            logger.debug(f"first missing: {missing[:10]}")
    return state.replace(params=new_params)
