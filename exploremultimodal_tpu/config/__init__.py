"""Config system: YAML group composition + dotted CLI overrides.

Replaces the reference's Hydra setup (reference: conf/config.yaml, consumed via
@hydra.main at main.py:86) with a small self-contained loader. Groups:

  base.yaml            run flags, data, parallel-runtime, logging
  model/<name>.yaml    model sizes (vlmo_debug ... vlmo_huge)
  train/<phase>.yaml   training phases (pretrain_mum, finetune_vqa, ...)
  parallel/<p>.yaml    sharding presets (dp / zero1 / fsdp / tp) — the
                       TPU-native replacement of conf/ds_stage/{l1,l2,l3}.yaml

Composition: base + model=X + train=Y + parallel=Z, then dotted overrides
(`data.batch_size=8 model.depth=2`). `${a.b.c}` interpolations are resolved
after composition (supports the reference's `data.img_size: ${model.img_size}`
pattern).
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Iterable

import yaml

CONFIG_ROOT = Path(__file__).resolve().parent.parent / "configs"

_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")
_GROUPS = ("model", "train", "parallel")


class ConfigDict(dict):
    """A dict with attribute access and deep merge, à la OmegaConf-lite."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            return ConfigDict({k: ConfigDict._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [ConfigDict._wrap(v) for v in value]
        return value

    def merge(self, other: dict) -> "ConfigDict":
        """Deep-merge `other` into self (other wins). Returns self."""
        for key, value in other.items():
            if (
                key in self
                and isinstance(self[key], dict)
                and isinstance(value, dict)
            ):
                ConfigDict._wrap(self[key]).merge(value)
            else:
                self[key] = ConfigDict._wrap(value)
        return self

    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_dotted(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node: ConfigDict = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = ConfigDict()
            node = node[part]
        node[parts[-1]] = ConfigDict._wrap(value)

    def to_dict(self) -> dict:
        def unwrap(v: Any) -> Any:
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def copy(self) -> "ConfigDict":  # type: ignore[override]
        return ConfigDict._wrap(copy.deepcopy(self.to_dict()))


def _load_yaml(path: Path) -> ConfigDict:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    if not isinstance(data, dict):
        raise ValueError(f"{path} must contain a mapping, got {type(data)}")
    return ConfigDict._wrap(data)


def _parse_value(text: str) -> Any:
    """Parse an override value with YAML semantics ('true' → True, '1e-4' → float)."""
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(value, str):
        # YAML 1.1 only floats '1.0e-5', not '1e-5'; accept the common form
        try:
            return float(value)
        except ValueError:
            return value
    return value


def _resolve_interpolations(cfg: ConfigDict) -> None:
    """Resolve `${a.b.c}` string values against the root config, iteratively."""

    def resolve_node(node: Any) -> tuple[Any, bool]:
        changed = False
        if isinstance(node, dict):
            for k, v in node.items():
                node[k], c = resolve_node(v)
                changed |= c
        elif isinstance(node, list):
            for i, v in enumerate(node):
                node[i], c = resolve_node(v)
                changed |= c
        elif isinstance(node, str):
            m = _INTERP_RE.match(node)
            if m:
                target = cfg.select(m.group(1), default=node)
                if isinstance(target, str) and _INTERP_RE.match(target):
                    return node, False  # resolve on a later sweep
                return target, True
        return node, changed

    for _ in range(10):
        _, changed = resolve_node(cfg)
        if not changed:
            return
    raise ValueError("config interpolation did not converge (cycle?)")


def load_config(
    overrides: Iterable[str] = (),
    config_root: str | Path | None = None,
) -> ConfigDict:
    """Compose base + group files + dotted overrides into one ConfigDict.

    Overrides of the form `model=vlmo_base` / `train=pretrain_mum` /
    `parallel=fsdp` swap the group file; `a.b.c=value` sets a leaf.
    """
    root = Path(config_root) if config_root else CONFIG_ROOT
    cfg = _load_yaml(root / "base.yaml")

    groups = {g: cfg.get(g) if isinstance(cfg.get(g), str) else None for g in _GROUPS}
    groups.setdefault("model", None)
    # defaults declared in base.yaml under `defaults:`
    for item in cfg.pop("defaults", []):
        if isinstance(item, dict):
            for g, name in item.items():
                groups[g] = name

    leaf_overrides: list[tuple[str, Any]] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, _, raw = ov.partition("=")
        key = key.strip()
        if key in _GROUPS:
            groups[key] = raw.strip()
        else:
            leaf_overrides.append((key, _parse_value(raw)))

    for group in _GROUPS:
        name = groups.get(group)
        if not name:
            continue
        path = root / group / f"{name}.yaml"
        if not path.exists():
            avail = sorted(p.stem for p in (root / group).glob("*.yaml"))
            raise FileNotFoundError(f"no {group} config {name!r}; available: {avail}")
        sub = _load_yaml(path)
        cfg[group] = cfg.get(group, ConfigDict()) if isinstance(cfg.get(group), dict) else ConfigDict()
        ConfigDict._wrap(cfg[group]).merge(sub)

    for key, value in leaf_overrides:
        cfg.set_dotted(key, value)

    _resolve_interpolations(cfg)
    return cfg
