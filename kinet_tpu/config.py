"""Config system: YAML base + named-config composition + dot overrides.

The reference uses Sacred experiments (reference: src/train.py:24-38) where
named configs are YAML deltas applied over ``cfgs/train.yaml`` and CLI
``with key=value`` overrides come last. We keep the exact same layering
semantics with plain YAML + an immutable attribute namespace — no Sacred.

Config round-trip parity: ``save_config`` dumps the resolved dict to
``output_dir/config.yaml`` and ``load_saved_config`` reloads it so tracking
rebuilds the train-time model exactly (reference: train.py:62-64,
track.py:66-70).
"""
from __future__ import annotations

import copy
import os
from pathlib import Path
from typing import Any, Mapping

import yaml

def _find_cfg_dir() -> Path:
    """Locate the cfgs/ directory.

    Priority: $KINET_CFG_DIR > repo layout (../cfgs next to the package,
    the checkout case) > cfgs/ shipped inside the installed package >
    ./cfgs relative to the cwd (pip-installed package + user checkout).
    """
    env = os.environ.get("KINET_CFG_DIR")
    if env:
        return Path(env)
    here = Path(__file__).resolve().parent
    for cand in (here.parent / "cfgs", here / "cfgs"):
        if cand.is_dir():
            return cand
    return Path("cfgs")


CFG_DIR = _find_cfg_dir()


class Config:
    """Immutable-ish attribute namespace over a nested dict."""

    def __init__(self, d: Mapping[str, Any]):
        object.__setattr__(self, "_d", dict(d))

    def __getattr__(self, k):
        try:
            v = self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e
        if isinstance(v, Mapping):
            return Config(v)
        return v

    def __setattr__(self, k, v):
        raise AttributeError("Config is read-only; use .replace(**kw)")

    def __contains__(self, k):
        return k in self._d

    def __getitem__(self, k):
        return self._d[k]

    def get(self, k, default=None):
        return self._d.get(k, default)

    def to_dict(self) -> dict:
        return copy.deepcopy(self._d)

    def replace(self, **kw) -> "Config":
        d = self.to_dict()
        for k, v in kw.items():
            _set_dotted(d, k, v)
        return Config(d)

    def __repr__(self):
        return f"Config({self._d!r})"


def _set_dotted(d: dict, key: str, value):
    parts = key.split(".")
    cur = d
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = value


def _deep_update(base: dict, delta: Mapping) -> dict:
    for k, v in delta.items():
        if isinstance(v, Mapping) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = copy.deepcopy(v)
    return base


def load_config(
    base: str | os.PathLike = "train.yaml",
    named: list[str] | None = None,
    overrides: Mapping[str, Any] | None = None,
    cfg_dir: str | os.PathLike | None = None,
) -> Config:
    """Compose base yaml <- named-config deltas <- dot-key overrides."""
    cfg_dir = Path(cfg_dir) if cfg_dir is not None else CFG_DIR

    def _read(name):
        p = Path(name)
        if not p.is_absolute():
            p = cfg_dir / name
        if p.suffix == "":
            p = p.with_suffix(".yaml")
        with open(p) as f:
            return yaml.safe_load(f) or {}

    d = _read(base)
    for name in named or []:
        _deep_update(d, _read(name))
    for k, v in (overrides or {}).items():
        _set_dotted(d, k, v)
    return Config(d)


def save_config(cfg: Config, output_dir: str | os.PathLike):
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "config.yaml", "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)


def load_saved_config(output_dir: str | os.PathLike) -> Config:
    with open(Path(output_dir) / "config.yaml") as f:
        return Config(yaml.safe_load(f))


def parse_cli_overrides(tokens: list[str]) -> dict:
    """Parse ``key=value`` tokens (Sacred ``with`` style) into overrides."""
    out = {}
    for t in tokens:
        if "=" not in t:
            raise ValueError(f"override must be key=value, got {t!r}")
        k, v = t.split("=", 1)
        out[k] = yaml.safe_load(v)
    return out
