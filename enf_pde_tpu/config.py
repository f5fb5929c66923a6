"""Minimal hierarchical config system with YAML files and dotted CLI overrides.

Mirrors the reference's Hydra/OmegaConf usage (sections ``logging / dataset / nef /
node / training / test / meta / optimizer``; see reference
``experiments/fitting/config_navier_stokes.yaml``) without the Hydra dependency:
configs are plain YAML, accessed with attribute syntax, overridable with
``key.subkey=value`` strings (the same syntax the reference's EXPERIMENTS.md uses).
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Iterable, Mapping

import yaml


class Config(dict):
    """A dict with attribute access and dotted-path get/set. Nested dicts are Configs."""

    def __init__(self, data: Mapping[str, Any] | None = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, Mapping) and not isinstance(value, Config):
            value = Config(value)
        super().__setitem__(key, value)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], Config):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), default=str)


def _parse_value(raw: str) -> Any:
    """Parse a CLI override value with YAML semantics (int/float/bool/null/str/list)."""
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def load_config(path: str, overrides: Iterable[str] = ()) -> Config:
    """Load a YAML config file and apply ``key.sub=value`` overrides."""
    with open(path) as f:
        cfg = Config(yaml.safe_load(f) or {})
    return apply_overrides(cfg, overrides)


def apply_overrides(cfg: Config, overrides: Iterable[str]) -> Config:
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must look like key.subkey=value, got: {ov!r}")
        key, raw = ov.split("=", 1)
        cfg.set_path(key.strip(), _parse_value(raw.strip()))
    return cfg


def config_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "experiments", "configs")


def load_experiment_config(name: str, overrides: Iterable[str] = ()) -> Config:
    """Load a packaged experiment config by name, e.g. ``navier_stokes``."""
    path = os.path.join(config_dir(), f"{name}.yaml")
    if not os.path.exists(path):
        avail = sorted(p[:-5] for p in os.listdir(config_dir()) if p.endswith(".yaml"))
        raise FileNotFoundError(f"No config {name!r}. Available: {avail}")
    return load_config(path, overrides)
