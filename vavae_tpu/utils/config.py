"""Typed-ish config system: YAML load + dot-path overrides + attribute access.

Replaces the reference's two config regimes (flat YAML dicts read with
``cfg['x']['y']`` in LightningDiT/train.py:78-88, and OmegaConf
``instantiate_from_config`` in vavae/main.py:535-547) with one small
implementation that keeps the same YAML key names for config parity.
"""
from __future__ import annotations

import copy
from typing import Any, Iterable, Mapping

import yaml


class Config(dict):
    """A dict with attribute access and recursive wrapping.

    ``cfg.train.max_steps`` and ``cfg['train']['max_steps']`` both work, and
    ``cfg.get('train', {})`` behaves like a plain dict. Missing attribute
    access raises AttributeError (not KeyError) so hasattr() works.
    """

    def __init__(self, data: Mapping[str, Any] | None = None, **kw: Any):
        super().__init__()
        merged = dict(data or {})
        merged.update(kw)
        for k, v in merged.items():
            self[k] = v

    @staticmethod
    def _wrap(v: Any) -> Any:
        if isinstance(v, Config):
            return v
        if isinstance(v, Mapping):
            return Config(v)
        if isinstance(v, (list, tuple)):
            return type(v)(Config._wrap(x) for x in v)
        return v

    def __setitem__(self, k: str, v: Any) -> None:
        super().__setitem__(k, self._wrap(v))

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = v

    def __getattr__(self, k: str) -> Any:
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k) from None

    def __deepcopy__(self, memo: dict) -> "Config":
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    # -- functional helpers -------------------------------------------------

    def merged_with(self, other: Mapping[str, Any]) -> "Config":
        """Recursive right-biased merge (later keys win), returns a new Config."""
        out = copy.deepcopy(self)
        _merge_into(out, other)
        return out

    def override(self, dotlist: Iterable[str]) -> "Config":
        """Apply ``key.path=value`` overrides (values parsed as YAML)."""
        out = copy.deepcopy(self)
        for item in dotlist:
            key, _, raw = item.partition("=")
            node = out
            parts = key.strip().split(".")
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], Config):
                    node[p] = Config()
                node = node[p]
            node[parts[-1]] = yaml.safe_load(raw)
        return out

    def to_dict(self) -> dict:
        def unwrap(v: Any) -> Any:
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return unwrap(self)


def _merge_into(dst: Config, src: Mapping[str, Any]) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], Config) and isinstance(v, Mapping):
            _merge_into(dst[k], v)
        else:
            dst[k] = v


def load_config(*paths: str, overrides: Iterable[str] = ()) -> Config:
    """Load one or more YAML files (left-to-right merge) + dotlist overrides."""
    cfg = Config()
    for p in paths:
        with open(p) as f:
            data = yaml.safe_load(f) or {}
        cfg = cfg.merged_with(data)
    if overrides:
        cfg = cfg.override(overrides)
    return cfg


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)


def num_real_users(cfg: Config) -> int:
    """Number of REAL user classes to iterate in per-user generation loops.

    Framework convention: ``data.num_classes`` counts only real users — the
    CFG null is the EXTRA LabelEmbedder row (id = num_classes), so every id
    in [0, num_classes) is a real user (see pipelines/sample.py null_class
    note). The reference's micro-Doppler configs instead bake the null INTO
    num_classes (dit_s_microdoppler.yaml: 32 = 31 users + null) and iterate
    range(31); that convention applies automatically when
    ``sample.null_class`` is set (the same flag that reproduces the
    reference inference quirk), or explicitly via ``data.num_users``.
    """
    explicit = cfg.get("data", {}).get("num_users")
    if explicit is not None:
        return int(explicit)
    if cfg.get("sample", {}).get("null_class") is not None:
        return int(cfg.data.num_classes) - 1
    return int(cfg.data.num_classes)
