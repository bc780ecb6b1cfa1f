"""Config system: YAML -> attribute dict, reference-schema compatible.

Functional parity target: /root/reference/mvn/utils/cfg.py (:5-9) — the
reference uses ``easydict`` with ``hasattr()`` guards at ~20 call sites; this
``AttrDict`` keeps attribute access but adds ``get()`` with defaults so
consumers don't need hasattr gymnastics.  Existing reference YAML configs
load unchanged.
"""

from __future__ import annotations

from typing import Any

import yaml


class AttrDict(dict):
    """Dict with attribute access, recursive over nested dicts/lists."""

    def __init__(self, mapping=None, **kwargs):
        super().__init__()
        mapping = dict(mapping or {}, **kwargs)
        for key, value in mapping.items():
            self[key] = _wrap(value)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any):
        self[name] = _wrap(value)

    def __setitem__(self, name: str, value: Any):
        super().__setitem__(name, _wrap(value))

    def get(self, name: str, default: Any = None) -> Any:
        return super().get(name, default)


def _wrap(value):
    if isinstance(value, dict) and not isinstance(value, AttrDict):
        return AttrDict(value)
    if isinstance(value, (list, tuple)):
        return type(value)(_wrap(v) for v in value)
    return value


def load_config(path: str) -> AttrDict:
    """Load a YAML config file (cfg.py:5-9 parity)."""
    with open(path) as fin:
        return AttrDict(yaml.safe_load(fin))


def config_to_str(config) -> str:
    """YAML dump of a config (misc.py:9-10 parity)."""
    return yaml.dump(_plain(config))


def _plain(value):
    if isinstance(value, dict):
        return {k: _plain(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_plain(v) for v in value]
    return value
