"""Config loading: YAML + recursive default merging.

Same public behaviour as the reference's ``dict_update``
(``utils/tools.py:7-22``) and YAML-driven CLIs; config files keep the
reference schema so its YAMLs work unchanged.
"""

from __future__ import annotations

import collections.abc
from pathlib import Path
from typing import Any, Dict, Union

import yaml


def dict_update(d: Dict[str, Any], u: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``u`` into ``d`` (returns ``d``)."""
    for k, v in u.items():
        if isinstance(v, collections.abc.Mapping):
            d[k] = dict_update(d.get(k, {}) or {}, v)
        else:
            d[k] = v
    return d


def load_config(path: Union[str, Path], defaults: Dict[str, Any] = None) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if defaults:
        import copy

        # deep copy: dict_update merges in place, and a shallow dict()
        # would let one load mutate the caller's nested default dicts
        # for every later call
        return dict_update(copy.deepcopy(defaults), cfg)
    return cfg
