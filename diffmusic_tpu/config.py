"""Hydra-compatible YAML config composition (no Hydra/OmegaConf dependency).

Honors the subset the reference uses (run.py:147-151): a named top-level config
with a `defaults` list pulling group configs (`data/`, `model/`,
`inverse_problem/`), `_self_` ordering, and `group=name` CLI overrides. The YAML
tree under configs/ is drop-in compatible with the reference's (plus the
`ddim.yaml` the reference advertises but forgot to ship — SURVEY.md section 5
config row).
"""

import copy
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


class DotDict(dict):
    """dict with attribute access, recursively (OmegaConf-lite)."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj


def _deep_merge(base: Dict, extra: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in (extra or {}).items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_yaml(path: Path) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def compose(config_name: str, overrides: Optional[List[str]] = None,
            config_path: str = "configs") -> DotDict:
    """Compose `configs/<config_name>.yaml` with its defaults + CLI overrides.

    overrides: ["data=moises", "model=musicldm", ...] select group files;
    dotted "a.b=c" overrides set leaf values.
    """
    root = Path(config_path)
    raw = _load_yaml(root / f"{config_name}.yaml")
    defaults = raw.pop("defaults", [])

    group_choice: Dict[str, str] = {}
    order: List[str] = []
    self_pos = len(defaults)
    for i, d in enumerate(defaults):
        if d == "_self_":
            self_pos = i
            continue
        if isinstance(d, dict):
            (group, name), = d.items()
            group_choice[group] = name
            order.append(group)

    leaf_overrides: List[str] = []
    for ov in overrides or []:
        k, _, v = ov.partition("=")
        if k in group_choice and "." not in k:
            group_choice[k] = v
        else:
            leaf_overrides.append(ov)

    composed: Dict = {}
    merged_self = False
    for i, group in enumerate(order):
        if not merged_self and i >= self_pos:
            composed = _deep_merge(composed, raw)
            merged_self = True
        gcfg = _load_yaml(root / group / f"{group_choice[group]}.yaml")
        composed = _deep_merge(composed, {group: gcfg})
    if not merged_self:
        composed = _deep_merge(composed, raw)

    for ov in leaf_overrides:
        k, _, v = ov.partition("=")
        node = composed
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(v)

    return DotDict.wrap(composed)
