"""Config loading with full format-tag merge semantics (reference S6).

Replays `load_module_config` (reference api/processor.py:45-58) and the
pii-data `load_config` contract it delegates to: every config source is
either a single tagged config (a dict/file with a ``format`` field
``piisa:config:<tag>``) or a pre-merged multi-config (dict keyed by
tags); sources merge per tag, later sources overriding earlier ones
(dict sections update shallowly, list-valued fields CONCATENATE so e.g.
several ``task_config`` files accumulate).

Known tags (reference defs.py:8-10):
 - ``pii-extract:plugins:v1``     → plugin loader options/order
 - ``pii-extract:tasks:v1``       → additional task descriptors
 - ``pii-extract:task-config:v1`` → per-task config overrides

The module base config plays the role of the reference's bundled
``resources/plugins.json`` (a default ``plugin-order``).
"""

import copy
import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Union

from ..kernel.defs import (FMT_CONFIG_PLUGIN, FMT_CONFIG_TASKS,
                           FMT_CONFIG_TASKCFG)
from ..kernel.exceptions import InvArgException

FMT_PREFIX = "piisa:config:"

KNOWN_TAGS = (FMT_CONFIG_PLUGIN, FMT_CONFIG_TASKS, FMT_CONFIG_TASKCFG)

# any "<module>:<name>:v<N>" shape counts as a config tag: a shared
# PIISA multi-config may carry sections for OTHER modules (e.g.
# pii-transform:*) which the reference's load_config passes through
# untouched rather than rejecting (ADVICE r2)
_TAG_RE = re.compile(r"^[\w.-]+:[\w.-]+:v\d+$")

# analogue of reference resources/plugins.json:1-8 — a default plugin
# load order (first-party detector plugin sets, loaded if installed)
BASE_CONFIG: Dict = {
    FMT_CONFIG_PLUGIN: {
        "plugin-order": [
            "piisa-detectors-regex",
            "piisa-detectors-transformers",
            "piisa-detectors-presidio",
        ],
    },
}

TYPE_CONFIG = Union[str, Path, Dict]
TYPE_CONFIG_LIST = Union[TYPE_CONFIG, List[TYPE_CONFIG], None]


def config_tag(fmt: str) -> str:
    """``piisa:config:pii-extract:plugins:v1`` → ``pii-extract:plugins:v1``."""
    if not fmt.startswith(FMT_PREFIX):
        raise InvArgException("invalid config format tag: {}", fmt)
    return fmt[len(FMT_PREFIX):]


def _as_sections(src: TYPE_CONFIG) -> Dict[str, Dict]:
    """Normalize one config source into a {tag: section} dict."""
    if isinstance(src, (str, Path)):
        with open(src, encoding="utf-8") as f:
            src = json.load(f)
    if not isinstance(src, dict):
        raise InvArgException("invalid config source: {}", type(src))
    if "format" in src:
        return {config_tag(src["format"]): src}
    if src and all(k in KNOWN_TAGS or _TAG_RE.match(k) for k in src):
        return src                       # already a merged multi-config
                                         # (foreign tags pass through)
    # legacy/untagged shorthand: route by content
    if "task_config" in src:
        return {FMT_CONFIG_TASKCFG: src}
    if "tasklist" in src:
        return {FMT_CONFIG_TASKS: src}
    if not src:
        return {}
    raise InvArgException("cannot determine config format for keys: {}",
                          sorted(src))


def _merge_section(base: Dict, new: Dict) -> Dict:
    """Per-tag merge: lists concatenate, dicts update, scalars override."""
    out = dict(base)
    for k, v in new.items():
        if isinstance(v, list) and isinstance(out.get(k), list):
            out[k] = out[k] + v
        elif isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = {**out[k], **v}
        else:
            out[k] = v
    return out


def load_config(configlist: TYPE_CONFIG_LIST,
                formats: Optional[List[str]] = None) -> Dict[str, Dict]:
    """Load + merge config sources into a {tag: section} dict
    (pii-data load_config contract as used at reference api/file.py:112-114)."""
    if not configlist:
        configlist = []
    elif isinstance(configlist, (str, Path, dict)):
        configlist = [configlist]
    merged: Dict[str, Dict] = {}
    for src in configlist:
        for tag, section in _as_sections(src).items():
            if formats and tag not in formats:
                raise InvArgException("unexpected config format: {}", tag)
            merged[tag] = _merge_section(merged.get(tag, {}), section)
    return merged


def load_module_config(configlist: TYPE_CONFIG_LIST = None) -> Dict[str, Dict]:
    """Base (bundled) config + user configs, merged per tag
    (reference api/processor.py:45-58)."""
    merged = copy.deepcopy(BASE_CONFIG)
    for tag, section in load_config(configlist).items():
        merged[tag] = _merge_section(merged.get(tag, {}), section)
    return merged
