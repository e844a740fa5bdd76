"""Driver-side processor factory.

Builds a PiiProcessor from the built-in registry plus optional user
configs, with the FULL tagged-config merge of the reference
(api/processor.py:45-58 via registry/config_loader): plugin options,
additional JSON tasklists and ``task_config`` overrides all merge per
format tag across config sources. The result is pickled into a Spark
broadcast; the ``regex`` patterns recompile lazily on executors.
"""

import hashlib
import json
from typing import Dict, Iterable, List, Optional, Union

from ..kernel.defs import FMT_CONFIG_TASKCFG, FMT_CONFIG_TASKS
from ..kernel.processor import PiiProcessor
from .config_loader import load_module_config
from .detectors import builtin_tasklist


def make_processor(languages: Iterable[str],
                   config: Optional[Union[Dict, List[Dict]]] = None,
                   extra_tasklists: Optional[List[Dict]] = None,
                   include_builtin: bool = True,
                   country: Optional[List[str]] = None,
                   pii=None, load_plugins: bool = False) -> PiiProcessor:
    """Create a PiiProcessor with tasks built for every language in
    ``languages`` (the per-chunk language dispatch then picks the right
    task list per row, reference api/processor.py:229-236).

    ``config`` accepts tagged configs (``piisa:config:pii-extract:*``
    files/dicts), pre-merged multi-configs, or the legacy untagged
    ``{"task_config": [...]}`` shorthand — all merged per tag."""
    merged = load_module_config(config)

    proc = PiiProcessor(config=merged.get(FMT_CONFIG_TASKCFG))
    if include_builtin:
        proc.add_json_tasks(builtin_tasklist())
    if load_plugins:
        from .plugin_source import PluginTaskSource
        PluginTaskSource(config=merged,
                         languages=list(languages)).add_to(proc)
    tasks_cfg = merged.get(FMT_CONFIG_TASKS)
    if tasks_cfg:
        proc.add_json_tasks(tasks_cfg)
    for tl in (extra_tasklists or []):
        proc.add_json_tasks(tl)
    for lang in languages:
        proc.build_tasks(lang, country=country, pii=pii)
    return proc


def registry_fingerprint(languages: Iterable[str],
                         config: Optional[Dict] = None) -> str:
    """Deterministic fingerprint of the active detector registry, recorded
    in per-partition lineage metadata (north-star stage N8)."""
    tl = builtin_tasklist()
    payload = {
        "languages": sorted(languages),
        "config": config or {},
        "tasks": [
            {k: (v if isinstance(v, (str, int, list, dict)) else repr(v))
             for k, v in t.items()}
            for t in tl["tasklist"]
        ],
        "source": tl["header"],
    }
    blob = json.dumps(payload, sort_keys=True, default=repr).encode()
    return hashlib.sha256(blob).hexdigest()[:16]
