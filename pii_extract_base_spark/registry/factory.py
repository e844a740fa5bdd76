"""Driver-side processor factory.

Builds a PiiProcessor from the built-in registry plus optional user
configs (JSON tasklists and ``task_config`` overrides, reference
build/build.py:19-44). The result is pickled into a Spark broadcast; the
``regex`` patterns recompile lazily on executors.
"""

import hashlib
import json
from typing import Dict, Iterable, List, Optional, Union

from ..kernel.processor import PiiProcessor
from .detectors import builtin_tasklist


def make_processor(languages: Iterable[str],
                   config: Optional[Union[Dict, List[Dict]]] = None,
                   extra_tasklists: Optional[List[Dict]] = None,
                   include_builtin: bool = True,
                   country: Optional[List[str]] = None,
                   pii=None) -> PiiProcessor:
    """Create a PiiProcessor with tasks built for every language in
    ``languages`` (the per-chunk language dispatch then picks the right
    task list per row, reference api/processor.py:229-236)."""
    task_config = {}
    if config:
        cfgs = config if isinstance(config, list) else [config]
        for c in cfgs:
            if "task_config" in c:
                task_config.setdefault("task_config", []).extend(
                    c["task_config"])

    proc = PiiProcessor(config=task_config or None)
    if include_builtin:
        proc.add_json_tasks(builtin_tasklist())
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
