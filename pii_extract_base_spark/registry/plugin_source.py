"""Plugin task source (reference S3): discover ``pii_extract.plugins``
entry points and collect their raw task descriptors.

Replays the semantics of the reference's PluginTaskCollector
(`/root/reference/src/pii_extract/gather/collection/sources/plugin.py:33-138`):

 - entry points of group ``pii_extract.plugins``; each resolves to a
   loader class with ctor ``(config=..., **options, debug=...)``, a
   ``get_plugin_tasks(lang=None)`` method yielding raw descriptors, and
   optional ``source``/``version``/``description`` class attributes
 - the ``pii-extract:plugins:v1`` config section controls load order
   (``plugin-order``: listed names first by position — keys zero-padded
   so they sort before names — unlisted names after, alphabetical) and
   per-plugin ``load`` (False deactivates) / ``options`` (extra ctor
   kwargs); per-plugin entries live under ``plugins`` or, for backwards
   compatibility, at the section top level
 - a ``languages`` restriction is forwarded to loaders as the
   ``languages`` ctor option
 - the full (lang=None) task list is gathered once and cached
   (:123-137)

Driver-side only: descriptors collected here feed the same parse →
filter → build path as every other source, and the built registry is
what gets broadcast to executors.
"""

from importlib.metadata import entry_points
from typing import Dict, Iterable, List, Optional

from ..kernel.defs import FMT_CONFIG_PLUGIN
from ..kernel.exceptions import ProcException
from ..kernel.parser import RawTaskDefaults

# entry-point group id (reference gather/collection/sources/defs.py:2)
PII_EXTRACT_PLUGIN_ID = "pii_extract.plugins"


class PluginTaskSource:
    """Driver-side collector over installed plugin entry points."""

    def __init__(self, config: Dict = None, debug: bool = False,
                 languages: Iterable[str] = None):
        self._debug = debug
        self._lang = list(languages) if languages else None
        self._tasks: Optional[List[Dict]] = None
        self._plugins: List[Dict] = []

        plugin_list = list(entry_points().select(group=PII_EXTRACT_PLUGIN_ID))

        plugin_cfg = (config or {}).get(FMT_CONFIG_PLUGIN) or {}
        order = plugin_cfg.get("plugin-order")
        if order:
            def sortkey(entry):
                try:
                    return f"{order.index(entry.name):03d}"
                except ValueError:
                    return entry.name
            plugin_list = sorted(plugin_list, key=sortkey)

        # per-plugin config under "plugins", or top-level (backwards compat)
        custom_cfg = plugin_cfg.get("plugins") or plugin_cfg

        for entry in plugin_list:
            cfg = custom_cfg.get(entry.name) or {}
            if not cfg.get("load", True):
                continue
            options = dict(cfg.get("options") or {})
            if self._lang:
                options["languages"] = self._lang
            loader_cls = entry.load()
            try:
                plugin = loader_cls(config=config, **options, debug=debug)
            except Exception as e:
                raise ProcException("cannot instantiate plugin '{}': {}",
                                    entry.name, e) from e
            self._plugins.append({
                "name": entry.name,
                "source": getattr(plugin, "source", entry.name),
                "version": getattr(plugin, "version", None),
                "description": getattr(plugin, "description", None),
                "object": plugin,
            })

    def __repr__(self) -> str:
        return f"<PluginTaskSource: #{len(self._plugins)}>"

    def list_plugins(self) -> List[Dict]:
        return self._plugins

    def gather(self, lang: str = None) -> Iterable[Dict]:
        """Normalized raw descriptors from every loaded plugin; the
        full (lang=None) gather is cached for repeated calls."""
        if lang is None and self._tasks is not None:
            return iter(self._tasks)
        reformat = RawTaskDefaults(normalize=True)
        tasks: List[Dict] = []
        for plugin in self._plugins:
            raw = plugin["object"].get_plugin_tasks(lang)
            tasks += list(reformat(raw))
        if lang is None:
            self._tasks = tasks
        return iter(tasks)

    def add_to(self, processor, lang: str = None) -> int:
        """Collect into a PiiProcessor; returns number of tasks added."""
        return processor.add_raw_tasks(list(self.gather(lang)))
