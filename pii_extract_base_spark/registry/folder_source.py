"""Folder task source (reference S5): walk `<base>/<lang>/<country>/
*.py`, import each module, and collect its `PII_TASKS` list as raw
task descriptors with per-directory lang/country defaults.

Replays the reference's semantics
(`/root/reference/src/pii_extract/gather/collection/sources/folder.py`):

 - module variable name `PII_TASKS` (:22); a bare dict counts as a
   one-element list (:136-137)
 - `_`-suffixed directory names escape Python reserved words and are
   normalized back: country `in`/`is` → dirs `in_`/`is_`, language
   `is` → `is_` (:28-33, :203-204)
 - the `any` language directory is also any-country (:198-200)
 - files starting with `_` or `.` are skipped; modules and files are
   visited in sorted order (:111-113, :130)
 - optional `pii_filter`: keep tasks whose PII-type set intersects the
   filter (:139-141)
 - defaults: per-directory {lang, country} + collector-level
   {source, version} (:119-124)

Mechanically we load files by path (`importlib.util`) instead of by
package name — the registry is driver-side only, so no package
installation is required (Spark mapping per SURVEY.md §2.1 S5).
"""

import importlib.util
import sys
from pathlib import Path
from typing import Dict, Iterable, List, Optional

from ..kernel.defs import LANG_ANY, COUNTRY_ANY
from ..kernel.parser import normalize_rawtaskd, piienum

PII_TASKS_VAR = "PII_TASKS"
# reserved-word escapes are ASYMMETRIC in the reference (folder.py:28-33,
# :203-204): only "is" is escaped at the language level ("is" = Icelandic),
# while both "in" (India) and "is" (Iceland) are escaped at country level
_RESERVED_LANG = ("is",)
_RESERVED_COUNTRY = ("in", "is")


def _norm(name: str) -> str:
    """Strip a trailing underscore (reserved-word escape)."""
    return name[:-1] if name.endswith("_") else name


def _subdirs(base: Path) -> List[str]:
    try:
        return sorted(_norm(d.name) for d in base.iterdir()
                      if d.is_dir() and d.name != "__pycache__")
    except FileNotFoundError:
        return []


def _dir_for(name: str, reserved=_RESERVED_COUNTRY) -> str:
    """Reserved-word escape applied when mapping names back to dirs."""
    return name + "_" if name in reserved else name


def _load_module(path: Path, idx: int):
    modname = f"_pii_folder_tasks_{idx}_{path.stem}"
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


class FolderTaskSource:
    """Driver-side collector; feed its output to
    `PiiProcessor.add_raw_tasks` (one call per (lang, country) so the
    directory-level defaults apply, reference folder.py:119-124)."""

    def __init__(self, basedir, source: str, version: Optional[str] = None,
                 pii_filter: Optional[Iterable] = None):
        self.basedir = Path(basedir)
        self.source = source
        self.version = version
        self._pii_filter = (set(piienum(p) for p in pii_filter)
                            if pii_filter else None)
        self._mod_idx = 0

    def language_list(self) -> List[str]:
        return _subdirs(self.basedir)

    def country_list(self, lang: str) -> List[str]:
        return _subdirs(self.basedir / _dir_for(lang, _RESERVED_LANG))

    def _module_tasks(self, path: Path) -> List[Dict]:
        out = []
        for f in sorted(path.iterdir() if path.is_dir() else []):
            if f.suffix != ".py" or f.stem.startswith(("_", ".")):
                continue
            self._mod_idx += 1
            mod = _load_module(f, self._mod_idx)
            tasks = getattr(mod, PII_TASKS_VAR, None)
            if not tasks:
                continue
            if isinstance(tasks, dict):
                tasks = [tasks]
            out.extend(tasks)
        return out

    def _keep(self, raw) -> bool:
        if self._pii_filter is None:
            return True
        pii = set(piienum(p.get("type"))
                  for p in normalize_rawtaskd(raw)["pii"])
        return bool(pii & self._pii_filter)

    def gather(self, lang: Optional[str] = None):
        """Yield (defaults, raw_task_list) per (lang, country) dir."""
        langs = [lang] if isinstance(lang, str) else \
            (lang or self.language_list())
        base_defaults = {"source": self.source}
        if self.version:
            base_defaults["version"] = self.version
        for ln in langs:
            if ln == LANG_ANY:
                pairs = [(LANG_ANY, COUNTRY_ANY,
                          self.basedir / LANG_ANY)]
            else:
                ldir = self.basedir / _dir_for(ln, _RESERVED_LANG)
                pairs = [(ln, c, ldir / _dir_for(c))
                         for c in _subdirs(ldir)]
            for ln_, country, path in pairs:
                tasks = [t for t in self._module_tasks(path)
                         if self._keep(t)]
                if tasks:
                    yield ({"lang": ln_, "country": country,
                            **base_defaults}, tasks)

    def add_to(self, processor, lang: Optional[str] = None) -> int:
        """Collect into a PiiProcessor; returns tasks added."""
        n = 0
        for defaults, tasks in self.gather(lang):
            n += processor.add_raw_tasks(tasks, defaults=defaults)
        return n
