"""Task collection: gather → filter → build (with memoization).

Parity: reference gather/collection/task_collection.py:28-182,
gather/collection/utils.py:40-72 (filter predicate), build/build.py:19-84
(per-task config override + build dispatch), and the JSON task source
gather/collection/sources/json.py:21-85 (format
``piisa:config:pii-extract:tasks:v1``: header defaults + tasklist).

In the Spark engine this whole module runs DRIVER-SIDE once; the built
tasks form the compiled detector registry that is broadcast to executors
(SURVEY.md §2.2 C6).
"""

import json
from pathlib import Path
from typing import Dict, Iterable, List, Set, Union

from .defs import LANG_ANY, COUNTRY_ANY
from .exceptions import InvArgException
from .model import PiiEnum
from .parser import parse_task_descriptor, RawTaskDefaults, is_pii_class
from .task import BasePiiTask, CallablePiiTask, RegexPiiTask


# --------------------------------------------------------------------------
# field helpers (reference helper/utils.py:13-44)

def field_set(value) -> Set[str]:
    return set([value] if isinstance(value, (int, str))
               else value) if value else set()


def taskd_field(taskd, field: str = "lang") -> Set:
    if isinstance(taskd, dict):
        return field_set(taskd.get(field))
    allsets = (taskd_field(s, field) for s in taskd)
    return set().union(*allsets)


def union_sets(values) -> List[str]:
    return sorted(set().union(*values))


# --------------------------------------------------------------------------
# filter predicate (reference gather/collection/utils.py:40-72)

def ensure_enum(pii) -> PiiEnum:
    try:
        return pii if isinstance(pii, PiiEnum) else PiiEnum[str(pii).upper()]
    except KeyError:
        raise InvArgException("unknown pii type: {}", pii)


def ensure_enum_list(pii) -> List[PiiEnum]:
    if isinstance(pii, (list, tuple)):
        return [ensure_enum(t) for t in pii]
    return [ensure_enum(pii)]


def piid_ok(piid: Dict, lang: Set[str], country: Set[str],
            pii: Set[PiiEnum]) -> bool:
    """Set-intersection filter; a task with NO country passes any country
    filter (reference gather/collection/utils.py:40-60)."""
    if pii and not pii & taskd_field(piid, "pii"):
        return False
    if lang and not lang & taskd_field(piid, "lang"):
        return False
    if country:
        task_country = taskd_field(piid, "country")
        if task_country and not country & task_country:
            return False
    return True


def filter_piid(piid, lang, country=None, pii=None):
    if not lang and not country and not pii:
        return piid
    if isinstance(piid, dict):
        return piid if piid_ok(piid, lang, country, pii) else None
    return [p for p in piid if piid_ok(p, lang, country, pii)]


# --------------------------------------------------------------------------
# build dispatch + per-task config override (reference build/build.py:19-84)

def find_task_config(config: Dict, base_args: Dict):
    """Match ``task_config`` entries by name (+optional source/version)."""
    if config is None:
        return None
    config = config.get("task_config")
    if config is None:
        return None
    info = base_args["task"]
    tname = info.get("name")
    config = [c for c in config if c.get("name") == tname]
    if not config:
        return None
    tsource = info.get("source")
    config = [c for c in config if c.get("source") in (tsource, None)]
    if not config:
        return None
    tversion = info.get("version")
    config = [c for c in config if c.get("version") in (tversion, None)]
    return config[0].get("config") if config else None


def build_task(taskd: Dict, config: Dict = None,
               debug: bool = False) -> BasePiiTask:
    """Build a task object from a parsed task definition."""
    try:
        odef = taskd["obj"]
        tclass, tobj = odef["class"], odef["task"]
        piid = taskd["piid"]
        # a language-filtered singleton list flattens to its dict, matching
        # the parse-time flatten (reference gather/parser/parser.py:234-235)
        if isinstance(piid, list) and len(piid) == 1 and tclass != "piitask":
            piid = piid[0]
        base_args = {"task": taskd["info"], "pii": piid}
    except KeyError as e:
        raise InvArgException("invalid final taskd: missing field {}", e)

    extra_kwargs = odef.get("kwargs", {})
    config = find_task_config(config, base_args)

    if tclass == "piitask":
        return tobj(**base_args, **extra_kwargs, config=config, debug=debug)
    if tclass == "callable":
        return CallablePiiTask(tobj, **base_args, extra_kwargs=extra_kwargs,
                               config=config, debug=debug)
    if tclass in ("re", "regex"):
        return RegexPiiTask(tobj, **base_args, **extra_kwargs,
                            config=config, debug=debug)
    raise InvArgException("invalid pii task type for {}: {}",
                          taskd["piid"], tclass)


# --------------------------------------------------------------------------

def is_lang_any(piid) -> bool:
    if isinstance(piid, dict):
        return piid["lang"] == LANG_ANY
    return any(t["lang"] == LANG_ANY for t in piid)


class PiiTaskCollection:
    """Holds parsed task definitions; instantiates task objects on demand,
    memoized by (lang-or-any, id(impl)) so "any"-language tasks are built
    once and shared across languages
    (reference gather/collection/task_collection.py:152-182)."""

    def __init__(self, task_config: Dict = None, debug: bool = False):
        self._debug = debug
        self._taskcfg = task_config
        self._lang = None
        self._countries = None
        self._built: Dict[str, BasePiiTask] = {}
        self.task_def: List[Dict] = []

    def __len__(self) -> int:
        return len(self.task_def)

    def __repr__(self) -> str:
        return f"<PiiTaskCollection #{len(self)}>"

    def num(self, built: bool = False) -> int:
        return len(self._built) if built else len(self.task_def)

    # -- gathering ---------------------------------------------------------

    def add_raw_tasks(self, raw_list: Iterable, defaults: Dict = None,
                      languages: Iterable[str] = None) -> int:
        """Normalize + inject defaults + parse a list of raw descriptors."""
        self._lang = self._countries = None
        reformat = RawTaskDefaults(defaults, languages=languages)
        num = 0
        for num, taskd in enumerate(reformat(raw_list), start=1):
            self.task_def.append(parse_task_descriptor(taskd))
        return num

    def add_json_tasks(self, src: Union[str, Path, Dict],
                       languages: Iterable[str] = None) -> int:
        """JSON task source (reference gather/collection/sources/json.py:21-85,
        format of test/data/tasklist-example.json)."""
        if isinstance(src, (str, Path)):
            with open(src, encoding="utf-8") as f:
                src = json.load(f)
        if not isinstance(src, dict):
            raise InvArgException("invalid JSON task source")
        fmt = src.get("format", "")
        if "pii-extract" not in fmt or "tasks" not in fmt:
            raise InvArgException("invalid task file format: {}", fmt)
        header = src.get("header", {})
        tasklist = src.get("tasklist", [])
        return self.add_raw_tasks(tasklist, defaults=header,
                                  languages=languages)

    # -- introspection ------------------------------------------------------

    def language_list(self) -> List[str]:
        if self._lang is None:
            self._lang = union_sets(taskd_field(t["piid"], "lang")
                                    for t in self.task_def)
        return self._lang

    def country_list(self) -> List[str]:
        if self._countries is None:
            self._countries = union_sets(taskd_field(t["piid"], "country")
                                         for t in self.task_def)
        return self._countries

    # -- filtering + building ------------------------------------------------

    def taskdef_list(self, lang=None, country=None, pii=None,
                     add_any: bool = True) -> Iterable[Dict]:
        """Reference gather/collection/task_collection.py:105-149."""
        if lang:
            lang = field_set(lang)
            if add_any:
                lang.add(LANG_ANY)
        if country:
            country = field_set(country)
            if add_any:
                country.add(COUNTRY_ANY)
        pii = set(ensure_enum_list(pii)) if pii is not None else None

        for taskd in self.task_def:
            if not lang and not country and not pii:
                yield taskd
                continue
            piid = filter_piid(taskd["piid"], lang, country, pii)
            if not piid:
                continue
            elif isinstance(piid, dict) or len(piid) == len(taskd["piid"]):
                yield taskd
            else:
                yield {"obj": taskd["obj"], "info": taskd["info"],
                       "piid": piid}

    def build_tasks(self, lang: str = None, country=None, pii=None,
                    add_any: bool = True) -> Iterable[BasePiiTask]:
        for td in self.taskdef_list(lang, country, pii=pii, add_any=add_any):
            langid = LANG_ANY if is_lang_any(td["piid"]) else lang
            objid = f"{langid}-{id(td['obj']['task'])}"
            if objid not in self._built:
                self._built[objid] = build_task(td, config=self._taskcfg,
                                                debug=self._debug)
            yield self._built[objid]
