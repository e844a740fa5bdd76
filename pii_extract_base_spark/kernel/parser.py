"""Task-descriptor parsing: raw descriptor (dict/tuple) → parsed definition.

Parity: reference gather/parser/parser.py:27-250 (parse, demux, name
autobuild) and gather/collection/sources/utils.py:15-120 (tuple
normalization + header defaults injection + language pre-filter).

Provenance: this module deliberately TRANSCRIBES the reference's
descriptor-parsing semantics (piisa/pii-extract-base, Apache-2.0) — byte-identical
descriptor parsing is a parity mandate, so the matching logic tracks
the upstream structure closely rather than re-deriving it. Upstream:
https://github.com/piisa/pii-extract-base (gather/parser/parser.py),
Copyright its contributors, Apache License 2.0.
"""

import importlib
import re as _stdre
from dataclasses import fields as dataclass_fields
from inspect import cleandoc
from typing import Callable, Dict, Iterable, List, Tuple, Union

from .defs import LANG_ANY
from .exceptions import InvPiiTask, InvArgException
from .model import PiiEnum, PiiTaskInfo
from .task import BasePiiTask

# Field names (reference gather/parser/defs.py:4-6)
FIELD_CLASS = "class"
FIELD_IMP = "task"


def is_pii_class(obj) -> bool:
    """Reference build/build.py:12-16."""
    return isinstance(obj, type) and issubclass(obj, BasePiiTask)


def piienum(ptype: Union[PiiEnum, str]) -> PiiEnum:
    """Validate a PiiEnum value (reference gather/parser/parser.py:27-39)."""
    if ptype is None:
        raise InvArgException("missing PiiEnum in task descriptor")
    if isinstance(ptype, PiiEnum):
        return ptype
    try:
        return PiiEnum[str(ptype).upper()]
    except KeyError as e:
        raise InvArgException("unrecognized PiiEnum: {}", e) from e


def _import_object(objname: str):
    try:
        modname, oname = objname.rsplit(".", 1)
        mod = importlib.import_module(modname)
        return getattr(mod, oname)
    except Exception as e:
        raise InvPiiTask("cannot import task object '{}': {}", objname, e) from e


def _parse_taskdict(raw_taskd: Dict, defaults: Dict = None) -> Tuple[Dict, Dict]:
    """Reference gather/parser/parser.py:51-117."""
    info = {f: raw_taskd[f]
            for f in (df.name for df in dataclass_fields(PiiTaskInfo))
            if f in raw_taskd}

    task_type = raw_taskd.get(FIELD_CLASS)
    if task_type is None:
        if is_pii_class(raw_taskd.get(FIELD_IMP)):
            task_type = "piitask"
        else:
            raise InvPiiTask("missing field: {}", FIELD_CLASS)
    task_type = str(task_type).lower()
    if task_type not in ("piitask", "callable", "re", "regex", "regex-external"):
        raise InvPiiTask("unsupported task class: {}", task_type)
    task = {FIELD_CLASS: task_type}

    if FIELD_IMP not in raw_taskd:
        raise InvPiiTask("missing field: {}", FIELD_IMP)
    if task_type not in ("re", "regex") and isinstance(raw_taskd[FIELD_IMP], str):
        task[FIELD_IMP] = _import_object(raw_taskd[FIELD_IMP])
    else:
        task[FIELD_IMP] = raw_taskd[FIELD_IMP]

    if task_type == "regex-external":
        task[FIELD_CLASS] = "regex"

    if task[FIELD_CLASS] == "regex" and not isinstance(task[FIELD_IMP], str):
        raise InvPiiTask("regex spec should be a string")
    if task[FIELD_CLASS] == "callable" and not callable(task[FIELD_IMP]):
        raise InvPiiTask("callable spec should be a callable")
    if task[FIELD_CLASS] == "piitask" and not is_pii_class(task[FIELD_IMP]):
        raise InvPiiTask("class spec should be a PiiTask object")

    if "kwargs" in raw_taskd:
        task["kwargs"] = raw_taskd["kwargs"]

    if defaults:
        for f in ("source", "version"):
            if f not in info and f in defaults:
                info[f] = defaults[f]

    # Fields that might also be stored in class attributes (pii_name, pii_doc)
    for f in ("name", "doc"):
        if f not in info:
            v = getattr(task[FIELD_IMP], "pii_" + f, None)
            if v:
                info[f] = v

    if "doc" not in info and not isinstance(task[FIELD_IMP], str):
        description = getattr(task[FIELD_IMP], "__doc__", None)
        if description:
            info["doc"] = cleandoc(description).strip()

    return task, info


def _parse_piidict(piid: Dict, task: Dict, defaults: Dict = None) -> Dict:
    """Reference gather/parser/parser.py:120-162."""
    if not isinstance(piid, dict):
        raise InvPiiTask("pii descriptor is not a dict")

    out = {f: piid[f]
           for f in ("lang", "country", "subtype", "context", "method", "extra")
           if f in piid and piid[f]}
    out["pii"] = piienum(piid.get("type"))

    if defaults is not None:
        for f in ("lang", "country"):
            if f in defaults and f not in out:
                out[f] = defaults[f]

    for f in ("subtype", "method"):
        if f not in out:
            v = getattr(task[FIELD_IMP], "pii_" + f, None)
            if v:
                out[f] = v

    if "method" not in out:
        if task[FIELD_CLASS] == "regex":
            out["method"] = "regex"
            if "context" in piid:
                out["method"] += ",context"

    if "lang" not in out:
        raise InvPiiTask("invalid PII info set for {}: missing lang",
                         out["pii"].name)
    return out


def _build_task_name(obj_data: Dict, pii) -> str:
    """Reference gather/parser/parser.py:165-189."""
    name = getattr(obj_data[FIELD_IMP], "__name__", None)
    if name and obj_data[FIELD_CLASS] == "piitask":
        name = " ".join(_stdre.findall(r"[A-Z][^A-Z]*", name)).lower()
    elif name and obj_data[FIELD_CLASS] == "callable":
        name = name.replace("_", " ")
    if name:
        return name

    ent = [pii] if isinstance(pii, dict) else pii
    sall = set()
    for e in ent:
        n = e["pii"].name
        s = e.get("subtype")
        if s:
            n += ":" + s
        sall.add(n)
    return obj_data[FIELD_CLASS] + " for " + "/".join(sorted(sall))


def _demux_field(pii_list: List[Dict], field: str) -> List[Dict]:
    """Explode list-valued subtype/lang/country
    (reference gather/parser/parser.py:192-210)."""
    out = []
    for pii in pii_list:
        value = pii.get(field)
        if not isinstance(value, (list, tuple)):
            out.append(pii)
            continue
        for s in value:
            td = pii.copy()
            td[field] = s
            out.append(td)
    return out


def parse_task_descriptor(taskd: Dict, defaults: Dict = None) -> Dict:
    """Reference gather/parser/parser.py:216-250."""
    if not isinstance(taskd, dict):
        raise InvPiiTask("task descriptor is not a dict")
    try:
        obj_data, task_info = _parse_taskdict(taskd, defaults)
        pii_data = [_parse_piidict(t, obj_data, defaults)
                    for t in taskd.get("pii")]
        for field in ("subtype", "lang", "country"):
            pii_data = _demux_field(pii_data, field)
        if len(pii_data) == 1:
            pii_data = pii_data[0]
        if "name" not in task_info:
            task_info["name"] = _build_task_name(obj_data, pii_data)
        return {"obj": obj_data, "info": task_info, "piid": pii_data}
    except KeyError as e:
        raise InvPiiTask("task descriptor error: missing field {}", e) from e
    except InvPiiTask:
        raise
    except Exception as e:
        raise InvPiiTask("task descriptor error: {}", e) from e


# ---------------------------------------------------------------------------
# Raw descriptor normalization + defaults
# (reference gather/collection/sources/utils.py:15-120)

def normalize_rawtaskd(raw) -> Dict:
    """Ensure a raw task descriptor is a dict with a list-valued "pii" field."""
    if isinstance(raw, dict):
        piid = raw.get("pii")
        if isinstance(piid, dict):
            ent_data = [piid]
        elif isinstance(piid, (str, PiiEnum)):
            ent_data = [{"type": piid, **raw}]
        elif isinstance(piid, (list, tuple)):
            return raw
        else:
            raise InvPiiTask("invalid pii field type: {}", type(piid))
        raw = dict(raw)
        raw["pii"] = ent_data
        return raw

    # Simplified 2/3-tuple descriptor
    if len(raw) != 2 and (len(raw) != 3 or not isinstance(raw[2], str)):
        raise InvPiiTask("invalid simplified task spec")
    task_class = ("PiiTask" if is_pii_class(raw[1])
                  else "callable" if callable(raw[1])
                  else "regex" if isinstance(raw[1], str)
                  else None)
    td = {FIELD_CLASS: task_class, FIELD_IMP: raw[1],
          "pii": [{"type": raw[0]}]}
    if len(raw) > 2:
        td["pii"][0]["subtype"] = raw[2]
    return td


def _add_defaults(orig: Dict, defaults: Dict) -> Dict:
    return {**defaults, **orig}


class RawTaskDefaults:
    """Add header defaults to raw descriptors, with optional language
    pre-filter (reference gather/collection/sources/utils.py:61-120 —
    the pre-filter is the registry-side analogue of predicate pushdown)."""

    def __init__(self, defaults: Dict = None, normalize: bool = True,
                 languages: Iterable[str] = None):
        self._norm = normalize
        self._lang = set(languages) if languages else None
        if defaults is None:
            defaults = {}
        self._piid = {k: v for k, v in defaults.items()
                      if k in ("lang", "country")}
        self._info = {k: v for k, v in defaults.items()
                      if k in ("source", "version")}

    def __call__(self, raw_list: Iterable[Dict]) -> Iterable[Dict]:
        for raw in raw_list:
            if self._lang:
                lang = raw.get("lang") if isinstance(raw, dict) else None
                if isinstance(raw, dict) and lang is None:
                    piid = raw.get("pii")
                    if isinstance(piid, dict):
                        lang = piid.get("lang")
                    elif isinstance(piid, list) and all(
                            isinstance(p, dict) for p in piid):
                        raw = dict(raw)
                        raw["pii"] = [p for p in piid
                                      if p.get("lang") == LANG_ANY
                                      or p.get("lang") in self._lang]
                if lang is not None and lang != LANG_ANY \
                        and lang not in self._lang:
                    continue
            if self._norm:
                raw = normalize_rawtaskd(raw)
            if self._info:
                raw = dict(raw)
                raw.update((k, v) for k, v in self._info.items()
                           if k not in raw)
            if self._piid:
                raw = dict(raw)
                piid = raw["pii"]
                if isinstance(piid, dict):
                    raw["pii"] = _add_defaults(piid, self._piid)
                else:
                    raw["pii"] = [_add_defaults(p, self._piid) for p in piid]
            yield raw
