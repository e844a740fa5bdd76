"""PII detector task classes.

Parity: reference build/task/base.py (BasePiiTask, context wrapping),
build/task/regex.py (regex pkg, X|VERSION0, lastindex group rule),
build/task/callable.py (tuple vs bare-string find-loop semantics),
build/task/multi.py (BaseMultiPiiTask per-key method/context).
"""

import regex

from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Optional, Union

from .exceptions import BuildException, InvArgException, PiiUnimplemented
from .normalizer import normalize
from .context import context_spec, context_check
from .model import PiiEnum, PiiEntityInfo, PiiEntity, PiiTaskInfo


@dataclass
class DocumentChunk:
    """A chunk of document text (parity: pii-data DocumentChunk as used at
    reference api/processor.py:230 and build/task/base.py:176-183)."""

    id: Union[str, int]
    data: str
    context: Optional[Dict] = None


class BasePiiTask:
    """Base class for a PII detector task (reference build/task/base.py:76-206)."""

    def __init__(self, task: Dict = None, pii: Dict = None,
                 config: Dict = None, debug: bool = False, **kwargs):
        if not isinstance(pii, dict):
            raise InvArgException("invalid pii argument to PiiTask")
        if task is None:
            task = {}

        pii_info = {k: v for k, v in pii.items()
                    if k not in ("method", "extra", "context")}
        if "type" in pii_info:  # allow "type" as alias for "pii"
            pii_info["pii"] = pii_info.pop("type")

        self.config = config
        self.debug = debug
        self.task_info = PiiTaskInfo(**task)
        if not self.task_info.method:
            self.task_info.method = pii.get("method")
        self.pii_info = PiiEntityInfo(**pii_info)

        # Add context & method if defined and active
        # (reference build/task/base.py:112-116 — a task config
        # {"context": false} disables context AND strips ",context" from
        # the method string, changing both results and header metadata,
        # proven at test/unit/D_api/test_A_processor.py:364-452)
        do_context = config.get("context", True) if config else True
        context = pii.get("context")
        self.context = context_spec(context) if do_context and context else None
        if not self.context and self.task_info.method:
            self.task_info.method = ",".join(
                v for v in self.task_info.method.split(",") if v != "context")

    def get_method(self, pii=None, **kwargs) -> Optional[str]:
        return self.task_info.method

    def get_pii_defaults(self) -> Dict:
        """Reference build/task/base.py:146-151."""
        return {"name": self.task_info.name, "country": self.pii_info.country}

    def check_context(self, text: str, pii: PiiEntity, prefix: int = 0) -> bool:
        return context_check(text, self.context,
                             [prefix + pii.pos, prefix + pii.pos + len(pii)])

    def find_context(self, chunk: DocumentChunk) -> Iterable[PiiEntity]:
        """Filter find() results by context (reference build/task/base.py:165-191).

        Offset discipline: the lowercased copy is used only for matching;
        all offsets refer to the raw chunk text.
        """
        ndoc = None
        prefix = 0
        for pii in self.find(chunk):
            if ndoc is None:
                if chunk.context:
                    bf = chunk.context.get("before", "")
                    fulltext = bf + chunk.data + chunk.context.get("after", "")
                    prefix = len(bf)
                else:
                    fulltext = chunk.data
                    prefix = 0
                ndoc = normalize(fulltext, pii.info.lang, lowercase=True)
            if self.check_context(ndoc, pii, prefix):
                yield pii

    def find(self, chunk: DocumentChunk) -> Iterable[PiiEntity]:
        raise PiiUnimplemented("missing implementation for Pii Task")

    def __call__(self, chunk: DocumentChunk) -> Iterable[PiiEntity]:
        mth = self.find_context if self.context else self.find
        return mth(chunk)

    def __repr__(self) -> str:
        return (f"<{self.__class__.__name__}:{self.task_info.name} "
                f"[{self.pii_info.lang}/{self.pii_info.country}]>")


class RegexPiiTask(BasePiiTask):
    """Regex-implemented PII task (reference build/task/regex.py:16-49).

    Uses the ``regex`` package in backwards-compatible mode
    (``regex.X | regex.VERSION0``). Group rule: the LAST matched capture
    group, else the whole match (``m.lastindex or 0``), proven at
    reference test/unit/C_build/test_task.py:64-79.
    """

    def __init__(self, pattern: str, **kwargs):
        super().__init__(**kwargs)
        self.pattern = pattern
        try:
            self.regex = regex.compile(pattern, flags=regex.X | regex.VERSION0)
        except Exception as e:
            raise BuildException("cannot compile regex for PII {}: {}: {}",
                                 self.task_info.name, e, pattern) from e

    def find(self, chunk: DocumentChunk) -> Iterable[PiiEntity]:
        defaults = self.get_pii_defaults()
        for cc in self.regex.finditer(chunk.data):
            g = cc.lastindex or 0
            yield PiiEntity(self.pii_info, cc.group(g), chunk.id, cc.start(g),
                            **defaults)


class CallablePiiTask(BasePiiTask):
    """Callable-implemented PII task (reference build/task/callable.py:14-57).

    A yielded tuple is (value, pos); a bare string is located via a
    ``str.find`` loop advancing ``pos + len`` — duplicate strings are
    reported at EVERY occurrence (documented quirk,
    reference doc/task-implementation.md "Note").
    """

    def __init__(self, call: Callable, extra_kwargs: Dict = None, **kwargs):
        super().__init__(**kwargs)
        self.call = call
        self.kwargs = extra_kwargs or {}

    def find(self, chunk: DocumentChunk) -> Iterable[PiiEntity]:
        defaults = self.get_pii_defaults()
        for cc in self.call(chunk.data, **self.kwargs):
            if isinstance(cc, tuple):
                yield PiiEntity(self.pii_info, cc[0], chunk.id, cc[1],
                                **defaults)
                continue
            start = 0
            while True:
                pos = chunk.data.find(cc, start)
                if pos < 0:
                    break
                yield PiiEntity(self.pii_info, cc, chunk.id, pos, **defaults)
                start = pos + len(cc)


def _key(info, lang: str = None, country: str = None, subtype: str = None):
    """Multi-task info key (reference build/task/multi.py:16-26)."""
    if isinstance(info, PiiEntityInfo):
        return info.pii, info.subtype, info.lang, info.country
    if isinstance(info, PiiEnum):
        return info, subtype, lang, country
    raise InvArgException("invalid field for taskinfo: {}", type(info))


class BaseMultiPiiTask(BasePiiTask):
    """A task that detects more than one PII type
    (reference build/task/multi.py:29-129)."""

    def __init__(self, task: Dict = None, pii: List[Dict] = None,
                 config: Dict = None, debug: bool = False, **kwargs):
        # deliberately does NOT call super().__init__ (matches reference)
        self.config = config
        self.debug = debug
        self.task_info = PiiTaskInfo(**(task or {}))
        self.context: Dict = {}
        self.method: Dict = {}
        self._pii_info: Dict = {}
        if pii:
            self.add_pii_info(pii)

    def __repr__(self) -> str:
        return f"<{self.__class__.__name__}:{self.task_info.name}>"

    @property
    def pii_info(self) -> Iterable[PiiEntityInfo]:
        return self._pii_info.values()

    def add_pii_info(self, pii: Union[Dict, List]) -> None:
        if isinstance(pii, dict):
            pii = [pii]
        for ent in pii:
            ent = dict(ent)
            ent.pop("extra", None)
            context = ent.pop("context", None)
            method = ent.pop("method", self.task_info.method)
            if "type" in ent:
                ent["pii"] = ent.pop("type")
            pii_info = PiiEntityInfo(**ent)
            key = _key(pii_info)
            if method:
                self.method[key] = method
            do_context = (self.config.get("context", True)
                          if self.config else True)
            if do_context and context:
                self.context[key] = context_spec(context)
            self._pii_info[key] = pii_info

    def get_method(self, pii, **kwargs) -> str:
        key = _key(pii, **kwargs)
        try:
            return self.method[key]
        except KeyError:
            raise InvArgException("no method in multitask for {}", key)

    def get_pii_info(self, pii, **kwargs) -> PiiEntityInfo:
        key = _key(pii, **kwargs)
        try:
            return self._pii_info[key]
        except KeyError:
            raise InvArgException("no PII info in multitask for {}", key)

    def check_context(self, text: str, pii: PiiEntity, prefix: int = 0) -> bool:
        key = _key(pii.info.pii, lang=pii.info.lang,
                   country=pii.fields.get("country"))
        ctx = self.context.get(key)
        if not ctx:
            return True
        return context_check(text, ctx,
                             [prefix + pii.pos, prefix + pii.pos + len(pii)])

    def __call__(self, chunk: DocumentChunk) -> Iterable[PiiEntity]:
        # multi-task always wraps with (per-key, possibly empty) context check
        mth = self.find_context if self.context else self.find
        return mth(chunk)
