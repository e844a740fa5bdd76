"""Entity / detector / collection data model.

The reference delegates these to the external ``pii-data`` package (not
installed here); the shapes below are reverse-engineered from observed
usage and asserted golden output:
 - entity dict shape: reference test/unit/D_api/test_A_processor.py:330-361,
   473-504 and test/data/collection-example.json
 - collection header + dense first-use detector numbering:
   test_A_processor.py:277-297 and api/processor.py:65-101
 - lang resolution: an entity whose info.lang == "any" is reported with the
   collection language when the collection has one
   (collection-example.json CREDIT_CARD entry shows lang "en" while
   CreditCardMock builds its PiiEntityInfo with LANG_ANY,
   test/taux/modules/any/credit_card_mock.py:54).
"""

import datetime
import json
from dataclasses import dataclass, fields
from enum import Enum
from typing import Dict, Iterable, List, Optional, TextIO, Union

from .defs import STAGE, FMT_COLLECTION
from .exceptions import InvArgException


class PiiEnum(str, Enum):
    """PII entity types.

    The reference imports this from pii-data; members observed across the
    reference (SURVEY.md §1.1) plus the types our built-in registry and
    the toxicity scrub stage need.
    """

    CREDIT_CARD = "CREDIT_CARD"
    PHONE_NUMBER = "PHONE_NUMBER"
    EMAIL_ADDRESS = "EMAIL_ADDRESS"
    BANK_ACCOUNT = "BANK_ACCOUNT"
    GOV_ID = "GOV_ID"
    BLOCKCHAIN_ADDRESS = "BLOCKCHAIN_ADDRESS"
    IP_ADDRESS = "IP_ADDRESS"
    USERNAME = "USERNAME"
    PASSWORD = "PASSWORD"
    LOCATION = "LOCATION"
    PERSON = "PERSON"
    AGE = "AGE"
    BIRTH_DATE = "BIRTH_DATE"
    NORP = "NORP"
    MEDICAL = "MEDICAL"
    DISEASE = "DISEASE"
    LICENSE_PLATE = "LICENSE_PLATE"
    TOXIC = "TOXIC"
    OTHER = "OTHER"

    def __str__(self) -> str:  # PiiEnum.X.name used widely
        return self.name


@dataclass(frozen=True)
class PiiEntityInfo:
    """Identity of a detectable entity (pii, lang, country, subtype).

    Parity: pii-data PiiEntityInfo as used at reference
    build/task/base.py:109 and keyed at build/task/multi.py:16-26.
    """

    pii: PiiEnum
    lang: Optional[str] = None
    country: Optional[str] = None
    subtype: Optional[str] = None


@dataclass(order=True)
class PiiTaskInfo:
    """All information about a PiiTask (reference build/task/base.py:55-73)."""

    source: Optional[str] = None
    name: Optional[str] = None
    version: Optional[str] = None
    method: Optional[str] = None
    doc: Optional[str] = None

    def asdict(self) -> Dict:
        """As a dict, without empty fields (reference build/task/base.py:67-73)."""
        return {f.name: getattr(self, f.name) for f in fields(self)
                if getattr(self, f.name)}


class PiiDetector:
    """Provenance of a detection (reference api/processor.py:89).

    Identity (for dense-id dedup) is the (source, name, version, method)
    tuple; asdict drops empty fields (collection-example.json header).
    """

    __slots__ = ("source", "name", "version", "method")

    def __init__(self, source: str = None, name: str = None,
                 version: str = None, method: str = None):
        self.source = source
        self.name = name
        self.version = version
        self.method = method

    def key(self) -> tuple:
        return (self.source, self.name, self.version, self.method)

    def asdict(self) -> Dict:
        return {k: getattr(self, k)
                for k in ("name", "source", "version", "method")
                if getattr(self, k)}

    def __eq__(self, other) -> bool:
        return isinstance(other, PiiDetector) and self.key() == other.key()

    def __hash__(self) -> int:
        return hash(self.key())


class PiiEntity:
    """One detected PII instance.

    Parity: pii-data PiiEntity as constructed at reference
    build/task/regex.py:48-49 (``PiiEntity(info, value, chunkid, pos,
    **defaults)``) with the exact asdict() shape of
    test/unit/D_api/test_A_processor.py:330-361.
    """

    __slots__ = ("info", "value", "chunkid", "pos", "fields")

    def __init__(self, info: PiiEntityInfo, value: str, chunkid, pos: int,
                 **kwargs):
        self.info = info
        self.value = value
        self.chunkid = str(chunkid)
        self.pos = int(pos)
        # extra fields: name, country, docid, detector, process, lang override
        self.fields: Dict = {k: v for k, v in kwargs.items() if v is not None}

    def __len__(self) -> int:
        return len(self.value)

    def __str__(self) -> str:
        return f"<PiiEntity {self.info.pii.name}:{self.value}>"

    __repr__ = __str__

    def add_process_stage(self, stage: str, **data) -> None:
        self.fields["process"] = {"stage": stage, **data}

    def asdict(self) -> Dict:
        """Exact reference dict shape; empty fields omitted."""
        lang = self.fields.get("lang") or self.info.lang
        country = self.fields.get("country") or self.info.country
        out = {
            "type": self.info.pii.name,
            "subtype": self.info.subtype,
            "value": self.value,
            "chunkid": self.chunkid,
            "lang": lang,
            "country": country,
            "docid": self.fields.get("docid"),
            "start": self.pos,
            "end": self.pos + len(self.value),
            "detector": self.fields.get("detector"),
            "process": self.fields.get("process"),
        }
        return {k: v for k, v in out.items() if v is not None}


def _today() -> str:
    """Collection date stamp; isolated so tests can monkeypatch it
    (reference patches timestamp to 2045-01-30, test/taux/auxpatch.py:20-40)."""
    return datetime.date.today().isoformat()


class PiiCollectionBuilder:
    """Ordered entity collection with dense first-use detector numbering.

    Parity: pii-data PiiCollection + reference PiiCollectionBuilder
    (api/processor.py:65-101). Detector ids are assigned in order of first
    use — i.e. AFTER the per-chunk position sort (api/processor.py:254-256),
    so a chunk where a credit card appears first numbers it 1
    (test_A_processor.py:473-504) while the doc-level golden run numbers
    phone=1, cc=2 (test_A_processor.py:282-295).
    """

    def __init__(self, lang: str = None, docid: str = None):
        self.lang = lang
        self.docid = str(docid) if docid is not None else None
        self._detectors: Dict[tuple, int] = {}
        self._detector_objs: List[PiiDetector] = []
        self._pii: List[PiiEntity] = []

    def __len__(self) -> int:
        return len(self._pii)

    def __iter__(self):
        return iter(self._pii)

    def get_detector(self, det_id: int) -> PiiDetector:
        return self._detector_objs[det_id - 1]

    def add(self, pii: PiiEntity, detector: PiiDetector) -> None:
        key = detector.key()
        det_id = self._detectors.get(key)
        if det_id is None:
            det_id = len(self._detectors) + 1
            self._detectors[key] = det_id
            self._detector_objs.append(detector)
        pii.fields["detector"] = det_id
        # lang resolution: "any"-lang entities report the collection lang
        if self.lang and pii.info.lang in (None, "any"):
            pii.fields["lang"] = self.lang
        if self.docid is not None and "docid" not in pii.fields:
            pii.fields["docid"] = self.docid
        self._pii.append(pii)

    def add_detector_fields(self, pii: PiiEntity,
                            info: Union[PiiTaskInfo, Dict],
                            method: str = None) -> None:
        """Parity: reference api/processor.py:74-90."""
        if isinstance(info, PiiTaskInfo):
            info = info.asdict()
        kwargs = {k: info.get(k)
                  for k in ("source", "name", "version", "method")}
        if method:
            kwargs["method"] = method
        self.add(pii, PiiDetector(**kwargs))

    def add_collection(self, piic: "PiiCollectionBuilder") -> int:
        """Parity: reference api/processor.py:93-101."""
        num = 0
        for num, pii in enumerate(piic, start=1):
            self.add(pii, piic.get_detector(pii.fields["detector"]))
        return num

    def header(self) -> Dict:
        out = {
            "date": _today(),
            "format": FMT_COLLECTION,
        }
        if self.lang:
            out["lang"] = self.lang
        out["stage"] = STAGE
        out["detectors"] = {i + 1: d.asdict()
                            for i, d in enumerate(self._detector_objs)}
        return out

    def asdict(self) -> Dict:
        """Full-collection dict (shape of test/data/collection-example.json)."""
        return {"metadata": self.header(),
                "pii_list": [p.asdict() for p in self._pii]}

    def dump(self, fout: TextIO, format: str = "json") -> None:
        """Serialize as json or ndjson (reference api/file.py:126-138)."""
        if format == "json":
            json.dump(self.asdict(), fout, indent=2, ensure_ascii=False)
        elif format == "ndjson":
            for p in self._pii:
                fout.write(json.dumps(p.asdict(), ensure_ascii=False) + "\n")
        else:
            raise InvArgException("unknown collection format: {}", format)
