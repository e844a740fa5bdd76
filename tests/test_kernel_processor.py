"""Behavioral contract tests, ported from
/root/reference/test/unit/D_api/test_A_processor.py and
/root/reference/test/unit/C_build/test_task.py.

These pin: exact entity asdict() shapes incl. offsets, dense first-use
detector numbering after the per-chunk position sort, config-driven
context disable (changes both results and header method), multilingual
dispatch, stats, and the regex lastindex group rule.
"""

import pytest

from pii_extract_base_spark.kernel import (
    PiiEnum, PiiProcessor, PiiCollectionBuilder,
    RegexPiiTask, CallablePiiTask, BasePiiTask, PiiTaskInfo,
)
from pii_extract_base_spark.kernel.task import DocumentChunk
from pii_extract_base_spark.kernel.processor import SrcDocument
from pii_extract_base_spark.kernel.exceptions import PiiUnimplemented
from pii_extract_base_spark.registry.detectors import (
    CreditCardDetector, PATTERN_INT_PHONE, PHONE_CONTEXT_EN,
)

# The reference's tasklist-example.json, with impls bound directly
# (reference test/data/tasklist-example.json)
TEST_TASKLIST = {
    "format": "piisa:config:pii-extract:tasks:v1",
    "header": {
        "lang": "en",
        "source": "piisa:pii-extract-base:test",
        "version": "0.0.1",
    },
    "tasklist": [
        {
            "class": "PiiTask",
            "task": CreditCardDetector,
            "pii": {"type": "CREDIT_CARD", "lang": "any", "country": "any"},
        },
        {
            "class": "regex",
            "task": PATTERN_INT_PHONE,
            "doc": "Unit test international phone number [regex-external]",
            "pii": {
                "type": "PHONE_NUMBER",
                "subtype": "international phone number",
                "lang": "en",
                "country": "any",
                "context": PHONE_CONTEXT_EN,
            },
        },
    ],
}

# reference test/data/task-config.json
TASK_CONFIG = {
    "format": "piisa:config:pii-extract:task-config:v1",
    "task_config": [
        {
            "source": "piisa:pii-extract-base:test",
            "name": "regex for PHONE_NUMBER:international phone number",
            "config": {"context": False},
        }
    ],
}

SRC = """My current credit card number is 4273 9666 4581 5642 and my phone
      number is +34983453999. This other one, however, is not a valid credit
      card number: 9999 9666 4581 5643"""


def make_proc(config=None):
    proc = PiiProcessor(config=config)
    proc.add_json_tasks(TEST_TASKLIST)
    return proc


# -- minidoc-equivalent document (reference test/data/minidoc-example.yaml) --

def minidoc():
    chunks = [
        DocumentChunk("1", "An example source document"),
        DocumentChunk("2", "Section 1"),
        DocumentChunk("3", "My name is Ford Prefect, my phone number is "
                           "+34983453999, and my SSN\nis aBC"),
        DocumentChunk("4", "My credit card number is 4273 9666 4581 5642 and "
                           "I have used it to buy\nBTCs stored at "
                           "1AGNa15ZQXAZUgFiqJ2i7Z2DPU2J6hW62i. This one, "
                           "however, is\nnot a credit card number: "
                           "9999 9666 4581 5643"),
        DocumentChunk("5", "What is this number without context? "
                           "+34983453000"),
    ]
    return SrcDocument("00000-11111", chunks, metadata={"lang": "en"})


def test_task_name_autobuild():
    """Auto name 'regex for PHONE_NUMBER:international phone number'
    (reference gather/parser/parser.py:165-189 + golden header)."""
    proc = make_proc()
    proc.build_tasks("en")
    names = {t.task_info.name for t in proc._tasks["en"]}
    assert "regex for PHONE_NUMBER:international phone number" in names
    # class attr pii_name wins over CamelCase autobuild
    # (reference golden header, test_A_processor.py:282-295)
    assert "standard credit card" in names


def test_detect_header(fixture_timestamp):
    """Reference test230: exact collection header incl. detector numbering."""
    proc = make_proc()
    proc.build_tasks("en")
    r = proc.detect(minidoc())

    exp = {
        "date": "2045-01-30",
        "format": "piisa:pii-collection:v1",
        "lang": "en",
        "stage": "detection",
        "detectors": {
            1: {
                "name": "regex for PHONE_NUMBER:international phone number",
                "source": "piisa:pii-extract-base:test",
                "version": "0.0.1",
                "method": "regex,context",
            },
            2: {
                "name": "standard credit card",
                "source": "piisa:pii-extract-base:test",
                "version": "0.0.1",
                "method": "regex,checksum",
            },
        },
    }
    assert exp == r.header()


def test_detect_pii_dict(fixture_timestamp):
    """Reference test250: full dict results, exact offsets."""
    proc = make_proc()
    proc.build_tasks("en")
    r = proc.detect(minidoc())
    pii = list(r)
    assert len(pii) == 2

    assert pii[0].asdict() == {
        "detector": 1,
        "type": "PHONE_NUMBER",
        "subtype": "international phone number",
        "process": {"stage": "detection"},
        "value": "+34983453999",
        "chunkid": "3",
        "country": "any",
        "lang": "en",
        "docid": "00000-11111",
        "start": 44,
        "end": 56,
    }
    assert pii[1].asdict() == {
        "detector": 2,
        "process": {"stage": "detection"},
        "type": "CREDIT_CARD",
        "value": "4273 9666 4581 5642",
        "chunkid": "4",
        "subtype": "standard credit card",
        "lang": "en",
        "docid": "00000-11111",
        "start": 25,
        "end": 44,
    }


def test_detect_pii_config_context_disable(fixture_timestamp):
    """Reference test250_tasks_detect_pii_config: task_config
    {"context": false} yields a third phone AND strips ',context' from
    the header method."""
    proc = make_proc(config=TASK_CONFIG)
    proc.build_tasks("en")
    r = proc.detect(minidoc())

    hdr = r.header()
    assert hdr["detectors"][1]["method"] == "regex"

    pii = list(r)
    assert len(pii) == 3
    assert pii[2].asdict() == {
        "detector": 1,
        "type": "PHONE_NUMBER",
        "subtype": "international phone number",
        "process": {"stage": "detection"},
        "value": "+34983453000",
        "chunkid": "5",
        "country": "any",
        "lang": "en",
        "docid": "00000-11111",
        "start": 37,
        "end": 49,
    }


def test_detect_chunk(fixture_timestamp):
    """Reference test300: chunk-level detection — detector numbering is by
    first-use AFTER the position sort (cc first here)."""
    proc = make_proc()
    proc.build_tasks(lang="en")

    piic = PiiCollectionBuilder(lang="en")
    n = proc.detect_chunk(DocumentChunk(id=0, data=SRC), piic)
    assert n == 2

    got = [p.asdict() for p in piic]
    assert got == [
        {
            "detector": 1,
            "process": {"stage": "detection"},
            "type": "CREDIT_CARD",
            "subtype": "standard credit card",
            "value": "4273 9666 4581 5642",
            "chunkid": "0",
            "lang": "en",
            "start": 33,
            "end": 52,
        },
        {
            "detector": 2,
            "process": {"stage": "detection"},
            "type": "PHONE_NUMBER",
            "subtype": "international phone number",
            "value": "+34983453999",
            "chunkid": "0",
            "lang": "en",
            "country": "any",
            "start": 82,
            "end": 94,
        },
    ]


def test_detect_chunk_multilang(fixture_timestamp):
    """Reference test310: language dispatch on chunk context."""
    proc = make_proc()
    proc.build_tasks(lang="en")

    chunk = DocumentChunk(id=0, data=SRC, context={"lang": "en"})
    piic = PiiCollectionBuilder()
    assert proc.detect_chunk(chunk, piic) == 2
    got = [p.asdict() for p in piic]
    assert got[0]["lang"] == "any"   # no collection lang → stays any

    # ES chunk with only EN tasks built → nothing
    chunk = DocumentChunk(id=0, data=SRC, context={"lang": "es"})
    piic = PiiCollectionBuilder()
    assert proc.detect_chunk(chunk, piic) == 0

    # Build for ES → the any-lang CC task now applies
    proc.build_tasks(lang="es")
    assert proc.detect_chunk(chunk, piic) == 1
    got = [p.asdict() for p in piic]
    assert len(got) == 1 and got[0]["type"] == "CREDIT_CARD"


def test_stats(fixture_timestamp):
    """Reference test400."""
    proc = make_proc()
    proc.build_tasks("en")
    proc.detect(minidoc())
    stats = proc.get_stats()
    assert stats == {"num": {"calls": 1, "entities": 2},
                     "entities": {"PHONE_NUMBER": 1, "CREDIT_CARD": 1}}


# -- task-level tests (reference test/unit/C_build/test_task.py) -------------

def as_tuples(entities):
    return [(e.info.pii, e.value, e.chunkid, e.pos) for e in entities]


def test_base_unimplemented():
    task = BasePiiTask(task={"name": "example"},
                       pii={"pii": PiiEnum.BLOCKCHAIN_ADDRESS, "lang": "es"})
    with pytest.raises(PiiUnimplemented):
        list(task(DocumentChunk("1", "blah")))


def test_regex_task():
    task = RegexPiiTask(r"\d{4}", task={"name": "example"},
                        pii={"pii": PiiEnum.CREDIT_CARD, "lang": "es"})
    got = as_tuples(task(DocumentChunk("1", "number 1234 and number 3451")))
    assert got == [(PiiEnum.CREDIT_CARD, "1234", "1", 7),
                   (PiiEnum.CREDIT_CARD, "3451", "1", 23)]


def test_regex_group_rule():
    """lastindex group rule (reference test_task.py:64-79)."""
    task = RegexPiiTask(r"number\s(\d{4})", task={"name": "example"},
                        pii={"pii": PiiEnum.CREDIT_CARD, "lang": "es"})
    got = as_tuples(task(DocumentChunk("1", "number 1234 and number 3451")))
    assert got == [(PiiEnum.CREDIT_CARD, "1234", "1", 7),
                   (PiiEnum.CREDIT_CARD, "3451", "1", 23)]


def test_callable_bare_string_find_loop():
    """Bare-string results are located at EVERY occurrence
    (reference build/task/callable.py:50-57)."""
    def example_callable(i: str):
        return ["1234"]

    task = CallablePiiTask(example_callable, task={"name": "example"},
                           pii={"pii": PiiEnum.CREDIT_CARD, "lang": "es"})
    got = as_tuples(task(DocumentChunk("abc", "num 1234 then 1234 again")))
    assert got == [(PiiEnum.CREDIT_CARD, "1234", "abc", 4),
                   (PiiEnum.CREDIT_CARD, "1234", "abc", 14)]


def test_callable_tuple():
    def example_callable(i: str):
        return [("1234", 7), ("3451", 23)]

    task = CallablePiiTask(example_callable, task={"name": "example"},
                           pii={"pii": PiiEnum.CREDIT_CARD, "lang": "es"})
    got = as_tuples(task(DocumentChunk("abc", "number 1234 and number 3451")))
    assert got == [(PiiEnum.CREDIT_CARD, "1234", "abc", 7),
                   (PiiEnum.CREDIT_CARD, "3451", "abc", 23)]


def test_taskinfo_dict():
    info = PiiTaskInfo(source="unit-test", name="example")
    assert info.asdict() == {"source": "unit-test", "name": "example"}


def test_task_info_inventory():
    """task_info(): (pii, subtype)-keyed inventory with per-language
    dedup of shared any-lang tasks (reference api/processor.py:176-212)."""
    from pii_extract_base_spark.registry.factory import make_processor
    from pii_extract_base_spark.kernel.model import PiiEnum
    from pii_extract_base_spark.kernel.exceptions import (
        ProcException, InvArgException)
    import pytest as _pytest

    proc = make_processor(["en", "es"])
    info = proc.task_info()
    cc = info[(PiiEnum.CREDIT_CARD, None)]
    assert len(cc) == 1            # any-lang task deduped across en/es
    assert cc[0][2] == "standard credit card"
    assert cc[0][4] == "regex,checksum"
    phones = info[(PiiEnum.PHONE_NUMBER, "international phone number")]
    assert sorted(p[0] for p in phones) == ["en", "es"]
    # asdict + lang restriction
    d = proc.task_info(lang="en", asdict=True)
    assert all(set(v[0]) == {"lang", "country", "name", "doc", "method"}
               for v in d.values())
    with _pytest.raises(InvArgException):
        proc.task_info(lang="fr")
    from pii_extract_base_spark.kernel.processor import PiiProcessor
    with _pytest.raises(ProcException):
        PiiProcessor().task_info()
