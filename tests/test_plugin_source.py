"""Plugin task source tests (reference
test/unit/B_gather/sources/test_collector_plugin.py, with entry_points
monkeypatched like test/taux/auxpatch.py:63-87)."""

from unittest.mock import Mock

import pytest

import pii_extract_base_spark.registry.plugin_source as mod
from pii_extract_base_spark.kernel.defs import FMT_CONFIG_PLUGIN
from pii_extract_base_spark.kernel.exceptions import ProcException
from pii_extract_base_spark.kernel.processor import PiiProcessor
from pii_extract_base_spark.registry.detectors import (
    PATTERN_INT_PHONE, PHONE_CONTEXT_EN, CreditCardDetector,
    tax_file_number)

RAW_PHONE = {
    "class": "regex", "task": PATTERN_INT_PHONE,
    "name": "international phone number",
    "pii": {"type": "PHONE_NUMBER", "lang": "en", "country": "any",
            "context": PHONE_CONTEXT_EN},
}
RAW_GOVID = {
    "class": "callable", "task": tax_file_number,
    "pii": {"type": "GOV_ID", "lang": "en", "country": "au"},
}
RAW_CC = {
    "class": "PiiTask", "task": CreditCardDetector,
    "pii": {"type": "CREDIT_CARD", "lang": "any", "country": "any"},
}


class PluginMock:
    version = "0.999"
    description = "A plugin mock description"
    source = "test-mock"

    def __init__(self, config=None, debug=None, languages=None):
        self.languages = set(languages) if languages else None

    def get_plugin_tasks(self, lang=None):
        data = [RAW_PHONE, RAW_GOVID, RAW_CC]
        if self.languages:
            data = [d for d in data
                    if d["pii"]["lang"] in self.languages
                    or d["pii"]["lang"] == "any"]
        if lang:
            data = [d for d in data
                    if d["pii"]["lang"] in (lang, "any")]
        return iter(data)


class FailingPlugin:
    def __init__(self, config=None, debug=None, **kw):
        raise RuntimeError("boom")


def _patch_entry_points(monkeypatch, names, cls=PluginMock):
    plist = []
    for name in names:
        e = Mock()
        e.name = name
        e.load = Mock(return_value=cls)
        plist.append(e)

    def select(group=None):
        return plist if group == mod.PII_EXTRACT_PLUGIN_ID else []

    eps = Mock()
    eps.select = Mock(side_effect=select)
    monkeypatch.setattr(mod, "entry_points", Mock(return_value=eps))


def test_constructor(monkeypatch):
    _patch_entry_points(monkeypatch, ["mock-plugin-1"])
    src = mod.PluginTaskSource()
    assert repr(src) == "<PluginTaskSource: #1>"
    pl = src.list_plugins()
    assert len(pl) == 1
    assert pl[0]["name"] == "mock-plugin-1"
    assert pl[0]["version"] == "0.999"
    assert pl[0]["source"] == "test-mock"
    assert isinstance(pl[0]["object"], PluginMock)


def test_plugin_order(monkeypatch):
    _patch_entry_points(monkeypatch, ["alpha", "beta", "gamma"])
    config = {FMT_CONFIG_PLUGIN: {"plugin-order": ["gamma"]}}
    src = mod.PluginTaskSource(config=config)
    assert [p["name"] for p in src.list_plugins()] == \
        ["gamma", "alpha", "beta"]


def test_plugin_load_false(monkeypatch):
    _patch_entry_points(monkeypatch, ["alpha", "beta"])
    config = {FMT_CONFIG_PLUGIN: {"plugins": {"beta": {"load": False}}}}
    src = mod.PluginTaskSource(config=config)
    assert [p["name"] for p in src.list_plugins()] == ["alpha"]


def test_plugin_options_and_languages(monkeypatch):
    _patch_entry_points(monkeypatch, ["alpha"])
    src = mod.PluginTaskSource(languages=["en"])
    assert src.list_plugins()[0]["object"].languages == {"en"}


def test_plugin_instantiation_error(monkeypatch):
    _patch_entry_points(monkeypatch, ["bad"], cls=FailingPlugin)
    with pytest.raises(ProcException):
        mod.PluginTaskSource()


def test_gather_and_cache(monkeypatch):
    _patch_entry_points(monkeypatch, ["mock-plugin-1"])
    src = mod.PluginTaskSource()
    tasks = list(src.gather())
    assert len(tasks) == 3
    # full gather is cached: same objects on repeat
    again = list(src.gather())
    assert [id(t) for t in tasks] == [id(t) for t in again]
    # lang-restricted gather is not cached, filters by plugin
    en = list(src.gather("en"))
    assert len(en) == 3   # en+any tasks


def test_add_to_processor_end_to_end(monkeypatch):
    _patch_entry_points(monkeypatch, ["mock-plugin-1"])
    proc = PiiProcessor()
    n = mod.PluginTaskSource().add_to(proc)
    assert n == 3
    assert proc.build_tasks("en") == 3
    from pii_extract_base_spark.kernel.task import DocumentChunk
    from pii_extract_base_spark.kernel.model import PiiCollectionBuilder
    piic = PiiCollectionBuilder(lang="en", docid="d1")
    proc.detect_chunk(DocumentChunk("1",
                      "my phone is +44201234567 ok"), piic)
    assert len(piic) == 1
    assert next(iter(piic)).asdict()["type"] == "PHONE_NUMBER"


def test_factory_load_plugins(monkeypatch):
    _patch_entry_points(monkeypatch, ["mock-plugin-1"])
    from pii_extract_base_spark.registry.factory import make_processor
    proc = make_processor(["en"], include_builtin=False, load_plugins=True)
    assert len(proc._tasks["en"]) == 3
