"""Config loader (S6) tests: tag extraction, per-tag merge with list
concatenation, base-config layering, legacy shorthand routing."""

import json
from pathlib import Path

import pytest

from pii_extract_base_spark.kernel.defs import (
    FMT_CONFIG_PLUGIN, FMT_CONFIG_TASKS, FMT_CONFIG_TASKCFG)
from pii_extract_base_spark.kernel.exceptions import InvArgException
from pii_extract_base_spark.registry.config_loader import (
    BASE_CONFIG, config_tag, load_config, load_module_config)

DATA = Path(__file__).parent / "data"


def test_config_tag():
    assert config_tag("piisa:config:pii-extract:plugins:v1") == \
        FMT_CONFIG_PLUGIN
    with pytest.raises(InvArgException):
        config_tag("pii-extract:plugins:v1")


def test_load_tagged_dict():
    cfg = load_config({"format": "piisa:config:pii-extract:task-config:v1",
                       "task_config": [{"name": "t1", "config": {}}]})
    assert list(cfg) == [FMT_CONFIG_TASKCFG]
    assert cfg[FMT_CONFIG_TASKCFG]["task_config"][0]["name"] == "t1"


def test_load_file_and_merge_lists(tmp_path):
    f1 = tmp_path / "a.json"
    f1.write_text(json.dumps(
        {"format": "piisa:config:pii-extract:task-config:v1",
         "task_config": [{"name": "t1", "config": {"context": False}}]}))
    f2 = {"format": "piisa:config:pii-extract:task-config:v1",
          "task_config": [{"name": "t2", "config": {}}]}
    cfg = load_config([str(f1), f2])
    names = [c["name"] for c in cfg[FMT_CONFIG_TASKCFG]["task_config"]]
    assert names == ["t1", "t2"]   # lists CONCATENATE across sources


def test_merge_dict_sections_override():
    a = {"format": "piisa:config:pii-extract:plugins:v1",
         "plugins": {"p1": {"load": False}}}
    b = {"format": "piisa:config:pii-extract:plugins:v1",
         "plugins": {"p2": {"load": False}}}
    cfg = load_config([a, b])
    assert set(cfg[FMT_CONFIG_PLUGIN]["plugins"]) == {"p1", "p2"}


def test_legacy_shorthand_routing():
    cfg = load_config({"task_config": [{"name": "x", "config": {}}]})
    assert list(cfg) == [FMT_CONFIG_TASKCFG]
    cfg = load_config({"tasklist": [], "header": {}})
    assert list(cfg) == [FMT_CONFIG_TASKS]


def test_module_config_base_layer():
    cfg = load_module_config()
    assert cfg[FMT_CONFIG_PLUGIN]["plugin-order"] == \
        BASE_CONFIG[FMT_CONFIG_PLUGIN]["plugin-order"]
    # user config extends, does not clobber, the base section
    cfg = load_module_config(
        {"format": "piisa:config:pii-extract:plugins:v1",
         "plugins": {"p9": {"load": False}}})
    assert "plugin-order" in cfg[FMT_CONFIG_PLUGIN]
    assert cfg[FMT_CONFIG_PLUGIN]["plugins"] == {"p9": {"load": False}}
    # base config itself must not be mutated
    assert "plugins" not in BASE_CONFIG[FMT_CONFIG_PLUGIN]


def test_multiconfig_passthrough():
    multi = {FMT_CONFIG_TASKS: {"tasklist": []},
             FMT_CONFIG_TASKCFG: {"task_config": []}}
    cfg = load_config(multi)
    assert set(cfg) == set(multi)


def test_formats_restriction():
    with pytest.raises(InvArgException):
        load_config({"format": "piisa:config:pii-extract:task-config:v1",
                     "task_config": []},
                    formats=[FMT_CONFIG_TASKS])


def test_taskconfig_reaches_build(tmp_path):
    """A task-config override flows through the merged config into the
    built task (reference behavior: context disable changes both the
    header method and the detection results)."""
    from pii_extract_base_spark.registry.factory import make_processor
    taskcfg = {
        "format": "piisa:config:pii-extract:task-config:v1",
        "task_config": [{
            "source": "pii-extract-base-spark:builtin",
            "name": "international phone number",
            "config": {"context": False},
        }],
    }
    proc = make_processor(["en"], config=taskcfg)
    phone = [t for t in proc._tasks["en"]
             if t.task_info.name == "international phone number"]
    assert phone and phone[0].context is None
    assert phone[0].task_info.method == "regex"   # ",context" stripped


def test_foreign_module_sections_pass_through():
    """A shared PIISA multi-config carrying sections for OTHER modules
    (e.g. pii-transform:*) loads without error and the foreign section
    survives untouched (reference load_config passes it through)."""
    from pii_extract_base_spark.registry.config_loader import load_config
    cfg = {
        "pii-extract:task-config:v1": {"task_config": [{"name": "x"}]},
        "pii-transform:main:v1": {"policy": "redact"},
    }
    out = load_config(cfg)
    assert out["pii-transform:main:v1"] == {"policy": "redact"}
    assert out["pii-extract:task-config:v1"]["task_config"] == [{"name": "x"}]
