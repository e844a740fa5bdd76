"""Folder task source (S5) — directory layout, reserved-word escapes,
PII_TASKS variable, per-directory lang/country defaults, pii_filter.
Reference semantics: gather/collection/sources/folder.py."""

import textwrap

import pytest

from pii_extract_base_spark.kernel import PiiProcessor, PiiCollectionBuilder
from pii_extract_base_spark.kernel.task import DocumentChunk
from pii_extract_base_spark.registry.folder_source import FolderTaskSource


def _write(p, text):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(text))


@pytest.fixture()
def task_tree(tmp_path):
    base = tmp_path / "tasks"
    # any-lang module: tuple shorthand (regex) — any-lang implies
    # any-country (reference folder.py:198-200)
    _write(base / "any" / "btc.py", """
        PII_TASKS = [("BLOCKCHAIN_ADDRESS",
                      r"\\b[13][A-HJ-NP-Za-km-z1-9]{27,33}\\b")]
    """)
    # en/any: dict descriptor with bare-dict PII_TASKS (counts as list)
    _write(base / "en" / "any" / "email.py", """
        PII_TASKS = {
            "class": "regex",
            "task": r"[\\w.%+-]+@[\\w.-]+\\.[A-Za-z]{2,}",
            "pii": {"type": "EMAIL_ADDRESS"},
        }
    """)
    # country 'in' lives in dir 'in_' (reserved-word escape)
    _write(base / "en" / "in_" / "pan.py", """
        PII_TASKS = [("GOV_ID", r"\\b[A-Z]{5}[0-9]{4}[A-Z]\\b", "PAN")]
    """)
    # skipped files
    _write(base / "en" / "any" / "_private.py", "PII_TASKS = [('GOV_ID', 'x')]")
    _write(base / "en" / "any" / "notes.txt", "not python")
    return base


def test_language_and_country_lists(task_tree):
    src = FolderTaskSource(task_tree, source="unit-test")
    assert src.language_list() == ["any", "en"]
    assert src.country_list("en") == ["any", "in"]


def test_gather_defaults_per_directory(task_tree):
    src = FolderTaskSource(task_tree, source="unit-test", version="1.2.3")
    got = {(d["lang"], d["country"]): tasks for d, tasks in src.gather()}
    assert set(got) == {("any", "any"), ("en", "any"), ("en", "in")}
    assert all(len(t) == 1 for t in got.values())  # _private.py skipped


def test_detect_via_folder_tasks(task_tree):
    proc = PiiProcessor()
    n = FolderTaskSource(task_tree, source="unit-test").add_to(proc)
    assert n == 3
    assert proc.language_list() == ["any", "en"]

    proc.build_tasks("en", country=["any", "in"])
    piic = PiiCollectionBuilder(lang="en", docid="doc1")
    proc.detect_chunk(
        DocumentChunk("0", "mail a@b.com pan ABCDE1234F btc "
                           "1AGNa15ZQXAZUgFiqJ2i7Z2DPU2J6hW62i"),
        piic, default_lang="en")
    got = {(p.asdict()["type"], p.asdict()["value"]) for p in piic}
    assert got == {
        ("EMAIL_ADDRESS", "a@b.com"),
        ("GOV_ID", "ABCDE1234F"),
        ("BLOCKCHAIN_ADDRESS", "1AGNa15ZQXAZUgFiqJ2i7Z2DPU2J6hW62i"),
    }
    # provenance defaults flowed from the collector
    dets = {piic.get_detector(p.asdict()["detector"]).source for p in piic}
    assert dets == {"unit-test"}


def test_pii_filter(task_tree):
    src = FolderTaskSource(task_tree, source="t",
                           pii_filter=["EMAIL_ADDRESS"])
    got = [t for _, tasks in src.gather() for t in tasks]
    assert len(got) == 1


def test_lang_dir_named_in_not_escaped(tmp_path):
    """Reserved-word escapes are asymmetric (reference folder.py:28-33):
    a LANGUAGE directory literally named "in" is used as-is (only "is"
    escapes at language level), while countries escape both in/is."""
    d = tmp_path / "in" / "any"
    d.mkdir(parents=True)
    (d / "t.py").write_text(
        "PII_TASKS = [{'class': 'regex', 'task': r'\\bx\\d+\\b',\n"
        "  'name': 'xid', 'pii': {'type': 'GOV_ID', 'lang': 'in'}}]\n")
    src = FolderTaskSource(tmp_path, source="t")
    assert src.language_list() == ["in"]
    got = list(src.gather())
    assert len(got) == 1
    defaults, tasks = got[0]
    assert defaults["lang"] == "in" and len(tasks) == 1
    # an "is_" language dir still normalizes back to "is"
    d2 = tmp_path / "is_" / "any"
    d2.mkdir(parents=True)
    (d2 / "t.py").write_text(
        "PII_TASKS = [{'class': 'regex', 'task': r'\\by\\d+\\b',\n"
        "  'name': 'yid', 'pii': {'type': 'GOV_ID', 'lang': 'is'}}]\n")
    src = FolderTaskSource(tmp_path, source="t")
    assert src.language_list() == ["in", "is"]
    assert sum(len(t) for _, t in src.gather("is")) == 1
