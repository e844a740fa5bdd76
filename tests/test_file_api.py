"""File-level API + CLI tests (reference test/unit/D_api/test_B_file.py
and test/unit/E_app/test_B_detect.py surface): process_file stats,
golden-file output equality (timestamp patched), format-by-extension,
error paths, and the pii-detect console app."""

import json
import tempfile
from pathlib import Path
from unittest.mock import patch

import pytest

import pii_extract_base_spark.kernel.model as model
from pii_extract_base_spark.api import (load_source_document, process_file)
from pii_extract_base_spark.kernel.exceptions import InvArgException

DATA = Path(__file__).parent / "data"
DOCUMENT = DATA / "srcdoc-example.yaml"
CONFIGFILE = DATA / "tasklist-example.json"
GOLDEN = DATA / "collection-golden.json"


@pytest.fixture
def fixed_date():
    with patch.object(model, "_today", lambda: "2045-01-30"):
        yield


def test_load_source_document():
    doc = load_source_document(DOCUMENT)
    assert doc.id == "doc-fixture-001"
    # depth-first pre-order flatten of the chunk tree
    assert [c.id for c in doc.iter_full()] == ["1", "2", "3", "4", "5"]
    assert doc.chunks[2].data.startswith("Reach the account manager")


def test_process_file_stats():
    with tempfile.TemporaryDirectory() as d:
        out = str(Path(d) / "out.json")
        got = process_file(DOCUMENT, out, lang="en", skip_plugins=True,
                          configfile=str(CONFIGFILE))
    exp = {"num": {"calls": 1, "entities": 2},
           "entities": {"PHONE_NUMBER": 1, "CREDIT_CARD": 1}}
    assert got == exp


def test_process_file_golden(fixed_date):
    with tempfile.TemporaryDirectory() as d:
        out = str(Path(d) / "out.json")
        process_file(DOCUMENT, out, lang="en", skip_plugins=True,
                     configfile=str(CONFIGFILE))
        got = json.loads(Path(out).read_text())
    exp = json.loads(GOLDEN.read_text())
    assert got == exp


def test_process_file_ndjson(fixed_date):
    with tempfile.TemporaryDirectory() as d:
        out = str(Path(d) / "out.ndjson")
        process_file(DOCUMENT, out, lang="en", skip_plugins=True,
                     configfile=str(CONFIGFILE))
        lines = [json.loads(l) for l in Path(out).read_text().splitlines()]
    exp = json.loads(GOLDEN.read_text())["pii_list"]
    assert lines == exp


def test_process_file_no_lang_errors():
    with tempfile.TemporaryDirectory() as d:
        out = str(Path(d) / "out.json")
        with pytest.raises(InvArgException):
            process_file(DOCUMENT, out, skip_plugins=True,
                         configfile=str(CONFIGFILE))


def test_process_file_bad_extension_errors():
    with tempfile.TemporaryDirectory() as d:
        out = str(Path(d) / "out.yml")
        with pytest.raises(ValueError):
            process_file(DOCUMENT, out, lang="en", skip_plugins=True,
                         configfile=str(CONFIGFILE))


def test_process_file_builtin_registry(fixed_date):
    """Default run (plugins not skipped) uses the builtin registry."""
    with tempfile.TemporaryDirectory() as d:
        out = str(Path(d) / "out.json")
        got = process_file(DOCUMENT, out, lang="en")
        # no country filter -> AU gov-id callables also fire (the two
        # 11-digit numbers parse as Australian Business Numbers)
        assert got["entities"] == {"PHONE_NUMBER": 1, "CREDIT_CARD": 1,
                                   "GOV_ID": 2}
        # country-filtered build drops the AU tasks
        got = process_file(DOCUMENT, out, lang="en", country=["gb"])
        assert got["entities"] == {"PHONE_NUMBER": 1, "CREDIT_CARD": 1}


def test_detect_cli(fixed_date, capsys):
    from pii_extract_base_spark.app.detect import main
    with tempfile.TemporaryDirectory() as d:
        out = str(Path(d) / "out.json")
        main([str(DOCUMENT), out, "--lang", "en", "--skip-plugins",
              "--configfile", str(CONFIGFILE), "--show-stats"])
        got = json.loads(Path(out).read_text())
    exp = json.loads(GOLDEN.read_text())
    assert got == exp
    assert "Statistics" in capsys.readouterr().err


def test_detect_cli_error_exit():
    from pii_extract_base_spark.app.detect import main
    with pytest.raises(SystemExit):
        main(["/nonexistent.yaml", "/tmp/x.json", "--lang", "en"])


def test_task_info_cli(capsys):
    from pii_extract_base_spark.app.task_info import main
    main(["list-tasks", "--lang", "en", "--skip-plugins",
          "--config", str(CONFIGFILE)])
    out = capsys.readouterr().out
    assert "standard credit card" in out
    assert "international phone number" in out
    main(["list-languages", "--skip-plugins", "--config", str(CONFIGFILE)])
    out = capsys.readouterr().out
    assert "en" in out


def test_process_file_gzip_roundtrip(fixed_date):
    """Transparent .gz on both sides (pii-data openfile contract)."""
    import gzip
    with tempfile.TemporaryDirectory() as d:
        gz_doc = str(Path(d) / "doc.yaml.gz")
        with gzip.open(gz_doc, "wt", encoding="utf-8") as f:
            f.write(DOCUMENT.read_text())
        out = str(Path(d) / "out.json.gz")
        process_file(gz_doc, out, lang="en", skip_plugins=True,
                     configfile=str(CONFIGFILE))
        with gzip.open(out, "rt", encoding="utf-8") as f:
            got = json.load(f)
    assert got == json.loads(GOLDEN.read_text())
