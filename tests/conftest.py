import os
import sys
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pii_extract_base_spark.config import get_spark
    spark = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield spark


@pytest.fixture
def fixture_timestamp(monkeypatch):
    """Pin the collection date like the reference does
    (reference test/taux/auxpatch.py:20-40 patches to 2045-01-30)."""
    import pii_extract_base_spark.kernel.model as model
    monkeypatch.setattr(model, "_today", lambda: "2045-01-30")
