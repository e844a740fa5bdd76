"""Native scrub expression (functions/scrubnative) vs the Python
kernel (kernel/scrub.scrub_text) — byte parity on randomized span
sets including overlaps, touching spans, and same-(start,end) ties
where Python's stable sort order must be reproduced."""

import random

from pii_extract_base_spark.functions.scrubnative import scrub_expr
from pii_extract_base_spark.kernel.scrub import scrub_text


def test_scrub_expr_matches_kernel_fuzz(spark):
    rng = random.Random(7)
    rows, expected = [], []
    for i in range(200):
        n = rng.randint(5, 150)
        text = "".join(rng.choice("abcdef gh.,\n") for _ in range(n))
        ents = []
        for _ in range(rng.randint(0, 7)):
            a = rng.randint(0, n - 1)
            b = rng.randint(a + 1, n)
            ents.append({"start": a, "end": b,
                         "type": rng.choice(["EMAIL", "PHONE", "X"])})
        # adversarial: duplicate exact span with a DIFFERENT type —
        # the kernel keeps the first-listed one (stable sort)
        if ents and rng.random() < 0.5:
            d = dict(ents[0])
            d["type"] = "Z" + d["type"]
            ents.append(d)
        rows.append((i, text, ents))
        expected.append(scrub_text(
            text, [(e["start"], e["end"], e["type"]) for e in ents]))
    df = spark.createDataFrame(
        rows, "id long, text string, "
              "entities array<struct<start:long,end:long,type:string>>")
    got = {r["id"]: r["sc"]
           for r in df.select(
               "id", scrub_expr("text", "entities").alias("sc"))
           .collect()}
    for i, want in enumerate(expected):
        assert got[i] == want, rows[i]


def test_scrub_expr_null_and_empty(spark):
    df = spark.createDataFrame(
        [(0, None, []), (1, "plain", None), (2, "", [])],
        "id long, text string, "
        "entities array<struct<start:long,end:long,type:string>>")
    got = {r["id"]: r["sc"]
           for r in df.select(
               "id", scrub_expr("text", "entities").alias("sc"))
           .collect()}
    assert got == {0: "", 1: "plain", 2: ""}


def test_scrub_expr_degenerate_span_fields(spark):
    """r4 ADVICE: one entity with a NULL type (or NULL offsets) must
    not NULL the whole document's scrubbed text — NULL type renders
    as '<>', NULL-offset spans are dropped, the rest still scrub."""
    df = spark.createDataFrame(
        [(0, "call 555-1234 now", [(5, 13, None)]),
         (1, "mail a@b.co today", [(None, 7, "EMAIL"), (5, 11, "EMAIL")]),
         (2, "id X99 and Y88 ok", [(3, 6, "ID"), (11, None, "ID")])],
        "id long, text string, "
        "entities array<struct<start:long,end:long,type:string>>")
    got = {r["id"]: r["sc"]
           for r in df.select(
               "id", scrub_expr("text", "entities").alias("sc"))
           .collect()}
    assert got == {0: "call <> now",
                   1: "mail <EMAIL> today",
                   2: "id <ID> and Y88 ok"}
