"""Distributed multi-chunk detection (operators/detect.detect_chunked)
vs the local chunk-tree API (kernel PiiProcessor.detect with
chunk_context=True) — SURVEY §2.3 D1 on the DataFrame plane
(reference api/processor.py:284, context behavior
test/unit/D_api/test_A_processor.py:552)."""

from pii_extract_base_spark.kernel.processor import SrcDocument
from pii_extract_base_spark.kernel.scrub import scrub_text
from pii_extract_base_spark.kernel.task import DocumentChunk
from pii_extract_base_spark.registry.factory import make_processor

# chunk 1's phone number has NO context keyword in its own chunk —
# only the neighbor chunk 0 carries "phone", and the spec's window is
# a mere 16 chars left of the span, so the keyword must sit at the
# chunk boundary; chunk 3's number has no context anywhere and the
# PHONE task must skip it; credit card / email are context-free
DOCS = {
    "doc-a": ["Could you call me back by phone",
              "+34983453999 reaches me after lunch",
              "and write to ford.prefect@example.com too",
              "what is this number without context? +34983453000"],
    "doc-b": ["My credit card number is 4273 9666 4581 5642 ok",
              "no PII in this chunk at all"],
    "doc-c": ["nothing here either"],
}


def _local_reference(docid, chunks, context=True):
    """Run the local chunk-tree API and return (entity tuples keyed by
    chunk, scrubbed chunk list, doc-level detector count)."""
    proc = make_processor(("en",))
    doc = SrcDocument(docid,
                      [DocumentChunk(str(i), c)
                       for i, c in enumerate(chunks)],
                      metadata={"lang": "en"})
    piic = proc.detect(doc, chunk_context=context)
    ents = []
    for p in piic:
        d = p.asdict()
        ents.append((int(d["chunkid"]), d["start"], d["end"],
                     d["type"], d["value"], d["detector"]))
    spans = {}
    for p in piic:
        d = p.asdict()
        spans.setdefault(int(d["chunkid"]), []).append(
            (d["start"], d["end"], d["type"]))
    scrubbed = [scrub_text(c, spans.get(i, []))
                for i, c in enumerate(chunks)]
    return sorted(ents), scrubbed


def _spark_result(spark):
    from pii_extract_base_spark.operators.detect import detect_chunked
    rows = [(k, "en", v) for k, v in sorted(DOCS.items())]
    df = spark.createDataFrame(
        rows, "doc_id string, lang string, chunks array<string>")
    out = detect_chunked(df, ("en",)).collect()
    return {r["doc_id"]: r for r in out}


def test_detect_chunked_parity_with_local_api(spark):
    got = _spark_result(spark)
    for docid, chunks in DOCS.items():
        ref_ents, ref_scrubbed = _local_reference(docid, chunks)
        row = got[docid]
        spark_ents = sorted(
            (e["chunk"], e["start"], e["end"], e["type"], e["value"],
             e["detector"]) for e in row["entities"])
        assert spark_ents == ref_ents, docid
        assert list(row["scrubbed_chunks"]) == ref_scrubbed, docid
        assert row["n_chunks"] == len(chunks)
        assert row["n_entities"] == len(ref_ents)


def test_cross_chunk_context_is_load_bearing(spark):
    """The phone in doc-a chunk 1 is ONLY valid through chunk 0's
    'phone' keyword: without neighbor context the local API drops it,
    with context both paths find it — proving the lag/lead window is
    doing the reference's iter_full(context=True) job."""
    with_ctx, _ = _local_reference("doc-a", DOCS["doc-a"], context=True)
    without, _ = _local_reference("doc-a", DOCS["doc-a"], context=False)
    phones_ctx = [e for e in with_ctx if e[3] == "PHONE_NUMBER"]
    phones_no = [e for e in without if e[3] == "PHONE_NUMBER"]
    assert len(phones_ctx) == 1 and phones_ctx[0][0] == 1
    assert phones_no == []
    got = _spark_result(spark)
    spark_phones = [e for e in got["doc-a"]["entities"]
                    if e["type"] == "PHONE_NUMBER"]
    assert len(spark_phones) == 1 and spark_phones[0]["chunk"] == 1
    # the undetectable +34983453000 in chunk 3 must NOT appear
    assert all(e["value"] != "+34983453000"
               for e in got["doc-a"]["entities"])


def test_doc_level_detector_numbering(spark):
    """D12 across chunks: detector ids are dense, first-use-ordered
    over the WHOLE document (chunk, start) — not per chunk."""
    got = _spark_result(spark)
    ents = sorted(got["doc-a"]["entities"],
                  key=lambda e: (e["chunk"], e["start"]))
    seen = {}
    for e in ents:
        key = (e["type"], e["method"])
        if e["detector"] not in seen.values():
            seen[key] = e["detector"]
    ids = sorted({e["detector"] for e in ents})
    assert ids == list(range(1, len(ids) + 1))
    # first entity in document order carries detector 1
    assert ents[0]["detector"] == 1
