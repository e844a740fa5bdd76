"""BPE trainer (operators/bpe): Spark merges must equal a pure-Python
reference implementing the same documented semantics (word-frequency
table, count-desc/pair-asc tie-break, left-to-right non-overlapping
single-pass merge application)."""

from collections import Counter

import pytest

from pii_extract_base_spark.operators.bpe import bpe_oracle_sql, bpe_train


def _python_bpe(texts, rounds):
    wf = Counter(w for t in texts for w in t.split())
    syms = {w: " " + " ".join(w) + " " for w in wf}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, n in wf.items():
            a = syms[w].split()
            for i in range(len(a) - 1):
                pc[f"{a[i]} {a[i + 1]}"] += n
        if not pc:
            break
        # count desc, pair asc
        pair, cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r, pair, cnt))
        src, dst = f" {pair} ", " " + pair.replace(" ", "") + " "
        syms = {w: s.replace(src, dst) for w, s in syms.items()}
    return merges


TEXTS = [
    "low low low lower lowest",
    "new newer newest low",
    "wide wider widest new new",
]


def test_bpe_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = bpe_train(df, "text", rounds=8)
    want = _python_bpe(TEXTS, rounds=8)
    assert got == want


def test_bpe_first_merges_hand_checked(spark):
    df = spark.createDataFrame([("low low low lower lowest",)],
                               "text string")
    got = bpe_train(df, "text", rounds=3)
    # l-o and o-w both occur 5x; tie breaks to 'l o'; then 'lo w' wins;
    # then 'low e' (2x in lower/lowest)
    assert got[0] == (1, "l o", 5)
    assert got[1] == (2, "lo w", 5)
    assert got[2] == (3, "low e", 2)


def test_bpe_oracle_replays_trainer(spark):
    duckdb = pytest.importorskip("duckdb")
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = bpe_train(df, "text", rounds=6)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in TEXTS])
    words = ("list_filter(string_split_regex(coalesce(text,''), '\\s+'), "
             "w -> w <> '')")
    rows = con.execute(
        bpe_oracle_sql(words, table="docs", rounds=6)).fetchall()
    assert [(int(r), p, int(c)) for r, p, c in rows] == got


def test_bpe_encode_count_matches_python(spark):
    from pii_extract_base_spark.operators.bpe import bpe_encode_count

    def py_encode_count(text, pairs):
        total = 0
        for w in text.split():
            s = " " + " ".join(w) + " "
            for p in pairs:
                s = s.replace(f" {p} ", " " + p.replace(" ", "") + " ")
            total += len(s.split())
        return total

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "i long, text string")
    merges = bpe_train(df, "text", rounds=6)
    pairs = [p for _, p, _ in merges]
    got = {r["i"]: r["n_bpe_tokens"] for r in
           bpe_encode_count(df, merges).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == py_encode_count(t, pairs), t
    # merging strictly shrinks token counts vs raw chars
    for i, t in enumerate(TEXTS):
        n_chars = sum(len(w) for w in t.split())
        assert got[i] < n_chars
