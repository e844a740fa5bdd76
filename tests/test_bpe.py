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


# ---------------------------------------------------------------------------
# Production path: batched training + Arrow encoder (round-4 additions)

def test_batched_train_batch1_equals_sequential(spark):
    """batch=1 must reproduce bpe_train exactly — same candidates,
    same tie-break, same merge application."""
    from pii_extract_base_spark.operators.bpe import bpe_train_batched
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    seq = bpe_train(df, "text", rounds=8)
    bat = bpe_train_batched(df, "text", num_merges=8, batch=1,
                            min_count=1)
    assert bat == seq


def _python_bpe_batched(texts, num_merges, batch):
    """Pure-python replay of bpe_train_batched's documented algorithm:
    per round, top-4·want candidates (count desc, pair asc), greedy
    symbol-disjoint pick, chained single-pass application."""
    wf = Counter(w for t in texts for w in t.split())
    syms = {w: " " + " ".join(w) + " " for w in wf}
    merges, rnd = [], 0
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        pc = Counter()
        for w, n in wf.items():
            a = syms[w].split()
            for i in range(len(a) - 1):
                pc[f"{a[i]} {a[i + 1]}"] += n
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        top = [kv for kv in top if kv[1] >= 1][:4 * want]
        if not top:
            break
        used, chosen = set(), []
        for pair, cnt in top:
            a, b = pair.split(" ")
            if a in used or b in used:
                continue
            used.update((a, b, a + b))
            chosen.append((pair, cnt))
            if len(chosen) >= want:
                break
        for pair, cnt in chosen:
            rnd += 1
            merges.append((rnd, pair, cnt))
            src, dst = f" {pair} ", " " + pair.replace(" ", "") + " "
            syms = {w: s.replace(src, dst) for w, s in syms.items()}
    return merges


def test_batched_train_matches_python_reference(spark):
    """The Spark batched trainer replays the documented algorithm
    exactly — including greedy symbol-disjoint selection within a
    round and exact pre-round counts."""
    from pii_extract_base_spark.operators.bpe import bpe_train_batched
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe_train_batched(df, "text", num_merges=6, batch=6,
                               min_count=1)
    assert merges == _python_bpe_batched(TEXTS, 6, 6)
    assert len(merges) == 6


def test_arrow_encoder_matches_plan_literal(spark):
    """The production Arrow encoder and the plan-literal replace chain
    implement one semantics: identical counts on every doc."""
    from pii_extract_base_spark.operators.bpe import (
        bpe_encode_count, bpe_encode_count_arrow)
    # 'aaaa'/'banana'/'ababab' contain ADJACENT occurrences of a merged
    # pair — the inputs where the consumed-boundary-space rule bites
    # (r4 ADVICE: the old encode_word merged both and diverged)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            TEXTS + ["", None, "zzz zzz",
                     "aaaa banana ababab", "aaa aaaa aaaaa aaaaaa"])],
        "doc_id long, text string")
    merges = bpe_train(df, "text", rounds=6)
    lit = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode_count(df, merges).collect()}
    arrow = {r["doc_id"]: r["n_bpe_tokens"]
             for r in bpe_encode_count_arrow(df, merges).collect()}
    assert arrow == lit


def test_arrow_array_encoder_matches_count_path(spark):
    """bpe_encode_arrow (token ARRAYS) is consistent with the counting
    path on every doc — size(tokens) == n_bpe_tokens — and the arrays
    are exactly the per-word encode_word streams concatenated in word
    order (NULL/empty text → empty array)."""
    from pii_extract_base_spark.operators.bpe import (
        bpe_encode_arrow, bpe_encode_count_arrow, encode_word,
        _merge_pairs)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            TEXTS + ["", None, "aaaa banana ababab",
                     "aaa aaaa aaaaa aaaaaa"])],
        "doc_id long, text string")
    merges = bpe_train(df, "text", rounds=6)
    pairs = _merge_pairs(merges)
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_encode_count_arrow(df, merges).collect()}
    arrays = {r["doc_id"]: r["bpe_tokens"]
              for r in bpe_encode_arrow(df, merges).collect()}
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    assert set(arrays) == set(counts)
    for i, toks in arrays.items():
        assert len(toks) == counts[i]
        want = []
        for w in (texts[i] or "").split():
            want.extend(encode_word(w, pairs))
        assert toks == want


def test_encode_word_sequential_semantics():
    """Merges apply in rank order, one left-to-right pass each — a
    later merge creating an earlier pair must NOT re-trigger it (the
    GPT-2 iterate-lowest-rank loop would: this pins the difference).
    Within one pass, the replace-chain's boundary space is CONSUMED by
    a merge, so adjacent occurrences of the same pair cannot both
    merge in that pass (" a a a a " → " aa a a ", not " aa aa ")."""
    from pii_extract_base_spark.operators.bpe import encode_word
    # rank 1: ('ab','c') — not present until rank 2 runs; rank 2: (a,b)
    assert encode_word("abc", [("ab", "c"), ("a", "b")]) == ["ab", "c"]
    # consumed boundary space: adjacent occurrences don't both merge
    assert encode_word("aaaa", [("a", "a")]) == ["aa", "a", "a"]
    assert encode_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert encode_word("banana", [("a", "n")]) == ["b", "an", "a", "n",
                                                   "a"]
    # ...but a match 3+ symbols after a merge IS reachable again
    assert encode_word("ababab", [("a", "b")]) == ["ab", "a", "b", "ab"]
    # and a LATER rank re-scans fresh: (a,a) again picks up the
    # leftover 'a a' that the consumed space blocked in pass 1
    assert encode_word("aaaa", [("a", "a"), ("a", "a")]) == ["aa", "aa"]
    assert encode_word("aaaa", [("a", "a"), ("aa", "a")]) == ["aaa", "a"]


def test_thousand_merges_fast_and_plan_size_independent(spark):
    """A 1k-merge fit finishes in seconds (batched rounds: ~1 Spark
    job per 128 merges) and the Arrow encoder's plan does not grow
    with the merge count."""
    import io
    import random
    import time
    from contextlib import redirect_stdout
    from pii_extract_base_spark.operators.bpe import (
        bpe_encode_count_arrow, bpe_train_batched)
    rng = random.Random(7)
    words = ["".join(rng.choice("abcdefghij") for _ in range(12))
             for _ in range(3000)]
    texts = [" ".join(rng.choices(words, k=40)) for _ in range(200)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    t0 = time.time()
    merges = bpe_train_batched(df, "text", num_merges=1000, batch=128,
                               min_count=1)
    fit_sec = time.time() - t0
    assert len(merges) == 1000
    # seconds, not minutes; margin sized for a fully-contended box
    # (45 s idle, ~150 s sharing 32 cores with a concurrent suite)
    assert fit_sec < 240

    def plan_len(n):
        buf = io.StringIO()
        with redirect_stdout(buf):
            bpe_encode_count_arrow(df, merges[:n]).explain("formatted")
        return len(buf.getvalue())
    small, big = plan_len(5), plan_len(1000)
    assert big < small * 1.5        # plan size independent of merges

    t0 = time.time()
    total = (bpe_encode_count_arrow(df, merges)
             .agg({"n_bpe_tokens": "sum"}).collect()[0][0])
    enc_sec = time.time() - t0
    assert total > 0 and enc_sec < 60
