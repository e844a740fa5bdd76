"""Text-analysis column builders (training-data pipeline ops): token
stats, word shingles, document fingerprints. All native Spark SQL —
no UDFs, fully inside WholeStageCodegen."""

from pyspark.sql import Column, functions as F


def words_col(text_col: str = "text") -> Column:
    """Whitespace tokens, empty strings dropped (== Python str.split())."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return F.filter(F.split(t, r"\s+"), lambda w: w != "")


def token_count(text_col: str = "text") -> Column:
    return F.size(words_col(text_col))


def distinct_token_count(text_col: str = "text") -> Column:
    return F.size(F.array_distinct(words_col(text_col)))


def mean_word_len(text_col: str = "text") -> Column:
    w = words_col(text_col)
    n = F.size(w)
    return F.when(n > 0,
                  F.round(F.aggregate(w, F.lit(0).cast("double"),
                                      lambda a, x: a + F.length(x)) / n, 4)
                  ).otherwise(F.lit(0.0))


def fingerprint(text_col: str = "text") -> Column:
    """Exact-dup document fingerprint: md5 of the raw text (md5 chosen
    because Spark and DuckDB produce identical hex — cross-engine
    verifiable, unlike xxhash64)."""
    return F.md5(F.coalesce(F.col(text_col), F.lit("")))


def _joined_windows(w: Column, n: Column, k: int) -> Column:
    """All k-word windows of ``w`` as space-joined strings, built as a
    chain of k-1 LINEAR zip_withs over shifted slices.  NOT
    ``transform(sequence(...), i -> slice(w, i+1, k))``: an HOF lambda
    re-evaluates the word-array expression at every index access (no
    cross-iteration CSE), making that form O(words²) per document —
    measured at 8,500 executor-CPU-s on one 3.2M-doc stage before the
    same fix in functions/lmtrain.  Slices are HOF inputs, evaluated
    once per row; ``w`` is referenced k+1 times total (a constant),
    not once per window."""
    m = n - (k - 1)
    acc = F.slice(w, 1, m)
    for j in range(2, k + 1):
        acc = F.zip_with(acc, F.slice(w, j, m),
                         lambda x, y: F.concat(x, F.lit(" "), y))
    return acc


def shingles(text_col: str = "text", k: int = 5) -> Column:
    """Distinct k-word shingles of the text (the MinHash input set)."""
    w = words_col(text_col)
    n = F.size(w)
    return F.when(
        n >= k,
        F.array_distinct(_joined_windows(w, n, k))
    ).otherwise(F.array().cast("array<string>"))


def shingle_count(text_col: str = "text", k: int = 5) -> Column:
    return F.size(shingles(text_col, k))


def ngrams(text_col: str = "text", n: int = 2) -> Column:
    """ALL word n-grams in document order, duplicates KEPT (unlike
    `shingles`, which is the distinct set) — the input to repetition
    signals, where multiplicity is the whole point (Gopher's
    duplicate-n-gram fractions)."""
    w = words_col(text_col)
    sz = F.size(w)
    return F.when(
        sz >= n,
        _joined_windows(w, sz, n)
    ).otherwise(F.array().cast("array<string>"))


def rolling_fingerprint(text_col: str = "text",
                        base: int = 131, mod: int = 1_000_000_007,
                        chunk: int = 4096) -> Column:
    """Rabin–Karp polynomial rolling hash over the document's
    codepoints: H = fold(c -> (H*base + c) mod mod). Native SQL and
    engine-portable — DuckDB replays it exactly via list_reduce (the
    synthetic corpus is ASCII; both engines agree on codepoints).
    Unlike md5, prefix hashes of the same polynomial support O(1)
    rolling window comparisons for chunk-level dedup.

    Memory envelope: the fold is CHUNKED — an outer aggregate walks
    `chunk`-char substrings and only the current chunk's codepoint
    array is live (a flat per-codepoint array over a 1 MB document
    would materialize ~1M boxed one-char strings, ~50x the text bytes;
    this keeps peak extra memory at ~2x text bytes + one 4K int
    array regardless of document size)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chunks = F.ceil(F.length(t) / F.lit(chunk)).cast("int")
    pieces = F.when(
        F.length(t) > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1),
                    lambda j: F.substring(t, j * chunk + 1, F.lit(chunk)))
    ).otherwise(F.array().cast("array<string>"))
    # split-on-empty gives the chunk's per-char array in ONE pass;
    # the previous transform(sequence)+substring(piece, i, 1) form
    # seeks from the string head per index — O(chunk²) per chunk,
    # i.e. ~chunk/2 extra character scans PER CHARACTER of the
    # document (the HOF-lambda hazard class documented at
    # _joined_windows; a 1 MB page paid ~2×10⁹ char ops)
    h = F.aggregate(
        pieces, F.lit(0).cast("long"),
        lambda acc, piece: F.aggregate(
            F.split(piece, ""),
            acc, lambda a, c: (a * base + F.ascii(c)) % mod))
    return h
