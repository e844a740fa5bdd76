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


def shingles(text_col: str = "text", k: int = 5) -> Column:
    """Distinct k-word shingles of the text (the MinHash input set)."""
    w = words_col(text_col)
    n = F.size(w)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(F.sequence(F.lit(0), n - k),
                        lambda i: F.array_join(F.slice(w, i + 1, k), " ")))
    ).otherwise(F.array().cast("array<string>"))


def shingle_count(text_col: str = "text", k: int = 5) -> Column:
    return F.size(shingles(text_col, k))


def rolling_fingerprint(text_col: str = "text",
                        base: int = 131, mod: int = 1_000_000_007) -> Column:
    """Rabin–Karp polynomial rolling hash over the document's
    codepoints: H = fold(c -> (H*base + c) mod mod). Native SQL
    (`aggregate` over a codepoint array, inside WholeStageCodegen) and
    engine-portable — DuckDB replays it exactly via list_reduce (the
    synthetic corpus is ASCII; both engines agree on codepoints).
    Unlike md5, prefix hashes of the same polynomial support O(1)
    rolling window comparisons for chunk-level dedup."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    codes = F.transform(F.sequence(F.lit(1), F.length(t)),
                        lambda i: F.ascii(F.substring(t, i, F.lit(1))))
    h = F.aggregate(codes, F.lit(0).cast("long"),
                    lambda acc, c: (acc * base + c) % mod)
    return F.when(F.length(t) > 0, h).otherwise(F.lit(0).cast("long"))
