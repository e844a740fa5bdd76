"""URL canonicalization — the key-normalization step in front of
crawl-level URL dedup (two fetches of the same page routinely differ
only in tracking params, casing, default ports, fragments, or a
trailing slash).

Pure split-extract-reassemble over native regexp expressions — no
UDF, no backreference replacements (Java regex spells them ``$1``,
RE2 spells them ``\\1``; avoiding them keeps the Spark chain and the
DuckDB rendering literally the same patterns).

Canonical form:
  * scheme and host lowercased (path/query case is preserved —
    it is significant on most servers)
  * default ports dropped (``:80`` for http, ``:443`` for https)
  * fragment dropped
  * tracking query params dropped (``utm_*``, gclid, fbclid,
    msclkid, mc_eid, ref) — the query is '&'-prefixed first so every
    pair is uniformly ``&k=v``, then surviving pairs are re-prefixed
    with ``?``; param ORDER is preserved (sorting params can change
    semantics on some endpoints, so it is out of scope here)
  * trailing slashes stripped from the path (``/a/`` == ``/a``;
    a bare ``/`` collapses to the empty path)

Non-absolute inputs (no ``scheme://``) are passed through unchanged.
"""

from pyspark.sql import Column, functions as F

# tracking params dropped during canonicalization (one alternation,
# shared by both renderings)
TRACKING = "utm_[a-zA-Z0-9_]+|gclid|fbclid|msclkid|mc_eid|ref"

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+[^?#]*\?([^#]*)"
_TRACK_PAIR = f"&({TRACKING})=[^&]*"


def canonicalize_url(col: Column) -> Column:
    scheme = F.lower(F.regexp_extract(col, _SCHEME, 1))
    host = F.lower(F.regexp_extract(col, _HOST, 1))
    host = (F.when(scheme == "http",
                   F.regexp_replace(host, ":80$", ""))
             .when(scheme == "https",
                   F.regexp_replace(host, ":443$", ""))
             .otherwise(host))
    path = F.regexp_replace(
        F.regexp_extract(col, _PATH, 1), "/+$", "")
    q = F.regexp_replace(F.concat(F.lit("&"),
                                  F.regexp_extract(col, _QUERY, 1)),
                         _TRACK_PAIR, "")
    q = F.regexp_replace(q, "^&", "")
    canon = F.concat(scheme, F.lit("://"), host, path,
                     F.when(q == "", F.lit(""))
                      .otherwise(F.concat(F.lit("?"), q)))
    return F.when(scheme == "", col).otherwise(canon)


def canonicalize_url_sql(expr: str) -> str:
    """The SAME chain as DuckDB SQL (identical pattern strings)."""
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME}', 1))"
    host = f"lower(regexp_extract({expr}, '{_HOST}', 1))"
    host = (f"(CASE WHEN {scheme} = 'http' THEN "
            f"regexp_replace({host}, ':80$', '') "
            f"WHEN {scheme} = 'https' THEN "
            f"regexp_replace({host}, ':443$', '') "
            f"ELSE {host} END)")
    path = (f"regexp_replace(regexp_extract({expr}, '{_PATH}', 1), "
            f"'/+$', '')")
    q = (f"regexp_replace('&' || regexp_extract({expr}, '{_QUERY}', 1), "
         f"'{_TRACK_PAIR}', '', 'g')")
    q = f"regexp_replace({q}, '^&', '')"
    canon = (f"{scheme} || '://' || {host} || {path} || "
             f"(CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)")
    return f"(CASE WHEN {scheme} = '' THEN {expr} ELSE {canon} END)"
