#!/usr/bin/env python
"""Local emulation of the driver's correctness gate.

For every entry in __spark_entry__.queries(), runs the Spark DataFrame and
(when present) the DuckDB oracle SQL on the same parquet tables, then
compares row count, column-name set, and a value hash computed over
column-name-sorted, row-sorted output.  Mirrors the driver semantics
described in the round brief (columns sorted by name before hashing).

Usage: python scripts/check_correctness.py [sf_dir] [only_substr...]
(default sf0.01; extra args filter query names by substring)
"""

import hashlib
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style tolerant float folding
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import duckdb
    import __spark_entry__ as mod
    from pii_extract_base_spark.config import get_spark

    spark = get_spark(app_name="correctness", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries, oracles = mod.queries(), mod.oracle_sql()
    if ONLY:
        queries = {k: v for k, v in queries.items()
                   if any(s in k for s in ONLY)}
    results, n_fail = {}, 0
    for name, fn in queries.items():
        try:
            df = fn(spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            n_fail += 1
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(s_rows)}
            continue
        try:
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            err = str(e)
            if "Out of Memory" in err or "bad allocation" in err:
                # memory accumulated across 90+ oracle replays in one
                # process (seen once on the q53 recursive closure):
                # retry on a FRESH connection before declaring failure
                con.close()
                con = duckdb.connect()
                for t in TABLES:
                    p = f"{SF_DIR}/{t}.parquet"
                    if Path(p).exists():
                        con.execute(f"CREATE VIEW {t} AS SELECT * "
                                    f"FROM read_parquet('{p}')")
                try:
                    cur = con.execute(oracles[name])
                    o_cols = [d[0] for d in cur.description]
                    o_rows = cur.fetchall()
                except Exception as e2:  # noqa: BLE001
                    results[name] = {"status": "ORACLE_ERROR",
                                     "error": str(e2)[:300]}
                    n_fail += 1
                    continue
            else:
                results[name] = {"status": "ORACLE_ERROR",
                                 "error": err[:300]}
                n_fail += 1
                continue
        schema_ok = sorted(s_cols) == sorted(o_cols)
        count_ok = len(s_rows) == len(o_rows)
        hash_ok = (schema_ok and count_ok and
                   value_hash(s_cols, s_rows) == value_hash(o_cols, o_rows))
        status = "OK" if (schema_ok and count_ok and hash_ok) else "MISMATCH"
        if status != "OK":
            n_fail += 1
        results[name] = {
            "status": status, "rows": len(s_rows), "oracle_rows": len(o_rows),
            "schema_ok": schema_ok, "count_ok": count_ok, "hash_ok": hash_ok,
        }
        if status == "MISMATCH" and schema_ok and count_ok:
            # show first differing row for debugging
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            oorder = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            sl = sorted("|".join(_norm(r[i]) for i in order) for r in s_rows)
            ol = sorted("|".join(_norm(r[i]) for i in oorder) for r in o_rows)
            for a, b in zip(sl, ol):
                if a != b:
                    results[name]["first_diff"] = {"spark": a[:200],
                                                   "oracle": b[:200]}
                    break

    print(json.dumps(results, indent=1))
    print(f"\n{len(queries) - n_fail}/{len(queries)} pass", file=sys.stderr)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
