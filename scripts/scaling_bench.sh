#!/usr/bin/env bash
# Two-parallelism scaling evidence (BASELINE.md): the north rule's
# N-vs-4N-executor criterion is evidenced in this single-node sandbox by
# running the IDENTICAL job at local[8] and local[32] on the same input
# and reporting throughput at both plus scaling efficiency
#   eff = (T8 / T32) / (32 / 8)  =  speedup / 4.
#
# Usage: scripts/scaling_bench.sh [sf_dir]   (default /root/testdata/sf0.1)
# Writes BENCH.md at the repo root and prints both JSON lines.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
export SPARK_GRAFT_SF_DIR="$SF_DIR"

echo "== local[8] ==" >&2
J8=$(SPARK_GRAFT_CPUS=8 python bench.py)
echo "$J8"

echo "== local[32] ==" >&2
J32=$(SPARK_GRAFT_CPUS=32 python bench.py)
echo "$J32"

python - "$J8" "$J32" "$SF_DIR" <<'EOF'
import json, sys
j8, j32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
sf_dir = sys.argv[3]
t8, t32 = j8["value"], j32["value"]
speedup = t8 / t32
eff = speedup / (32 / 8)
with open("BENCH.md", "w") as f:
    f.write(f"""# BENCH — measured throughput & scaling (single-node sandbox)

Job: full quality pipeline (langid -> perplexity -> Gopher rules ->
PII detect + scrub -> keep/drop) over {j32['docs']} synthetic
Common-Crawl-style pages amplified from `{sf_dir}/documents.parquet`
(multiplier {j32['multiplier']}); identical input both runs. `local[8]`
vs `local[32]` is the sandbox proxy for N vs 4N executors (no real
cluster available — per driver instruction).

| cores | wall (s) | docs/sec |
|---|---|---|
| 8 (N)   | {t8:.3f} | {j8['docs_per_sec']:.1f} |
| 32 (4N) | {t32:.3f} | {j32['docs_per_sec']:.1f} |

**speedup(8->32) = {speedup:.2f}x, scaling efficiency = {eff:.3f}**
(target >= 0.8 per BASELINE.json north_rule)

Per-query wall seconds at 32 cores (sf0.1 tables):

| query | sec |
|---|---|
""")
    for k, v in j32["queries"].items():
        f.write(f"| {k} | {v} |\n")
    f.write(f"""
Notes:
- Checkpoint sink: Iceberg jars absent in sandbox -> parquet+manifest
  shim with identical append/commit/resume semantics (see
  `pii_extract_base_spark/sinks/checkpoint.py`).
- AQE + Arrow enabled (`pii_extract_base_spark/config.py`); pipeline
  stages are two fused Arrow UDF passes + native-SQL rule vector, so
  per-doc work is embarrassingly parallel — scaling is bounded only by
  Python worker startup and the final shuffle-light aggregations.
""")
print(json.dumps({"t8": t8, "t32": t32, "speedup": round(speedup, 3),
                  "efficiency": round(eff, 3)}))
EOF
