"""Checkpointed, resumable table sink with per-partition lineage
(north-star stage N8).

Iceberg is the design target (hidden partitioning + snapshot commits);
its Spark runtime jars are absent in this sandbox (SURVEY.md preamble),
so the default backend is a parquet + JSON-manifest shim with the same
commit semantics:

 - work is split into logical partitions: part_id = pmod(xxhash64(url), P)
 - each partition is processed and written to  <table>/part_id=<k>/
 - a manifest line (partition id, input fingerprint, rows in/kept,
   per-type entity counts, wall ms, commit ts) is appended ATOMICALLY
   (write temp + rename) after the partition's files land
 - resume = skip every partition already in the manifest; a re-run
   after failure converges to exactly the same table with no duplicate
   partitions (tested in tests/test_checkpoint_resume.py)

At cluster scale the same loop runs wave-per-partition-group with the
part_id filter pushed into an Iceberg/parquet partition prune, so a
resume never rescans committed input.
"""

import json
import os
import shutil
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Set

from pyspark.sql import DataFrame, functions as F

MANIFEST = "_manifest.jsonl"
METRICS_SCHEMA = ("partition_id int, input_fingerprint string, rows_in long, "
                  "rows_kept long, entities map<string,long>, wall_ms long, "
                  "stage string, committed_at timestamp")


class CheckpointedSink:
    def __init__(self, table_path: str, n_partitions: int = 8,
                 stage: str = "quality_pipeline"):
        self.path = Path(table_path)
        self.n_partitions = n_partitions
        self.stage = stage
        self.path.mkdir(parents=True, exist_ok=True)

    # -- manifest ------------------------------------------------------------

    @property
    def _manifest_path(self) -> Path:
        return self.path / MANIFEST

    def committed_partitions(self) -> Set[int]:
        if not self._manifest_path.exists():
            return set()
        out = set()
        with open(self._manifest_path, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    out.add(json.loads(line)["partition_id"])
        return out

    def manifest_entries(self) -> List[Dict]:
        if not self._manifest_path.exists():
            return []
        with open(self._manifest_path, encoding="utf-8") as f:
            return [json.loads(l) for l in f if l.strip()]

    def _append_manifest(self, entry: Dict) -> None:
        """Atomic append: write full manifest to temp, rename over."""
        entries = self.manifest_entries()
        entries.append(entry)
        tmp = self._manifest_path.with_suffix(".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, self._manifest_path)

    # -- write ----------------------------------------------------------------

    def run(self, pages: DataFrame,
            transform: Callable[[DataFrame], DataFrame],
            key_col: str = "url",
            input_fingerprint: str = "",
            fail_after: Optional[int] = None,
            wave_size: int = 1) -> int:
        """Process + commit every uncommitted partition.

        :param transform: pages-DF → output-DF (must keep key_col and
            expose keep/entities columns for metrics)
        :param fail_after: simulate a crash after N partition commits
            (for resume tests)
        :param wave_size: partitions processed per Spark job. 1 = one
            input scan per partition (smallest commit granularity);
            W > 1 amortizes the scan across W partitions — at corpus
            scale the input is read ceil(N/W) times instead of N, while
            commit granularity (and hence redo-after-crash work) stays
            one WAVE. Against an Iceberg/hive-partitioned input the
            `_part_id IN (...)` filter prunes instead of rescanning.
        :return: number of partitions committed in THIS run
        """
        part = F.pmod(F.xxhash64(F.col(key_col)),
                      F.lit(self.n_partitions)).cast("int")
        pages = pages.withColumn("_part_id", part)
        done = self.committed_partitions()
        committed = 0

        todo = [k for k in range(self.n_partitions) if k not in done]
        waves = [todo[i:i + wave_size]
                 for i in range(0, len(todo), wave_size)]
        for wave in waves:
            t0 = time.time()
            subset = pages.where(F.col("_part_id").isin(wave))
            out = transform(subset.drop("_part_id"))
            # one pass writes every partition dir of the wave
            out_part = F.pmod(F.xxhash64(F.col(key_col)),
                              F.lit(self.n_partitions)).cast("int")
            (out.withColumn("part_id", out_part)
                .write.mode("overwrite")
                .partitionBy("part_id").parquet(str(self.path / "_wave_tmp")))
            wave_tmp = self.path / "_wave_tmp"

            # ONE aggregation job over the wave output computes every
            # per-partition metric (rows in/kept + entities by type) —
            # round 1 re-read each committed partition 3x (count,
            # where(keep).count, explode+collect = 3 jobs/partition).
            # Trick: each row emits one NULL marker element plus its
            # entity types; a single groupBy(part_id, etype) then holds
            # row counts (etype IS NULL) and entity counts (etype =
            # type) side by side.
            spark = out.sparkSession
            metrics = self._wave_metrics(spark, wave_tmp, out.columns)
            wall_ms = int((time.time() - t0) * 1000)

            for k in wave:
                src = wave_tmp / f"part_id={k}"
                dst = self.path / f"part_id={k}"
                if dst.exists():
                    shutil.rmtree(dst)
                if src.exists():
                    os.replace(src, dst)
                else:
                    # schema-bearing empty partition: read() stays
                    # uniform and never hits schema inference on an
                    # empty dir
                    (out.where(F.lit(False))
                        .write.mode("overwrite").parquet(str(dst)))

                m = metrics.get(k, {"rows_in": 0, "rows_kept": 0,
                                    "entities": {}})
                self._append_manifest({
                    "partition_id": k,
                    "input_fingerprint": input_fingerprint,
                    "rows_in": m["rows_in"],
                    "rows_kept": m["rows_kept"],
                    "entities": m["entities"],
                    "wall_ms": wall_ms // len(wave),
                    "stage": self.stage,
                    "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                })
                committed += 1
                if fail_after is not None and committed >= fail_after:
                    raise RuntimeError(
                        f"simulated failure after {committed} partitions")
        wave_tmp = self.path / "_wave_tmp"
        if wave_tmp.exists():
            shutil.rmtree(wave_tmp)
        return committed

    @staticmethod
    def _wave_metrics(spark, wave_tmp: Path, columns) -> Dict[int, Dict]:
        """Per-partition {rows_in, rows_kept, entities} from a single
        scan + single shuffle over the freshly written wave output."""
        try:
            written = spark.read.parquet(str(wave_tmp))
        except Exception:   # noqa: BLE001 — wave produced no rows at all
            return {}
        kept = (F.col("keep").cast("int") if "keep" in written.columns
                else F.lit(1))
        if "entities" in written.columns:
            etype = F.explode_outer(F.concat(
                F.array(F.lit(None).cast("string")),
                F.transform("entities", lambda e: e["type"]))).alias("etype")
        else:
            etype = F.lit(None).cast("string").alias("etype")
        rows = (written.select("part_id", kept.alias("k"), etype)
                       .groupBy("part_id", "etype")
                       .agg(F.count("*").alias("n"),
                            F.sum("k").alias("n_kept"))
                       .collect())
        out: Dict[int, Dict] = {}
        for r in rows:
            m = out.setdefault(int(r["part_id"]),
                               {"rows_in": 0, "rows_kept": 0, "entities": {}})
            if r["etype"] is None:          # the per-row marker element
                m["rows_in"] = r["n"]
                m["rows_kept"] = int(r["n_kept"] or 0)
            else:
                m["entities"][r["etype"]] = r["n"]
        return out

    # -- read ------------------------------------------------------------------

    def read(self, spark, as_of_commit: Optional[int] = None,
             as_of_ts: Optional[str] = None) -> DataFrame:
        """Read only COMMITTED partitions (uncommitted files invisible —
        the manifest is the source of truth, like an Iceberg snapshot).

        Time travel: each manifest append is a snapshot, and committed
        partition data is immutable (resume never rewrites a committed
        partition), so a PREFIX of the manifest is a consistent
        point-in-time view. ``as_of_commit=i`` reads the state after
        the i-th commit (0-based); ``as_of_ts`` reads the state as of
        an ISO timestamp (inclusive)."""
        entries = self.manifest_entries()
        if as_of_commit is not None:
            entries = entries[:as_of_commit + 1]
        if as_of_ts is not None:
            entries = [e for e in entries if e["committed_at"] <= as_of_ts]
        done = sorted({e["partition_id"] for e in entries})
        if not done:
            raise FileNotFoundError(
                f"no committed partitions in {self.path} for the "
                f"requested snapshot")
        paths = [str(self.path / f"part_id={k}") for k in done]
        return spark.read.parquet(*paths)

    def metrics(self, spark) -> DataFrame:
        """The _metrics lineage table (FIXTURES.md §3.3)."""
        entries = self.manifest_entries()
        rows = [(e["partition_id"], e["input_fingerprint"], e["rows_in"],
                 e["rows_kept"], e["entities"], e["wall_ms"], e["stage"],
                 e["committed_at"]) for e in entries]
        import datetime
        rows = [r[:-1] + (datetime.datetime.fromisoformat(r[-1]),)
                for r in rows]
        return spark.createDataFrame(rows, METRICS_SCHEMA)
