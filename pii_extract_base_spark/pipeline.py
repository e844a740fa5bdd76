"""QualityPipeline — the full web-text quality flow (BASELINE.json
north_rule): language ID → perplexity → heuristic rules → PII/toxicity
detect + scrub → keep/drop, as one declarative DataFrame plan.

Physical shape (SURVEY.md §3.4):

  scan (parquet/Iceberg; prune lang partitions when present)
    → repartition(N, salted url hash)          # skew mitigation (N9)
    → score struct   [Arrow UDF #1: fused langid+ppl, text only]
    → rules struct   [native SQL — stays in WholeStageCodegen]
    → detect struct  [Arrow UDF #2: detect+context+scrub, text/lang/url]
    → keep + reasons [native SQL]

Exactly two Python crossings per row, each shipping only the columns it
needs. Everything else is Catalyst's problem — and it solves it
(predicate pushdown, column pruning; see tests/test_explain_plan.py).
"""

from typing import Iterable, Optional

from pyspark.sql import DataFrame, functions as F

from .functions.quality import rules_struct_column
from .functions.decision import decision_columns
from .functions.scrubnative import scrub_expr
from .operators.detect import make_detect_udf
from .operators.score import make_score_udf
from .partitioning import salted_repartition

DEFAULT_LANGUAGES = ("en", "es", "fr", "de")

OUTPUT_COLUMNS = [
    "url", "warc_ts", "lang", "text", "lang_pred", "lang_conf", "logppl",
    "rules", "entities", "n_entities", "scrubbed_text", "keep", "reasons",
]


class QualityPipeline:
    """Configure once on the driver; apply to any pages DataFrame.

    `fused=True` (default) runs langid+ppl+detect+scrub as ONE Arrow
    crossing (see operators/detect.make_fused_udf): the JVM-side
    row↔Arrow conversion around each ArrowEvalPython stage dominates
    once the Python kernels are vectorized, so one crossing beats two.
    `fused=False` keeps the two-stage plan (score pass, then detect
    pass) — useful when only scores are needed downstream.
    """

    def __init__(self, languages: Iterable[str] = DEFAULT_LANGUAGES,
                 config_json: Optional[str] = None,
                 salt_partitions: Optional[int] = None,
                 fused: bool = True,
                 from_html: bool = False):
        self.languages = tuple(languages)
        self.config_json = config_json
        self.salt_partitions = salt_partitions
        self.fused = fused
        self.from_html = from_html
        if fused:
            from .operators.detect import make_fused_udf
            self._fused_udf = make_fused_udf(self.languages, config_json)
        else:
            self._score_udf = make_score_udf()
            self._detect_udf = make_detect_udf(self.languages, config_json)

    def __call__(self, pages: DataFrame) -> DataFrame:
        df = pages
        if self.from_html:
            # shared ingestion backfill (functions/htmlextract —
            # codegen, no UDF; NULL-text rows only, see its docstring)
            from .functions.htmlextract import backfill_text_from_html
            df = backfill_text_from_html(df)
        if self.salt_partitions:
            df = salted_repartition(df, "url", self.salt_partitions)

        if self.fused:
            sd = self._fused_udf(F.col("text"), F.col("lang"), F.col("url"))
            df = df.withColumn("sd", sd)
            score = F.col("sd")
            detect = F.col("sd")
        else:
            df = df.withColumn("score", self._score_udf(F.col("text")))
            df = df.withColumn(
                "detect",
                self._detect_udf(F.col("text"), F.col("lang"),
                                 F.col("url")))
            score = F.col("score")
            detect = F.col("detect")
        df = df.withColumn("rules", rules_struct_column("text", "lang"))

        score_name = "sd" if self.fused else "score"
        keep, reasons = decision_columns("rules", "lang", score_name)
        df = (df
              .withColumn("keep", keep)
              .withColumn("reasons", reasons)
              .select(
                  "url", "warc_ts", "lang", "text",
                  score.getField("lang_pred").alias("lang_pred"),
                  score.getField("lang_conf").alias("lang_conf"),
                  score.getField("logppl").alias("logppl"),
                  "rules",
                  detect.getField("entities").alias("entities"),
                  detect.getField("n_entities").alias("n_entities"),
                  # fused path: scrub natively from the spans so the
                  # full text never crosses Arrow twice (scrubnative);
                  # non-fused path keeps the UDF's Python scrub
                  (scrub_expr(F.col("text"),
                              detect.getField("entities"))
                   if self.fused
                   else detect.getField("scrubbed_text"))
                  .alias("scrubbed_text"),
                  "keep", "reasons",
              ))
        return df

    def kept(self, pages: DataFrame) -> DataFrame:
        return self(pages).where(F.col("keep"))

    def entities(self, pages: DataFrame) -> DataFrame:
        """Exploded PiiCollection replay (FIXTURES.md §3.1)."""
        out = self(pages)
        e = F.explode("entities").alias("e")
        return (out.select("url", e)
                .select("url", "e.type", "e.subtype", "e.value", "e.start",
                        "e.end", "e.lang", "e.country", "e.detector",
                        "e.method", "e.stage"))
