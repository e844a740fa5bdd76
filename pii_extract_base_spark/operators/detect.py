"""PII/toxicity detect + scrub stage (north-star N4/N5/N6).

`process_page` is a pure function — the per-row contract, mirroring the
reference's raw-chunk API (detect_chunk, reference api/processor.py:215-258,
SURVEY.md §3.3). The Spark stage wraps it in an Arrow pandas UDF; the
oracle calls it directly. Byte-identical scrubbed text between engine and
oracle holds by construction.

The detector registry is NOT broadcast as pickled objects: executors
rebuild it once per (languages, config) via a module-level cache —
equivalent to the reference's build-once memoization
(gather/collection/task_collection.py:173-182) hoisted to executor scope,
and immune to regex-pickling issues.
"""

import json
from typing import Dict, List, Optional, Tuple

from ..kernel.model import PiiCollectionBuilder
from ..kernel.task import DocumentChunk
from ..kernel.processor import PiiProcessor
from ..kernel.scrub import scrub_text
from ..registry.factory import make_processor

# entity fields exposed in the exploded Spark schema (FIXTURES.md §3.1)
ENTITY_FIELDS = ("type", "subtype", "value", "start", "end", "lang",
                 "country", "detector", "method", "stage")

ENTITY_STRUCT = ("struct<type:string,subtype:string,value:string,"
                 "start:long,end:long,lang:string,country:string,"
                 "detector:int,method:string,stage:string>")

DETECT_RESULT_SCHEMA = (f"struct<entities:array<{ENTITY_STRUCT}>,"
                        f"scrubbed_text:string,n_entities:int>")

_PROC_CACHE: Dict[tuple, PiiProcessor] = {}


def get_processor(languages: Tuple[str, ...],
                  config_json: Optional[str] = None) -> PiiProcessor:
    """Executor-side memoized processor factory (one build per worker)."""
    key = (tuple(languages), config_json)
    proc = _PROC_CACHE.get(key)
    if proc is None:
        config = json.loads(config_json) if config_json else None
        proc = make_processor(languages, config=config)
        _PROC_CACHE[key] = proc
    return proc


def process_page(proc: PiiProcessor, text: str, lang: str,
                 url: str) -> Tuple[List[Dict], str]:
    """Detect entities on one page and scrub them. Returns
    (entity dicts with ENTITY_FIELDS, scrubbed text)."""
    text = text or ""
    chunk = DocumentChunk(id="0", data=text)
    piic = PiiCollectionBuilder(lang=lang, docid=url)
    proc.detect_chunk(chunk, piic, default_lang=lang)

    ents = []
    for p in piic:
        d = p.asdict()
        det = piic.get_detector(d["detector"])
        ents.append({
            "type": d["type"],
            "subtype": d.get("subtype"),
            "value": d["value"],
            "start": d["start"],
            "end": d["end"],
            "lang": d.get("lang"),
            "country": d.get("country"),
            "detector": d["detector"],
            "method": det.method,
            "stage": d.get("process", {}).get("stage"),
        })

    spans = [(e["start"], e["end"], e["type"]) for e in ents]
    return ents, scrub_text(text, spans)


def detect_batch(texts, langs, urls, languages: Tuple[str, ...],
                 config_json: Optional[str] = None):
    """Batch kernel: list-of-rows → (entities, scrubbed, counts)."""
    proc = get_processor(languages, config_json)
    all_ents, scrubbed, counts = [], [], []
    for text, lang, url in zip(texts, langs, urls):
        ents, sc = process_page(proc, text, lang, url)
        all_ents.append(ents)
        scrubbed.append(sc)
        counts.append(len(ents))
    return all_ents, scrubbed, counts


def make_detect_udf(languages: Tuple[str, ...],
                    config_json: Optional[str] = None):
    """Arrow pandas UDF (Series×3 → struct). Only (text, lang, url) cross
    the JVM↔Python boundary — Catalyst prunes every other column out of
    the Arrow transfer."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    langs_t = tuple(languages)

    @pandas_udf(DETECT_RESULT_SCHEMA)
    def detect_udf(text: pd.Series, lang: pd.Series,
                   url: pd.Series) -> pd.DataFrame:
        ents, scrubbed, counts = detect_batch(
            text.tolist(), lang.tolist(), url.tolist(), langs_t, config_json)
        return pd.DataFrame({
            "entities": ents,
            "scrubbed_text": scrubbed,
            "n_entities": counts,
        })

    return detect_udf


FUSED_RESULT_SCHEMA = (
    "struct<lang_pred:string,lang_conf:double,logppl:double,"
    f"entities:array<{ENTITY_STRUCT}>,scrubbed_text:string,"
    "n_entities:int>")


def make_fused_udf(languages: Tuple[str, ...],
                   config_json: Optional[str] = None):
    """Score + detect in ONE Arrow crossing.

    The JVM-side row<->Arrow conversion around each ArrowEvalPython
    stage costs more than the Python kernels themselves once those are
    vectorized (measured: the JVM burned ~14 cores feeding two chained
    UDF stages while python workers sat ~15% busy). Shipping `text`
    once and returning one combined struct halves that conversion
    work; langid+perplexity still share their single n-gram pass, and
    the native rules stage stays outside, visible to Catalyst.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.scoring import score_batch

    langs_t = tuple(languages)

    @pandas_udf(FUSED_RESULT_SCHEMA)
    def fused_udf(text: pd.Series, lang: pd.Series,
                  url: pd.Series) -> pd.DataFrame:
        texts = text.tolist()
        preds, confs, ppls = score_batch(texts)
        ents, scrubbed, counts = detect_batch(
            texts, lang.tolist(), url.tolist(), langs_t, config_json)
        return pd.DataFrame({
            "lang_pred": preds, "lang_conf": confs, "logppl": ppls,
            "entities": ents, "scrubbed_text": scrubbed,
            "n_entities": counts,
        })

    return fused_udf
