"""Pure-Python kernel replaying piisa/pii-extract-base semantics.

This package is BOTH the correctness oracle for tests AND the
executor-side kernel imported inside the Spark Arrow/pandas UDFs —
byte-identical output between "oracle" and "engine" is achieved by
construction (same code path, per BASELINE.md).

It has zero Spark / pii-data dependencies so it can be shipped with
``spark-submit --py-files`` and imported on executors cheaply.

Reference parity map (reference = /root/reference/src/pii_extract):
  defs.py        <- defs.py
  normalizer.py  <- helper/normalizer.py
  context.py     <- helper/context.py
  model.py       <- pii-data types as observed through usage +
                    api/processor.py:65-101 (PiiCollectionBuilder)
  task.py        <- build/task/{base,regex,callable,multi}.py
  parser.py      <- gather/parser/parser.py,
                    gather/collection/sources/utils.py
  collection.py  <- gather/collection/task_collection.py, build/build.py
  processor.py   <- api/processor.py
  scrub.py       <- new (north-star stage N6, BASELINE.json)
"""

from .defs import LANG_ANY, COUNTRY_ANY, STAGE
from .exceptions import InvArgException, BuildException, InvPiiTask, ProcException
from .model import (
    PiiEnum,
    PiiEntityInfo,
    PiiEntity,
    PiiTaskInfo,
    PiiDetector,
    PiiCollectionBuilder,
)
from .normalizer import normalize
from .context import context_spec, context_check, DEFAULT_CONTEXT_WIDTH
from .task import BasePiiTask, RegexPiiTask, CallablePiiTask, BaseMultiPiiTask
from .parser import normalize_rawtaskd, RawTaskDefaults, parse_task_descriptor
from .collection import PiiTaskCollection, build_task, is_pii_class
from .processor import PiiProcessor
from .scrub import resolve_spans, scrub_text

__all__ = [
    "LANG_ANY", "COUNTRY_ANY", "STAGE",
    "InvArgException", "BuildException", "InvPiiTask", "ProcException",
    "PiiEnum", "PiiEntityInfo", "PiiEntity", "PiiTaskInfo", "PiiDetector",
    "PiiCollectionBuilder",
    "normalize", "context_spec", "context_check", "DEFAULT_CONTEXT_WIDTH",
    "BasePiiTask", "RegexPiiTask", "CallablePiiTask", "BaseMultiPiiTask",
    "normalize_rawtaskd", "RawTaskDefaults", "parse_task_descriptor",
    "PiiTaskCollection", "build_task", "is_pii_class",
    "PiiProcessor",
    "resolve_spans", "scrub_text",
]
