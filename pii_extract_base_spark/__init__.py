"""pii-extract-base-spark: a PySpark-native web-text quality pipeline
subsuming piisa/pii-extract-base's PII detection semantics.

See SURVEY.md for the design blueprint and BASELINE.md for targets.
"""

__version__ = "0.1.0"
