"""Built-in detector registry.

JSON-loadable task descriptors (same extension format as the reference's
``piisa:config:pii-extract:tasks:v1``, reference
test/data/tasklist-example.json), so user plugins keep working: any
config with a ``tasklist`` merges in through the same parser.
"""

from .detectors import builtin_tasklist, BUILTIN_SOURCE, BUILTIN_VERSION
from .factory import make_processor, registry_fingerprint

__all__ = ["builtin_tasklist", "make_processor", "registry_fingerprint",
           "BUILTIN_SOURCE", "BUILTIN_VERSION"]
