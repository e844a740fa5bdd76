"""Constants (parity: reference defs.py:1-13; values must match the
reference by definition — piisa/pii-extract-base, Apache-2.0)."""

# Language-independent tasks (reference defs.py:2)
LANG_ANY = "any"

# Country-independent tasks (reference defs.py:5)
COUNTRY_ANY = "any"

# Format indicators for configuration files (reference defs.py:8-10)
FMT_CONFIG_PLUGIN = "pii-extract:plugins:v1"
FMT_CONFIG_TASKS = "pii-extract:tasks:v1"
FMT_CONFIG_TASKCFG = "pii-extract:task-config:v1"

# Stage name for the PII entity "process" field (reference defs.py:13)
STAGE = "detection"

# Collection serialization format tag
# (reference test/data/collection-example.json "format")
FMT_COLLECTION = "piisa:pii-collection:v1"
