"""``pii-detect`` console app: detect PII in a source-document file.

Flag surface matches the reference CLI (app/detect.py:14-45) so
existing invocations port unchanged; run as
``python -m pii_extract_base_spark.app.detect in.yaml out.json --lang en``.
"""

import argparse
import sys
from typing import List

from .. import __version__
from ..api import process_file

# (group, flags, kwargs) — declarative option table
_OPTIONS = [
    ("Input/output paths", ["infile"], {"help": "source document"}),
    ("Input/output paths", ["outfile"], {"help": "destination file"}),
    ("Language specification", ["--lang"],
     {"help": "set document language"}),
    ("Language specification", ["--country"],
     {"nargs": "+", "help": "countries to use"}),
    ("Task specification", ["--configfile", "--config"],
     {"nargs": "+", "help": "add custom configuration (plugins, "
                            "additional pii tasks, or task configs)"}),
    ("Task specification", ["--skip-plugins"],
     {"action": "store_true",
      "help": "do not load detector plugins (nor the builtin registry)"}),
    ("Task specification", ["--tasks"],
     {"nargs": "+", "metavar": "TASK_TYPE",
      "help": "limit the set of pii tasks to include"}),
    ("Processing options", ["--chunk-context"],
     {"action": "store_true",
      "help": "when iterating over the document, add chunk contexts"}),
    ("Other", ["--show-stats"],
     {"action": "store_true", "help": "show statistics"}),
    ("Other", ["--show-tasks"],
     {"action": "store_true", "help": "show defined tasks"}),
    ("Other", ["--debug"], {"action": "store_true", "help": "debug mode"}),
    ("Other", ["--reraise"],
     {"action": "store_true", "help": "re-raise exceptions on errors"}),
]


def parse_args(args: List[str]) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description=f"Perform PII detection on a document "
                    f"(version {__version__})")
    groups = {}
    for gname, flags, kwargs in _OPTIONS:
        if gname not in groups:
            groups[gname] = parser.add_argument_group(gname)
        groups[gname].add_argument(*flags, **kwargs)
    return parser.parse_args(args)


def main(args: List[str] = None) -> None:
    argdict = vars(parse_args(sys.argv[1:] if args is None else args))
    reraise = argdict.pop("reraise")
    infile, outfile = argdict.pop("infile"), argdict.pop("outfile")
    try:
        process_file(infile, outfile, **argdict)
    except Exception as e:   # noqa: BLE001 — CLI boundary
        print(f"Error: {e}", file=sys.stderr)
        if reraise:
            raise
        sys.exit(1)


if __name__ == "__main__":
    main()
