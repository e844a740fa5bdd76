"""``pii-detect`` console app: detect PII in a source-document file
(reference app/detect.py:14-61). Run as
``python -m pii_extract_base_spark.app.detect in.yaml out.json --lang en``."""

import argparse
import sys
from typing import List

from .. import __version__
from ..api import process_file


def parse_args(args: List[str]) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description=f"Perform PII detection on a document "
                    f"(version {__version__})")

    g0 = parser.add_argument_group("Input/output paths")
    g0.add_argument("infile", help="source document")
    g0.add_argument("outfile", help="destination file")

    g1 = parser.add_argument_group("Language specification")
    g1.add_argument("--lang", help="set document language")
    g1.add_argument("--country", nargs="+", help="countries to use")

    g2 = parser.add_argument_group("Task specification")
    g2.add_argument("--configfile", "--config", nargs="+",
                    help="add custom configuration (plugins, additional "
                         "pii tasks, or task configs)")
    g2.add_argument("--skip-plugins", action="store_true",
                    help="do not load detector plugins (nor the builtin "
                         "registry)")
    g2.add_argument("--tasks", nargs="+", metavar="TASK_TYPE",
                    help="limit the set of pii tasks to include")

    g3 = parser.add_argument_group("Processing options")
    g3.add_argument("--chunk-context", action="store_true",
                    help="when iterating over the document, add chunk "
                         "contexts")

    g4 = parser.add_argument_group("Other")
    g4.add_argument("--show-stats", action="store_true",
                    help="show statistics")
    g4.add_argument("--show-tasks", action="store_true",
                    help="show defined tasks")
    g4.add_argument("--debug", action="store_true", help="debug mode")
    g4.add_argument("--reraise", action="store_true",
                    help="re-raise exceptions on errors")

    return parser.parse_args(args)


def main(args: List[str] = None) -> None:
    if args is None:
        args = sys.argv[1:]
    nargs = parse_args(args)
    argdict = vars(nargs)
    reraise = argdict.pop("reraise")
    try:
        process_file(argdict.pop("infile"), argdict.pop("outfile"), **argdict)
    except Exception as e:   # noqa: BLE001 — CLI boundary
        print(f"Error: {e}", file=sys.stderr)
        if reraise:
            raise
        sys.exit(1)


if __name__ == "__main__":
    main()
