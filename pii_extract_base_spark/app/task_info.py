"""``pii-task-info`` console app: list plugins / languages / tasks
(reference app/task_info.py). Run as
``python -m pii_extract_base_spark.app.task_info list-tasks --lang en``."""

import argparse
import sys
from typing import List, TextIO

from .. import __version__
from ..api import build_file_processor, print_tasks
from ..registry.config_loader import load_module_config
from ..registry.plugin_source import PluginTaskSource


def print_plugins(args: argparse.Namespace, out: TextIO) -> None:
    config = load_module_config(args.config)
    ptc = PluginTaskSource(config=config, debug=args.debug)
    print(". Installed plugins", file=out)
    for plugin in ptc.list_plugins():
        print(f"\n Name: {plugin['name']}", file=out)
        print(f" Source: {plugin['source']}\n Version: {plugin['version']}",
              file=out)
        if plugin.get("description"):
            print(f" Description: {plugin['description']}", file=out)


def _processor(args: argparse.Namespace):
    config = load_module_config(args.config)
    return build_file_processor(config, skip_plugins=args.skip_plugins,
                                languages=args.lang
                                if getattr(args, "lang", None) else None,
                                debug=args.debug)


def print_languages(args: argparse.Namespace, out: TextIO) -> None:
    proc = _processor(args)
    print(". Defined languages", file=out)
    for lang in proc.language_list():
        print(f"  {lang}", file=out)


def task_info(args: argparse.Namespace, out: TextIO) -> None:
    proc = _processor(args)
    for lang in args.lang or [None]:
        proc.build_tasks(lang, args.country, pii=args.tasks,
                         add_any=not args.strict)
    print_tasks(args.lang or [], proc, out)


def parse_args(args: List[str]) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description=f"Show information about usable PII tasks "
                    f"(version {__version__})")

    com1 = argparse.ArgumentParser(add_help=False)
    g1 = com1.add_argument_group("Source loading options")
    g1.add_argument("--config", nargs="+",
                    help="PIISA configuration file(s) to load")
    g1.add_argument("--skip-plugins", action="store_true",
                    help="do not load detector plugins")

    com2 = argparse.ArgumentParser(add_help=False)
    g2 = com2.add_argument_group("Task selection options")
    g2.add_argument("--lang", nargs="+", help="language(s) to select")
    g2.add_argument("--country", nargs="+", help="countries to select")
    g2.add_argument("--tasks", nargs="+", help="pii types to select")
    g2.add_argument("--strict", action="store_true",
                    help="include only tasks that comply strictly with "
                         "selection (no any-language tasks)")

    com3 = argparse.ArgumentParser(add_help=False)
    g3 = com3.add_argument_group("Other")
    g3.add_argument("--debug", action="store_true", help="debug mode")

    subp = parser.add_subparsers(help="command", dest="cmd", required=True)
    subp.add_parser("list-plugins", parents=[com1, com3],
                    help="List all installed pii-extract plugins")
    subp.add_parser("list-languages", parents=[com1, com3],
                    help="List all languages defined in tasks")
    subp.add_parser("list-tasks", parents=[com1, com2, com3],
                    help="List available detection tasks")

    return parser.parse_args(args)


def main(args: List[str] = None) -> None:
    if args is None:
        args = sys.argv[1:]
    nargs = parse_args(args)
    if nargs.cmd == "list-plugins":
        print_plugins(nargs, sys.stdout)
    elif nargs.cmd == "list-languages":
        print_languages(nargs, sys.stdout)
    else:
        task_info(nargs, sys.stdout)


if __name__ == "__main__":
    main()
