#!/usr/bin/env bash
# Two-parallelism scaling evidence (BENCH.md): thin wrapper around the
# drift-robust paired harness — see scripts/scaling_bench.py for the
# measurement design (interleaved local[8]/local[32] pairs, median
# pair reported; sandbox host throttling makes sequential designs
# unreliable).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/scaling_bench.py "${1:-3}" "${2:-/root/testdata/sf0.1}"
