#!/usr/bin/env python
"""Round-3 scaling extension (VERDICT r2 #7): a 2->8 probe under the
SAME protocol as the 1->4 headline (256x corpus, fresh JVM per run,
interleaved pairs with cooldowns, untimed JIT + page-cache warm
passes, hypervisor steal tracked from /proc/stat). APPENDS a results
section to BENCH.md — the 1->4 headline table is produced by
scaling_bench.py, which overwrites the file; run that first.

The 2->8 pair deliberately probes ABOVE the host's measured
~4-5-effective-core sustained-rate cap (BENCH.md history): the 8-core
level absorbs whatever headroom the host grants, so this measures a
LOWER BOUND of the engine's scaling with the throttle folded in.

Usage: python scripts/scaling_probe.py [n_pairs]
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("SCALE_N", "2")
os.environ.setdefault("BENCH_MULTIPLIER", "256")

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
sys.argv = [sys.argv[0]]          # scaling_bench reads argv at import

import scripts.scaling_bench as sb  # noqa: E402


def main():
    tag = Path(sb.SF_DIR).name
    pages_pq = f"/tmp/bench_pages_{tag}_x{sb.MULTIPLIER}"
    cooldown = int(os.environ.get("SCALE_COOLDOWN", "90"))
    pairs = []
    for i in range(N_PAIRS):
        time.sleep(cooldown)
        r_hi = sb.run_once(sb.N4_CORES, pages_pq)   # 4N first: fresher quota
        time.sleep(cooldown)
        r_lo = sb.run_once(sb.N_CORES, pages_pq)
        eff = (r_lo["sec"] / r_hi["sec"]) / 4
        eff_c = (r_lo["sec"] * (1 - r_lo["steal"])) / \
                (r_hi["sec"] * (1 - r_hi["steal"])) / 4
        pairs.append({"t_lo": r_lo["sec"], "t_hi": r_hi["sec"],
                      "eff": round(eff, 3), "eff_corr": round(eff_c, 3),
                      "steal_lo": r_lo["steal"], "steal_hi": r_hi["steal"],
                      "docs": r_lo["docs"]})
        print(f"pair {i}: t{sb.N_CORES}={r_lo['sec']} "
              f"t{sb.N4_CORES}={r_hi['sec']} eff={eff:.3f} "
              f"eff_corr={eff_c:.3f}", file=sys.stderr)

    # LOWER median: for even pair counts the upper-middle element
    # would overstate the headline (it is an upper bound, not a
    # median) — report the conservative middle instead
    med = sorted(pairs, key=lambda p: p["eff"])[(len(pairs) - 1) // 2]
    docs = pairs[0]["docs"]
    lines = "\n".join(
        f"| {i} | {p['t_lo']:.1f} | {p['t_hi']:.1f} | {p['eff']:.3f} "
        f"| {p['eff_corr']:.3f} | {p['steal_lo']:.1%}/{p['steal_hi']:.1%} |"
        for i, p in enumerate(pairs))
    section = f"""

## Round 3: {sb.N_CORES}->{sb.N4_CORES} probe (same protocol as the headline)

Same job, same {docs}-doc corpus, fresh JVMs, interleaved pairs,
untimed JIT + cache warm, steal-tracked. This pair probes ABOVE the
host's ~4-5-effective-core sustained cap (see measurement history), so
it bounds the engine's scaling FROM BELOW with the host throttle
folded in — the 1->4 headline remains the clean engine read.

| pair | local[{sb.N_CORES}] s | local[{sb.N4_CORES}] s | efficiency | steal-corrected | steal lo/hi |
|---|---|---|---|---|---|
{lines}

Lower-median {sb.N_CORES}->{sb.N4_CORES} efficiency: **{med['eff']:.3f}**
(steal-corrected {med['eff_corr']:.3f}; with an even pair count this
is the conservative middle element, not an average).
"""
    with open(REPO / "BENCH.md", "a", encoding="utf-8") as f:
        f.write(section)
    print(json.dumps({"pairs": pairs, "median_eff": med["eff"]}))


if __name__ == "__main__":
    main()
