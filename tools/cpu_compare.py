"""Classify wall movement between two BENCH_DETAIL.json files as code
regression vs box-epoch drift, using the cpu_seconds column (round-12:
bench.py records executor CPU per query next to wall).

The method the r11/r12 close records apply by hand, as one command.
Wall-clock at this corpus's sub-second medians carries a proven
±10-15% environmental term; executor CPU is largely immune to the
epoch — but only IN AGGREGATE: the round-12 close quad measured
per-query cpu spreads up to 1.9× on byte-identical code (GC/JIT
attribution at sub-second scales; x94 2.37–4.41 s) while the CORPUS
cpu total stayed within ±6.6% (254.6–271.3 s) against a ±16% wall.
So:

  - the VERDICT comes from the common-query cpu TOTAL:
    total-cpu ratio > 1.15 -> the code does more work (exit 1);
    wall up with total cpu flat -> environmental (exit 0).
  - per-query lines are printed as LEADS (wall ratio over threshold,
    annotated with the cpu ratio) — investigate the ones whose cpu
    moved with multi-second deltas; ignore sub-second cpu jitter.

Usage: python tools/cpu_compare.py OLD.json NEW.json [--threshold 1.3]
"""

from __future__ import annotations

import json
import sys


def compare(old: dict, new: dict, threshold: float = 1.3):
    """(lead_lines, summary_line, exit_code) for two BENCH_DETAIL
    payloads — split from main() in round 13 so bench.py can run the
    classification automatically against the newest committed baseline
    (r12 verdict item 6) with the exact same arithmetic the CLI uses.
    exit codes: 0 environmental / 1 code-does-more-work / 2 no cpu
    column in one input."""
    ow, nw = old["queries"], new["queries"]
    oc, nc = old.get("cpu_seconds", {}), new.get("cpu_seconds", {})

    leads: list[str] = []
    for q in sorted(set(ow) & set(nw)):
        if ow[q] <= 0 or nw[q] / ow[q] <= threshold:
            continue
        line = f"{q}: wall {ow[q]:.2f}->{nw[q]:.2f} ({nw[q] / ow[q]:.2f}x)"
        if q in oc and q in nc and oc[q] > 0:
            line += f", cpu {oc[q]:.2f}->{nc[q]:.2f} ({nc[q] / oc[q]:.2f}x)"
        leads.append(line)

    common = set(ow) & set(nw)
    tw_o, tw_n = sum(ow[q] for q in common), sum(nw[q] for q in common)
    summary = f"common-query totals ({len(common)}): wall {tw_o:.1f}->{tw_n:.1f} s"
    if oc and nc:
        cc = common & set(oc) & set(nc)
        tc_o, tc_n = sum(oc[q] for q in cc), sum(nc[q] for q in cc)
        ratio = tc_n / tc_o if tc_o else 1.0
        code = ratio > 1.15
        summary += (f", cpu {tc_o:.1f}->{tc_n:.1f} s ({ratio:.2f}x) — "
                    + ("CODE does more work" if code else
                       "cpu flat: wall movement is ENVIRONMENTAL"))
        return leads, summary, 1 if code else 0
    summary += (" — no cpu column in one input; rerun both benches "
                "with the probe for a verdict")
    return leads, summary, 2


def main() -> None:
    argv = sys.argv[1:]
    threshold = 1.3
    if "--threshold" in argv:
        i = argv.index("--threshold")
        threshold = float(argv[i + 1])
        del argv[i : i + 2]
    if len(argv) != 2:
        sys.exit(__doc__)
    old, new = (json.load(open(p)) for p in argv)
    leads, summary, code = compare(old, new, threshold)
    for line in leads:
        print(line)
    print(summary)
    sys.exit(code)


if __name__ == "__main__":
    main()
