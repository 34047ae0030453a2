"""Compute the historical latency-bar subsets from BENCH_DETAIL.json.

The bars (BENCH_NOTES round-8 reconciliation: 115-subset <=62 s,
130 <=80, 167 <=145, full <=210) are sums over the query sets that
existed when each bar was first set.  Those sets were previously
reconstructed by hand each round; ``bench_subsets.json`` (extracted
from the registry source at the round-4 / round-6 / round-7-session-3
/ round-7-close commits) freezes them so the arithmetic is one
command:

    python tools/bench_subsets.py            # reads BENCH_DETAIL.json
    python tools/bench_subsets.py detail.json
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BARS = {
    "subset_115_r4": 62.0,
    "subset_130_r6": 80.0,
    "subset_167_r7s3": 145.0,
    # the "full <=210" bar was set when the corpus had 206 queries
    # (BENCH_NOTES round-8 reconciliation); frozen here so corpus
    # GROWTH is priced explicitly instead of mechanically breaching a
    # fixed-total bar.  The full-corpus line below is informational:
    # its wall = subset_206_r8 + the post-bar additions, each of which
    # carries its own cost note in BENCH_NOTES when registered.
    "subset_206_r8": 210.0,
    # frozen at the round-9 close (235 queries; driver r9 measured
    # 187.3 s, builder close 183.5 s).  Bar = 25% headroom over the
    # driver measurement — the same convention as subset_206_r8 —
    # so round-10+ growth (x203/x204/x205 onward) is priced separately.
    "subset_235_r9": 235.0,
    # frozen at the round-11 open (238 queries = subset_235_r9 + the
    # round-10 registrations x203/x204/x205; driver r10 measured
    # 222.3 s under a ~9% environmental inflation, builder's clean
    # close 207.2 s).  Bar = the r10 verdict's prescribed ~245 s class
    # (≈18% headroom over the clean close) so round-11+ growth (x206/
    # x207 onward) is priced separately.
    "subset_238_r10": 245.0,
    # frozen at the round-12 open (242 queries = the full r11-close
    # corpus, subset_238_r10 + the r11 registrations x206-x209; driver
    # r11 measured 215.2 s, r11 close triad 204.4/195.7/227.9 s on
    # identical code — the ±14% box-epoch spread the r11 bisect
    # proved).  Bar = the r11 verdict's prescribed ~250 s class
    # (≈10% headroom over the WORST triad run) so round-12+ growth
    # (x210 onward) is priced separately.
    "subset_242_r11": 250.0,
    # frozen at the round-13 open (243 queries = subset_242_r11 + the
    # round-12 registration x210; driver r12 measured 219.9 s, the r12
    # close quad spanned 224.4-260.0 s solo).  Bar = ~25% headroom over
    # the driver measurement (≈6% over the quad's worst run — the same
    # worst-run-plus-margin class as subset_242_r11) so round-13+
    # growth (x211/x212/x213 onward) is priced separately.
    "subset_243_r12": 275.0,
    # frozen at the round-14 open (246 queries = subset_243_r12 + the
    # round-13 registrations x211/x212/x213; driver r13 measured
    # 199.7 s — the fastest driver reading yet — and the r13 close
    # triad+run-4 spanned 209.8-221.9 s solo).  Bar = 25% headroom
    # over the driver measurement (~13% over the worst close run) so
    # round-14+ growth (x214 onward) is priced separately.
    "subset_246_r13": 250.0,
}


def main() -> None:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(HERE), "BENCH_DETAIL.json"
    )
    detail = json.load(open(detail_path))
    times = detail["queries"] if "queries" in detail else detail
    # executor-CPU sums ride along when bench.py's probe recorded them
    # (r11 verdict item 4): wall answers "did we regress vs the bar",
    # cpu answers "or did the box epoch move" without a bisect.
    cpu = detail.get("cpu_seconds", {}) if isinstance(detail, dict) else {}
    subsets = json.load(open(os.path.join(HERE, "bench_subsets.json")))
    total = sum(times.values())
    for name, members in subsets.items():
        missing = [m for m in members if m not in times]
        s = sum(times[m] for m in members if m in times)
        bar = BARS.get(name)
        status = ""
        if bar is not None:
            status = "  OK (<= %.0f)" % bar if s <= bar else "  BREACH (> %.0f)" % bar
        c = sum(cpu[m] for m in members if m in cpu)
        cpu_part = f" (cpu {c:.1f} s)" if cpu else ""
        print(f"{name}: {s:.1f} s{cpu_part} over {len(members) - len(missing)} queries"
              f"{' (missing ' + ','.join(missing) + ')' if missing else ''}{status}")
    cpu_part = f" (cpu {sum(cpu.values()):.1f} s)" if cpu else ""
    print(f"full corpus: {total:.1f} s{cpu_part} over {len(times)} queries"
          "  (informational — the <=210 bar binds subset_206_r8)")


if __name__ == "__main__":
    main()
