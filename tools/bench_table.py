"""Generate the BENCH_NOTES comparison table from committed bench JSONs.

Usage:
    python tools/bench_table.py BENCH_PROTOCOL_r06.json BENCH_r05.json BENCH_r03.json

The first file is the current protocol run (ideally ``bench.py --repeat 3``,
whose ``queries`` values are per-query medians and whose ``spread`` carries
[min, max]); the rest are prior rounds to compare against. Emits a markdown
table over the INTERSECTION of query keys (so round-over-round claims are
apples-to-apples) plus totals per file. This is the only sanctioned source
for round-over-round perf claims in BENCH_NOTES.md — ad-hoc session numbers
were how the r5 notes ended up contradicting the committed artifacts.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    paths = sys.argv[1:]
    if len(paths) < 2:
        print(__doc__)
        raise SystemExit(2)
    data = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        if "queries" not in d and "parsed" in d:  # driver BENCH_r*.json shape
            d = d["parsed"]
        data.append((p, d))
    cur_name, cur = data[0]
    shared = set(cur.get("queries", {}))
    for _, d in data[1:]:
        shared &= set(d.get("queries", {}))
    shared = sorted(shared)
    if not shared:
        print("no shared query keys between the given files")
        raise SystemExit(1)

    hdr = ["query"] + [p.split("/")[-1] for p, _ in data]
    if "spread" in cur:
        hdr.append(f"{cur_name.split('/')[-1]} [min,max]")
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    totals = [0.0] * len(data)
    for q in shared:
        row = [q]
        for i, (_, d) in enumerate(data):
            v = float(d["queries"][q])
            totals[i] += v
            row.append(f"{v:.2f}")
        if "spread" in cur and q in cur["spread"]:
            lo, hi = cur["spread"][q]
            row.append(f"[{lo:.2f}, {hi:.2f}]")
        elif "spread" in cur:
            row.append("")
        print("| " + " | ".join(row) + " |")
    row = [f"**shared-{len(shared)} total**"] + [f"**{t:.2f}**" for t in totals]
    if "spread" in cur:
        row.append("")
    print("| " + " | ".join(row) + " |")
    base = totals[0]
    for (p, _), t in zip(data[1:], totals[1:]):
        delta = (base - t) / t * 100.0
        print(f"\ncurrent vs {p}: {base:.2f}s vs {t:.2f}s ({delta:+.1f}%)")
    proto = cur.get("protocol")
    if proto:
        print(f"\nprotocol: {json.dumps(proto)}")


if __name__ == "__main__":
    main()
