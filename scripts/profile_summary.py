#!/usr/bin/env python3
"""Summarize a jax.profiler trace: top device ops by total time.

Usage:
    python scripts/profile_summary.py /tmp/prof [N]

Finds the newest *.trace.json.gz under the directory, aggregates complete
("ph" == "X") events by name, and prints the top N (default 30) by total
duration. `while.N` entries are lax.scan / lax.while_loop / GMRES loop
bodies — multiply by the trip count to read per-iteration cost.
"""

import gzip
import json
import os
import sys
from collections import defaultdict


def find_trace(root: str) -> str:
    newest, newest_t = None, -1.0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".trace.json.gz"):
                p = os.path.join(dirpath, f)
                t = os.path.getmtime(p)
                if t > newest_t:
                    newest, newest_t = p, t
    if newest is None:
        sys.exit(f"no *.trace.json.gz under {root}")
    return newest


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    path = find_trace(root)
    print(f"trace: {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep device-lane events only (TPU op lanes have "dur" in us)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        tot[name] += dur
        cnt[name] += 1
    grand = sum(tot.values())
    print(f"{'total ms':>10} {'calls':>7} {'%':>6}  name")
    for name in sorted(tot, key=tot.get, reverse=True)[:top_n]:
        print(f"{tot[name]:10.2f} {cnt[name]:7d} {100*tot[name]/grand:6.2f}"
              f"  {name[:110]}")
    print(f"{grand:10.2f} {'':7} 100.00  TOTAL (all lanes, overlaps"
          f" double-counted)")


if __name__ == "__main__":
    main()
