"""Driver-verification staleness report (round-12 verdict #9).

Now that every registered query has at least one external CORRECTNESS
row, the honesty question becomes RECENCY: how many rounds ago was each
query last green under the real driver? This tool reads every
CORRECTNESS_r*.json beside the repo root, joins against the current
registry, and prints a markdown summary — max staleness, a histogram,
and the most-stale queries (the natural candidates for the next
PRIORITY head's filler slots, per the post-closure rotation rule:
new/changed registrants first, then least-recently-driver-sampled).

Usage: python tools/staleness.py [--top N]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green_rounds() -> tuple[dict[str, int], int]:
    """{query: last round with a fully-green driver row}, current round."""
    latest = 0
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            ok = (r.get("rows_match") and r.get("schema_match")
                  and r.get("hash_match") and not r.get("err"))
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last, latest


def main() -> int:
    top_n = 15
    if "--top" in sys.argv:
        top_n = int(sys.argv[sys.argv.index("--top") + 1])

    import __spark_entry__ as entry

    registered = sorted(entry.queries())
    last, latest = last_green_rounds()

    staleness = {}
    for name in registered:
        lg = last.get(name)
        staleness[name] = (latest - lg) if lg is not None else None

    never = sorted(n for n, s in staleness.items() if s is None)
    aged = sorted(((s, n) for n, s in staleness.items() if s is not None),
                  reverse=True)
    print(f"# Driver-verification staleness (as of round {latest})")
    print(f"registered: {len(registered)}  "
          f"never-driver-green: {len(never)}")
    if never:
        print("never green:", ", ".join(never))
    if aged:
        print(f"max staleness: {aged[0][0]} rounds")
        hist: dict[int, int] = {}
        for s, _ in aged:
            hist[s] = hist.get(s, 0) + 1
        print("histogram (staleness: count):",
              ", ".join(f"{s}: {hist[s]}" for s in sorted(hist)))
        print(f"\nmost stale {top_n}:")
        for s, n in aged[:top_n]:
            print(f"  {s:>2} rounds  {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
