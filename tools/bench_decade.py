#!/usr/bin/env python
"""One-DECADE scale point for the heaviest query families (round-11
verdict #7).

The 3x derived-corpus table (tools/bench_scale.py) is work-normalized,
but a 3x window cannot resolve super-linear CONSTANTS — a hidden
n^1.3 stage reads as ~1.4x over 3x (inside box noise) yet ~2x over a
decade. The driver testdata already carries a true decade:
sf0.01 -> sf0.1 is 10x on lineitem/orders/events/documents (embeddings
is 4x — the fixtures note in FIXTURES.md), so the five heaviest
families are timed at both ends and the wall ratio is normalized by the
family's dominant INPUT growth (not output rows — several of these
return fixed-size summaries).

The pin: input-normalized work_ratio <= ~1.2, or an annotation naming
the super-linear term (PERF.md round-12 carries the table).

Usage: python tools/bench_decade.py      # one JSON line on stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/testdata/sf0.01"
BIG = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# family -> the table whose row growth dominates its work (the
# normalizer). Stateful entries warm their persisted working set with an
# untimed pass per dir, same rule as bench_scale's STATEFUL_WARM.
DECADE_FAMILY = {
    "setsim_prefix_join": "documents",
    "incremental_retention_manifest": "documents",          # stored-state
    "incremental_retention_manifest_inquery": "documents",  # audit twin
    "copurchase_label_communities": "lineitem",
    "kcore_copurchase": "lineitem",
    "semantic_dedup_ivf": "embeddings",
    # round-13 third-session additions in the heavy band
    "copurchase_weighted_sssp": "lineitem",
    "dedup_containment": "documents",
}
STATEFUL = {"incremental_retention_manifest"}
PASSES = int(os.environ.get("SPARK_GRAFT_DECADE_PASSES", "2"))


def main() -> None:
    from covid_19_data_engineering_spark.plans.registry import all_queries
    from covid_19_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="bench-decade")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    rows_in = {
        t: {
            d: spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()
            for d in (SMALL, BIG)
        }
        for t in sorted(set(DECADE_FAMILY.values()))
    }

    out: dict[str, dict] = {}
    for name, table in DECADE_FAMILY.items():
        if name not in queries:
            continue
        # codegen warmup at the smallest SF
        queries[name](spark, "/root/testdata/sf0.001").collect()
        rec: dict = {}
        for label, sf_dir in (("small", SMALL), ("big", BIG)):
            if name in STATEFUL:
                queries[name](spark, sf_dir).collect()  # build state, untimed
            walls = []
            n = 0
            for _ in range(PASSES):
                t0 = time.time()
                n = len(queries[name](spark, sf_dir).collect())
                walls.append(time.time() - t0)
            rec[label] = round(min(walls), 2)  # best-of-n: steady state
            rec[f"{label}_rows"] = n
        growth = rows_in[table][BIG] / rows_in[table][SMALL]
        rec["input_growth"] = round(growth, 1)
        rec["ratio"] = (round(rec["big"] / rec["small"], 2)
                        if rec["small"] else -1)
        rec["work_ratio"] = (round(rec["ratio"] / growth, 2)
                             if rec["small"] else -1)
        out[name] = rec
        print(json.dumps({name: rec}), file=sys.stderr)

    print(json.dumps({"decade": out, "small": SMALL, "big": BIG,
                      "passes": PASSES}))
    spark.stop()


if __name__ == "__main__":
    main()
