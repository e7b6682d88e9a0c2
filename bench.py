"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with .collect() (driver materialization,
like the correctness gate). A warmup collect amortizes session/JIT startup
out of the first measured query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "segment_top_orders",
    "top_customers",
    "orders_by_date",
    "recent_orders",
    "upsert_merge",
    "events_dedup",
    "session_stats",
    "user_rollup",
    "doc_stats",
    "quality_scores",
    "minhash_dedup",
    "ngram_jaccard",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "curation_stats",
    "hourly_windows",
    "purchase_asof_view",
    "rolling_revenue",
    "nation_customer_ranks",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from xboard_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("xboard-bench")
    qs = entrymod.queries()

    # warmup: touch every table once so file listing/footer reads and JIT
    # warm outside the measured window
    from xboard_spark.io import TESTDATA_TABLES, read_table

    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
