"""Capture .explain("formatted") for named registered queries into
plans/<round>/<query>_<tag>.txt — the before/after plan evidence the
optimization rounds commit next to the bench numbers.

Usage: python tools/capture_plans.py <tag> <query>[,<query>...] [sf_dir]
(streaming demo queries execute at build time and have no single final
plan; this tool is for declarative batch queries.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUND_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r14")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )

    import __spark_entry__ as entry
    from xboard_spark.session import get_spark

    spark = get_spark("plan-capture")
    registry = entry.queries()
    os.makedirs(ROUND_DIR, exist_ok=True)
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(ROUND_DIR, f"{name}_{tag}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"{out}: {plan.count('Exchange')} Exchange lines", flush=True)


if __name__ == "__main__":
    main()
