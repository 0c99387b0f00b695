"""Round-12 catalog-wide plan audit: one line per catalog entry with the
plan-shape facts that matter at 100 TB (guide §7.2), plus a FLAG column
for the shapes worth a human look:

* CART   — CartesianProduct anywhere
* BNLJ   — BroadcastNestedLoopJoin (legit only for 1-row corpus totals)
* 1PART  — Exchange SinglePartition (serialization point)
* SORTAGG— SortAggregate (hash agg fell back)
* PYROW  — BatchEvalPython (row-at-a-time Python)
* GENFILT— a Filter line containing transform(/aggregate( lambdas
           (a generate-inferred filter pushed a heavy expression down,
           the dedup_ngram_jaccard round-12 pathology)
* NSCAN=k— number of parquet scans (subtree duplication watch)

Plans only — nothing is executed. Usage:
    python tools/audit_plans_r12.py [sf_dir] > plans/r12/audit.txt
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from temporai_mivdp_spark.queries import QUERIES  # noqa: E402
import temporai_mivdp_spark.queries_llm  # noqa: E402,F401
from temporai_mivdp_spark.plans import plan_summary  # noqa: E402
from temporai_mivdp_spark.session import get_test_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_test_session(cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"BUILD-ERROR {e}"))
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        s = plan_summary(df)
        flags = []
        if s.get("CartesianProduct"):
            flags.append("CART")
        if s.get("BroadcastNestedLoopJoin"):
            flags.append(f"BNLJ={s['BroadcastNestedLoopJoin']}")
        if s.get("Exchange SinglePartition"):
            flags.append(f"1PART={s['Exchange SinglePartition']}")
        if s.get("SortAggregate"):
            flags.append(f"SORTAGG={s['SortAggregate']}")
        if "BatchEvalPython" in plan:
            flags.append("PYROW")
        for line in plan.splitlines():
            if re.search(r"\bFilter\b", line) and (
                "transform(" in line or "aggregate(" in line
            ):
                flags.append("GENFILT")
                break
        nscan = len(re.findall(r"FileScan parquet|Scan parquet", plan))
        ex = sum(v for k, v in s.items() if k.startswith("Exchange"))
        rows.append(
            (
                name,
                f"scans={nscan} exch={ex} "
                f"bhj={s.get('BroadcastHashJoin', 0)} smj={s.get('SortMergeJoin', 0)} "
                f"oha={s.get('ObjectHashAggregate', 0)} win={s.get('Window', 0)} "
                + (" ".join(flags) if flags else "-"),
            )
        )
    w = max(len(n) for n, _ in rows)
    for n, info in rows:
        print(f"{n:<{w}}  {info}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
