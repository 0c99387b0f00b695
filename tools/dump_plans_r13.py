"""Dump `.explain("formatted")` for named catalog queries to
plans/r13/<name>_<suffix>.txt — the optimization round's before/after
plan evidence (OPTIMIZATION_r13.md).

Usage: python tools/dump_plans_r13.py SUFFIX NAME [NAME...]
       python tools/dump_plans_r13.py after text_langid text_quality ...

Planning only (no job execution) at the bench scale factor sf0.1 on
local[$SPARK_GRAFT_CPUS], matching the *_before.txt files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from temporai_mivdp_spark.queries import QUERIES  # noqa: E402
import temporai_mivdp_spark.queries_llm  # noqa: E402,F401
from temporai_mivdp_spark.session import get_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(
        app_name="dump-plans-r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
