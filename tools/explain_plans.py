"""Dump formatted physical plans for the headline queries and grep the
properties that matter at 100 TB: PushedFilters reaching the parquet scan,
pruned ReadSchema, broadcast joins on dim tables, WholeStageCodegen spans,
and absence of row-at-a-time Python UDFs (BatchEvalPython) in hot paths.

Usage: python tools/explain_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from auto_ria_spark.queries import queries  # noqa: E402
from auto_ria_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:] or None


def main() -> None:
    spark = get_spark("explain", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in queries().items():
        if ONLY and name not in ONLY:
            continue
        df = fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = {
            "pushed_filters": "PushedFilters: [" in plan
            and "PushedFilters: []" not in plan,
            # Spark 4 formatted explain marks codegen spans with
            # "[codegen id : N]" (simple mode uses WholeStageCodegen)
            "codegen": "WholeStageCodegen" in plan
            or "codegen id" in plan,
            "broadcast_join": "BroadcastHashJoin" in plan,
            "python_row_udf": "BatchEvalPython" in plan,
            "arrow_pandas": "ArrowEvalPython" in plan or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan,
            "exchanges": plan.count("Exchange"),
        }
        print(f"== {name}: {flags}")
        if "-v" in sys.argv:
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
