"""Driver-compare rehearsal: run every queries() entry in Spark and its
oracle SQL in DuckDB on the same sf dir; compare row count, column names,
and order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from auto_ria_spark.queries import TABLES  # noqa: E402
from auto_ria_spark.session import get_spark  # noqa: E402

ARGS = [a for a in sys.argv[1:] if a != "--bare"]
BARE = "--bare" in sys.argv[1:]
SF = ARGS[0] if ARGS else "/root/testdata/sf0.001"
ONLY = ARGS[1:] or None


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def main():
    if BARE:
        # Rehearse under a session with NO engine knobs (no Arrow, no AQE
        # tuning) — the driver harness builds its own default session, and
        # round 2's only failures were env-divergence bugs this mode
        # would have caught (nullable Int32 → NaN under non-Arrow
        # createDataFrame).
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.appName("oracle-check-bare")
                 .master("local[8]").getOrCreate())
    else:
        spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, os_ = queries(), oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in scols) for r in sdf.collect())
            if name not in os_:
                print(f"  {name}: rows={len(srows)} (no oracle — rows-only)")
                continue
            ddf = con.execute(os_[name]).fetch_df()
            dcols = sorted(ddf.columns)
            drows = sorted(
                tuple(norm(v) for v in row)
                for row in ddf[dcols].itertuples(index=False, name=None))
            ok_cols = scols == dcols
            ok_count = len(srows) == len(drows)
            ok_vals = srows == drows
            status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
            if status == "OK":
                n_ok += 1
            else:
                n_bad += 1
            print(f"  {name}: {status} rows={len(srows)}/{len(drows)}"
                  f" cols={'OK' if ok_cols else f'{scols} vs {dcols}'}")
            if not ok_vals and ok_cols and ok_count:
                diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
                for a, b in diff:
                    print(f"    spark {a}\n    duck  {b}")
            elif not ok_count:
                only_s = [r for r in srows if r not in set(drows)][:2]
                only_d = [r for r in drows if r not in set(srows)][:2]
                print(f"    spark-only {only_s}\n    duck-only {only_d}")
        except Exception as e:
            n_bad += 1
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    spark.stop()


if __name__ == "__main__":
    main()
