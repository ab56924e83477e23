"""Executable Iceberg bootstrap — runs the engine's production DDL and the
MERGE-based cars sink on a cluster where the Iceberg runtime jar is
present (this sandbox has no jar and no network installs, so the pytest
integration is skip-marked; the module itself is plain Spark SQL).

Cluster invocation:

    spark-submit \\
        --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
        --py-files dist/engine.zip \\
        jobs/iceberg_bootstrap.py --warehouse /path/to/iceberg_wh

What it does:
  1. configures a local Hadoop-type Iceberg catalog named ``crawl`` at
     ``--warehouse`` (swap for a Hive/REST catalog in production),
  2. executes every statement from ``sources.warehouse.iceberg_ddl()``
     (the same DDL the sandbox SnapshotTable stand-in documents),
  3. smoke-verifies the MERGE-based cars sink: unique-url + unique-vin
     dup protection as ONE atomic MERGE — the Iceberg realization of the
     reference's safe_insert_car / check-then-insert race handling
     (reference: app/utils/db_utils.py:79-180).
"""

from __future__ import annotations

import argparse
import json

CATALOG = "crawl"

ICEBERG_CONFS = {
    "spark.sql.extensions":
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    f"spark.sql.catalog.{CATALOG}":
        "org.apache.iceberg.spark.SparkCatalog",
    f"spark.sql.catalog.{CATALOG}.type": "hadoop",
}


def iceberg_session(app: str, warehouse: str, cores: int | None = None):
    """A SparkSession with the Iceberg extension + a hadoop catalog rooted
    at ``warehouse``.  Raises at first use if the runtime jar is absent."""
    from pyspark.sql import SparkSession

    b = (SparkSession.builder.appName(app)
         .master(f"local[{cores}]" if cores else "local[*]"))
    for k, v in ICEBERG_CONFS.items():
        b = b.config(k, v)
    b = b.config(f"spark.sql.catalog.{CATALOG}.warehouse", warehouse)
    return b.getOrCreate()


def iceberg_available(spark) -> bool:
    """True when the Iceberg runtime classes are on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_tables(spark) -> list[str]:
    """Run the production DDL; returns the table names created."""
    from auto_ria_spark.sources.warehouse import iceberg_ddl

    made = []
    for name, ddl in iceberg_ddl().items():
        spark.sql(ddl)
        made.append(name)
    return made


def merge_cars_sql(batch_view: str) -> str:
    """The MERGE statement of the cars sink (see merge_cars)."""
    return f"""
        MERGE INTO {CATALOG}.crawl.cars t
        USING {batch_view} s
        ON t.url = s.url
           OR (t.car_vin IS NOT NULL AND t.car_vin = s.car_vin)
        WHEN NOT MATCHED THEN INSERT *
    """


def merge_cars(spark, batch_view: str) -> None:
    """The MERGE-based cars sink: insert rows whose url AND vin are both
    unseen — the reference's unique-url (uq_car_url) + unique-vin
    (uq_car_vin) insert protection as one atomic Iceberg MERGE
    (reference: app/core/models.py:68-69, app/utils/db_utils.py:79-180).
    ``batch_view`` must already be VIN-deduped within the batch
    (plans.crawl._dedup_by_vin — lowest discovery rank wins)."""
    spark.sql(merge_cars_sql(batch_view))


def validate_sql(spark) -> dict[str, str]:
    """DRY-RUN validation, runnable WITHOUT the Iceberg jar: every
    production DDL statement plus the cars MERGE goes through Spark's own
    SQL parser (``sessionState().sqlParser().parsePlan``) — grammar and
    clause shape are checked even though the `iceberg` provider can't be
    analyzed in a jar-less sandbox.  Returns {statement name: parsed
    logical-plan class} and RAISES on any parse error."""
    from auto_ria_spark.sources.warehouse import iceberg_ddl

    parser = spark._jsparkSession.sessionState().sqlParser()
    kinds = {}
    for name, ddl in iceberg_ddl().items():
        kinds[name] = parser.parsePlan(ddl).getClass().getSimpleName()
    merge_plan = parser.parsePlan(merge_cars_sql("cars_batch"))
    kinds["merge_cars"] = merge_plan.getClass().getSimpleName()
    # shape guard: the sink is an INSERT-ONLY merge — dup rows must be
    # silently skipped (reference safe_insert_car semantics), never
    # updated; one not-matched INSERT action and zero matched actions.
    # Explicit raises, not asserts: this is a production validation path
    # and asserts vanish under PYTHONOPTIMIZE/-O
    if merge_plan.matchedActions().size() != 0:
        raise ValueError(
            "cars MERGE must not update matched (duplicate) rows")
    if merge_plan.notMatchedActions().size() != 1:
        raise ValueError(
            "cars MERGE must have exactly one NOT MATCHED INSERT action")
    return kinds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--dry-run", action="store_true",
                    help="validate the DDL + MERGE statements through "
                         "Spark's SQL parser and exit (no Iceberg jar "
                         "needed)")
    args = ap.parse_args()

    spark = iceberg_session("auto-ria-iceberg-bootstrap", args.warehouse,
                            args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    if args.dry_run:
        print(json.dumps({"dry_run": True, "parsed": validate_sql(spark)}))
        spark.stop()
        return
    if not iceberg_available(spark):
        raise SystemExit(
            "Iceberg runtime jar not on the classpath — launch via "
            "spark-submit --packages org.apache.iceberg:"
            "iceberg-spark-runtime-<spark>_<scala>:<version>")
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.crawl")
    tables = create_tables(spark)
    # smoke: the dup-protected sink keeps first-url/first-vin rows only
    from auto_ria_spark.util import local_df
    rows = [("https://auto.ria.test/a.html", "A", 1, None, "u", "+380 1",
             None, None, 1, None, "VIN1", None, "auto.ria.test", 1),
            ("https://auto.ria.test/b.html", "B", 2, None, "u", "+380 2",
             None, None, 1, None, "VIN1", None, "auto.ria.test", 2)]
    from auto_ria_spark.plans.crawl import CARS_SCHEMA, _dedup_by_vin
    batch = _dedup_by_vin(local_df(spark, rows, CARS_SCHEMA))
    batch.createOrReplaceTempView("cars_batch")
    merge_cars(spark, "cars_batch")
    merge_cars(spark, "cars_batch")  # idempotent: second merge adds 0
    n = spark.table(f"{CATALOG}.crawl.cars").count()
    print(json.dumps({"tables": tables, "cars_after_double_merge": n}))
    spark.stop()


if __name__ == "__main__":
    main()
