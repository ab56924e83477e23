"""Small-DataFrame construction helpers.

A list-based ``spark.createDataFrame([...])`` builds a *pickled-RDD* local
relation: every downstream action (even a 1-row parquet write) must spin
Python workers — 5-9 s per touch in local mode, and it drags Python into
otherwise JVM-only wave plans.  These helpers keep driver-side scalars on
the fast path:

* ``local_df``  — routes tiny row-lists through pandas + Arrow (JVM
  LocalRelation; ~0.2 s to write).
* ``empty_df``  — a zero-row frame built from ``spark.range(0)`` + casts,
  pure JVM (the Arrow path degrades to pickled-RDD for empty pandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def empty_df(spark: SparkSession, schema: str) -> DataFrame:
    st = StructType.fromDDL(schema)
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields])


def local_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    if not rows:
        return empty_df(spark, schema)
    import pandas as pd

    # Ensure the Arrow fast path regardless of how the caller built the
    # session (runtime-settable conf; restored after the build), and keep
    # the non-Arrow fallback safe too: missing values in non-float columns
    # must be object-dtype None, never float NaN — and integral columns
    # that pandas widened to float64 must carry Python ints, not floats
    # (IntegerType's schema verifier rejects both NaN and 3.0).
    _AK = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(_AK, None)
    spark.conf.set(_AK, "true")
    try:
        st = StructType.fromDDL(schema)
        pdf = pd.DataFrame(rows, columns=[f.name for f in st.fields])
        integral = ("integer", "long", "short", "byte")
        for f in st.fields:
            col = pdf[f.name]
            if f.dataType.typeName() not in ("double", "float") and \
                    col.isna().any():
                if f.dataType.typeName() in integral:
                    pdf[f.name] = col.map(
                        lambda v: None if pd.isna(v) else int(v))
                else:
                    pdf[f.name] = col.astype(object).where(col.notna(), None)
        return spark.createDataFrame(pdf, schema=st)
    finally:
        if prev is None:
            spark.conf.unset(_AK)
        else:
            spark.conf.set(_AK, prev)
