"""applyInPandasWithState sessionization: state survives micro-batch
boundaries and reproduces the batch-mode window computation."""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from auto_ria_spark.streaming.stateful import SESSION_SCHEMA, sessionize

GAP_S = 1800


def _batch_sessions(df):
    """Batch-mode oracle: lag-gap sessionization via plain windows."""
    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag("ts").over(w).cast("timestamp").cast("long")
    marked = df.withColumn(
        "new_sess",
        (F.coalesce(epoch - prev, F.lit(10**9)) > GAP_S).cast("int"))
    sess = marked.withColumn(
        "sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"),
             F.round(F.sum("value"), 3).alias("sum_value"))
    )


def test_stateful_sessionize_across_batches(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("user_id", "ts", "value")
    # feed as 4 time-ordered files -> 4 micro-batches (state must carry)
    src = str(tmp_path / "stream_src")
    quartiles = events.approxQuantile("user_id", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf")] + quartiles + [float("inf")]
    ordered = events.orderBy("ts").collect()
    n = len(ordered)
    for i in range(4):
        chunk = ordered[i * n // 4:(i + 1) * n // 4]
        spark.createDataFrame(chunk, schema=events.schema) \
            .coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mod-times -> deterministic batch order

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    closed: list = []
    q = (
        sessionize(stream, gap_s=GAP_S)
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .foreachBatch(lambda df, _id: closed.extend(df.collect()))
        .start()
    )
    q.awaitTermination()

    # oracle: batch sessions minus each user's LAST session (stays open in
    # state — NoTimeout never flushes the tail)
    all_sess = _batch_sessions(events)
    w_last = Window.partitionBy("user_id").orderBy(F.desc("session_start"))
    expected = (
        all_sess.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") > 1)
        .select("user_id", "session_start", "session_end", "n_events",
                F.col("sum_value"))
    ).collect()

    got = sorted((r.user_id, r.session_start, r.session_end, r.n_events,
                  round(r.sum_value, 3)) for r in closed)
    exp = sorted((r.user_id, r.session_start, r.session_end, r.n_events,
                  round(r.sum_value, 3)) for r in expected)
    assert len(got) > 0
    assert got == exp, (got[:3], exp[:3])
