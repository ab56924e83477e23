"""Structured-Streaming surfaces of the crawl engine.

The crawl itself is naturally micro-batched by BFS wave (SURVEY.md §1.2);
these adapters expose the two streaming-shaped views the north rule calls
for:

1. ``metrics_stream`` — the per-wave / per-partition lineage rows as a
   file-source stream (new metric files appear as waves commit), with a
   tumbling-window rollup.  This is the "per-partition lineage ... logged
   as Structured Streaming progress" surface: a monitoring job tails the
   metrics table while the crawl runs.
2. ``continuous_crawl`` — drives the wave loop from a ``foreachBatch``
   ticker: each streaming micro-batch advances one crawl wave
   (``Trigger.AvailableNow`` => drain-to-empty, the streaming analogue of
   ``run()``; processingTime trigger => the reference's Celery-beat
   schedule, reference: app/config/celery_config.py:60-69).

Both use only public Structured Streaming APIs; state still lives in the
snapshot tables, so a crashed streaming driver resumes exactly like the
batch driver (CrawlEngine.resume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ria_spark.plans.crawl import METRICS_SCHEMA, CrawlEngine


def metrics_stream(spark: SparkSession, engine: CrawlEngine) -> DataFrame:
    """readStream over the engine's metrics table data directory."""
    path = f"{engine.t['metrics'].dir}/data/*"
    return (
        spark.readStream.schema(METRICS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(path)
    )


def metrics_rollup(stream: DataFrame) -> DataFrame:
    """Per-wave rollup of the lineage stream (complete-mode aggregate)."""
    return (
        stream.groupBy("wave", "kind", "metric")
        .agg(F.sum("value").alias("value"),
             F.count("*").alias("partitions"))
    )


def run_metrics_monitor(spark: SparkSession, engine: CrawlEngine,
                        out_table: list) -> None:
    """Drain the lineage stream once (AvailableNow) into ``out_table``."""
    q = (
        metrics_rollup(metrics_stream(spark, engine))
        .writeStream.outputMode("complete")
        .trigger(availableNow=True)
        .foreachBatch(lambda df, _id: out_table.extend(df.collect()))
        .start()
    )
    q.awaitTermination()


def continuous_crawl(spark: SparkSession, engine: CrawlEngine,
                     seeds: list[dict], max_waves: int = 10_000) -> list:
    """Run the crawl as a streaming job: a rate-source ticker fires one wave
    per micro-batch via foreachBatch; the query stops when the frontier
    drains.  State/checkpointing ride on the engine's snapshot tables."""
    engine.start(seeds)
    stats: list = []

    def tick(_df, batch_id: int) -> None:
        if stats and stats[-1].frontier_left == 0:
            return
        if len(stats) >= max_waves:
            return
        stats.append(engine.run_wave(len(stats)))

    q = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .writeStream.foreachBatch(tick)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        while True:
            q.processAllAvailable()
            if stats and (stats[-1].frontier_left == 0
                          or len(stats) >= max_waves):
                break
    finally:
        q.stop()
    return stats
