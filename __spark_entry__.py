"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship pipeline over /root/testdata/sf0.001 parquet.
``queries`` — one entry per implemented operator (SURVEY.md §2 + the
              training-data ops); each callable takes (spark, sf_dir).
``oracle_sql`` — DuckDB-equivalent SQL per query (omitted only for the
              genuinely non-SQL ops: the crawl wave loop and the binary
              image verification, which get rows-only checks).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ria_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the corpus-curation pipeline over sf0.001 documents —
    exact-dedup fingerprint + MinHash signature digest + quality scores,
    one row per surviving document."""
    sf = "/root/testdata/sf0.001"
    quality = Q.q_text_quality(spark, sf)
    exact = Q.q_dedup_exact(spark, sf)
    sig = (
        Q.q_minhash_signatures(spark, sf)
        .groupBy("doc_id")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(
            F.concat(F.col("j").cast("string"), F.lit("="),
                     F.col("minhash").cast("string")))))).alias("minhash_sig"))
    )
    return (
        exact.join(quality, "doc_id").join(sig, "doc_id")
        .select("doc_id", "content_md5", "minhash_sig", "n_tokens",
                "stopword_ratio")
    )


def _q_crawl_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule flagship: full crawl of a deterministic synthetic
    world (frontier + Bloom seen-set + politeness + retries), returning the
    final cars table.  Not SQL-expressible -> rows-only driver check; the
    exact reference-equivalence proof lives in tests/test_crawl_golden.py."""
    from auto_ria_spark.config import CrawlConfig
    from auto_ria_spark.plans.crawl import CrawlEngine
    from auto_ria_spark.sources import worldgen

    cfg = CrawlConfig(host_budget=100, phone_budget=100, backoff_base_s=1,
                      wave_seconds=5, num_shards=4, shuffle_partitions=8)
    world = worldgen.build_world_local(1, 60, 20)
    pages = spark.createDataFrame(world, schema=worldgen.PAGES_SCHEMA)
    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="crawl_e2e_"), cfg,
                      pages=pages)
    eng.run(seeds=worldgen.seed_rows(1), max_waves=60)
    return eng.cars_final().orderBy("discovery_rank")


def _q_corpus_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint invariant: decode the corpus image bytes (mapInPandas) and
    verify PSNR>=40dB (lossy) / bit-exact (png) + caption + phash per row.
    Binary codec work -> rows-only driver check."""
    from auto_ria_spark.functions.corpus import verify_corpus
    from auto_ria_spark.sources import worldgen

    corpus = worldgen.corpus_df(spark, 64, partitions=4)
    return verify_corpus(corpus)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = dict(Q.queries())
    qs["crawl_e2e"] = _q_crawl_e2e
    qs["corpus_verify"] = _q_corpus_verify
    return qs


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
