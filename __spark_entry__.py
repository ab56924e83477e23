"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship pipeline over /root/testdata/sf0.001 parquet.
``queries`` — one entry per implemented operator (SURVEY.md §2 + the
              training-data ops); each callable takes (spark, sf_dir).
``oracle_sql`` — DuckDB-equivalent SQL per query.  The two non-relational
              flagships (the crawl wave loop, the binary image verify) run
              over seed-deterministic worlds, so their expected rows are
              emitted by the pure-Python reference oracle as
              ``SELECT ... FROM (VALUES ...)`` queries — every entry gets
              the full rows+schema+hash gate.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ria_spark import queries as Q


@contextmanager
def _shuffle_conf(spark: SparkSession, n: int):
    """Right-size spark.sql.shuffle.partitions around an entry that
    EXECUTES inside its callable (the crawl engines, the streaming
    query): the harness session defaults to 200, which turns every tiny
    state join into 200 near-empty tasks.  Restored on exit so sibling
    entries see the session unchanged."""
    old = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the corpus-curation pipeline over sf0.001 documents —
    exact-dedup fingerprint + MinHash signature digest + quality scores,
    one row per surviving document.

    The content hash and quality measures are per-row projections over
    one documents frame, joined to the MinHash signature digest (the
    codegen explode + 8-way min aggregate of queries._minhash_sig8);
    the exchanges are the signature aggregation, the broadcast-free
    doc_id join, and the exact-dedup window on content_md5."""
    from pyspark.sql import Window

    sf = "/root/testdata/sf0.001"
    d = Q.load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.size(F.filter(toks, lambda w: w.isin("the", "a", "of", "and")))
    sig = Q._minhash_arr(d).select(
        "doc_id", Q.minhash_digest("ms").alias("minhash_sig"))
    rowed = d.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.size(toks).alias("n_tokens"),
        F.round(stop / F.size(toks), 4).alias("stopword_ratio"),
    ).join(sig, "doc_id")
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    return (
        rowed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_md5", "minhash_sig", "n_tokens",
                "stopword_ratio")
    )


# crawl_e2e world + config — shared by the Spark query and its VALUES oracle
_E2E_CFG = dict(host_budget=100, phone_budget=100, backoff_base_s=1,
                wave_seconds=5, num_shards=4, shuffle_partitions=8)
_E2E_WORLD = (1, 60, 20)  # hosts, cars/host, page size
_E2E_COLS = [
    ("url", "VARCHAR"), ("title", "VARCHAR"), ("price_usd", "INTEGER"),
    # odometer is nullable -> transported as VARCHAR on BOTH sides (a
    # nullable INTEGER degrades to float64 in DuckDB's pandas bridge,
    # which breaks value normalization for the whole column)
    ("odometer", "VARCHAR"), ("username", "VARCHAR"),
    ("phone_number", "VARCHAR"), ("image_url", "VARCHAR"),
    ("image_id", "VARCHAR"), ("images_count", "INTEGER"),
    ("car_number", "VARCHAR"), ("car_vin", "VARCHAR"),
    ("datetime_found", "BIGINT"), ("host", "VARCHAR"),
    ("discovery_rank", "BIGINT"),
]


def _q_crawl_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule flagship: full crawl of a deterministic synthetic
    world (frontier + Bloom seen-set + politeness + retries), returning the
    final cars table.  The world is seed-fixed, so the pure-Python reference
    oracle emits the expected rows as a VALUES query (oracle_sql below) —
    full rows+schema+hash driver gate; the field-by-field equivalence proof
    also lives in tests/test_crawl_golden.py."""
    from auto_ria_spark.config import CrawlConfig
    from auto_ria_spark.plans.crawl import CrawlEngine
    from auto_ria_spark.sources import worldgen

    cfg = CrawlConfig(**_E2E_CFG)
    world = worldgen.build_world_local(*_E2E_WORLD)
    with _shuffle_conf(spark, cfg.shuffle_partitions):
        pages = worldgen.pages_local_df(spark, world)
        eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="crawl_e2e_"), cfg,
                          pages=pages)
        eng.run(seeds=worldgen.seed_rows(1), max_waves=60)
    return eng.cars_final().select(
        "url", "title", "price_usd",
        F.col("odometer").cast("string").alias("odometer"),
        "username", "phone_number", "image_url", "image_id", "images_count",
        "car_number", "car_vin",
        F.unix_timestamp("datetime_found").cast("long")
        .alias("datetime_found"),
        "host", "discovery_rank",
    ).orderBy("discovery_rank")


def _q_crawl_e2e_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME flagship crawl over the HTML-rendered world through the P1
    selector-cascade extraction stage (functions/html_extract.py) — same
    facts, same VALUES oracle, so the driver's rows+schema+hash gate
    covers the real-HTML path end-to-end."""
    from auto_ria_spark.config import CrawlConfig
    from auto_ria_spark.plans.crawl import CrawlEngine
    from auto_ria_spark.sources import worldgen

    cfg = CrawlConfig(payload_format="html", **_E2E_CFG)
    world = worldgen.build_world_local(*_E2E_WORLD, fmt="html")
    with _shuffle_conf(spark, cfg.shuffle_partitions):
        pages = worldgen.pages_local_df(spark, world)
        eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="crawl_e2e_html_"),
                          cfg, pages=pages)
        eng.run(seeds=worldgen.seed_rows(1), max_waves=60)
    return eng.cars_final().select(
        "url", "title", "price_usd",
        F.col("odometer").cast("string").alias("odometer"),
        "username", "phone_number", "image_url", "image_id", "images_count",
        "car_number", "car_vin",
        F.unix_timestamp("datetime_found").cast("long")
        .alias("datetime_found"),
        "host", "discovery_rank",
    ).orderBy("discovery_rank")


def _q_crawl_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness re-queue round-trip under the cuckoo seen-filter: full
    crawl, mark the 3 lowest-ranked saved listings stale (recrawl()
    deletes their rows + phone fingerprints and re-enqueues them under
    their original ranks), run to drain again — the refreshed cars table
    must be bit-identical to the original crawl's, so it shares
    crawl_e2e's VALUES oracle.  Driver-gates the cuckoo deletion path
    end-to-end (reference analogue: the 'listing updated, scrape again'
    re-check, app/utils/db_utils.py:48-76)."""
    from auto_ria_spark.config import CrawlConfig
    from auto_ria_spark.plans.crawl import CrawlEngine
    from auto_ria_spark.sources import worldgen

    cfg = CrawlConfig(seen_filter="cuckoo",
                      cuckoo_buckets_per_shard=1 << 10, **_E2E_CFG)
    world = worldgen.build_world_local(*_E2E_WORLD)
    with _shuffle_conf(spark, cfg.shuffle_partitions):
        pages = worldgen.pages_local_df(spark, world)
        eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="crawl_recrawl_"),
                          cfg, pages=pages)
        eng.run(seeds=worldgen.seed_rows(1), max_waves=60)
        stale = [r.url for r in eng.cars_final()
                 .orderBy("discovery_rank").limit(3).collect()]
        eng.recrawl(stale)
        eng.run(seeds=None, max_waves=60)
    return eng.cars_final().select(
        "url", "title", "price_usd",
        F.col("odometer").cast("string").alias("odometer"),
        "username", "phone_number", "image_url", "image_id", "images_count",
        "car_number", "car_vin",
        F.unix_timestamp("datetime_found").cast("long")
        .alias("datetime_found"),
        "host", "discovery_rank",
    ).orderBy("discovery_rank")


_E2E_ORACLE_CACHE: list = []


def _crawl_e2e_oracle() -> str:
    """Expected cars rows from the pure-Python reference oracle, emitted as
    a DuckDB VALUES query (deterministic world, seed 42).  Shared verbatim
    by crawl_e2e and crawl_e2e_html (same facts, different wire format)."""
    if _E2E_ORACLE_CACHE:
        return _E2E_ORACLE_CACHE[0]
    from auto_ria_spark.config import CrawlConfig
    from auto_ria_spark.oracle import crawl_oracle, values_sql
    from auto_ria_spark.sources import worldgen

    cfg = CrawlConfig(**_E2E_CFG)
    world = worldgen.build_world_local(*_E2E_WORLD)
    res = crawl_oracle(world, worldgen.seed_rows(1), cfg)
    rows = []
    for c in sorted(res.cars, key=lambda c: c["discovery_rank"]):
        r = dict(c)
        r["odometer"] = None if c["odometer"] is None else str(c["odometer"])
        r["datetime_found"] = cfg.wave_ts_base
        rows.append(r)
    _E2E_ORACLE_CACHE.append(values_sql(rows, _E2E_COLS))
    return _E2E_ORACLE_CACHE[0]


_CORPUS_N = 64
_CORPUS_COLS = [
    ("image_id", "VARCHAR"), ("fmt", "VARCHAR"), ("psnr", "DOUBLE"),
    ("pixel_ok", "BOOLEAN"), ("caption_ok", "BOOLEAN"),
    ("phash_ok", "BOOLEAN"), ("w_ok", "BOOLEAN"), ("h_ok", "BOOLEAN"),
]


def _q_corpus_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint invariant: decode the corpus image bytes (mapInPandas) and
    verify PSNR>=40dB (lossy) / bit-exact (png) + caption + phash per row.
    The corpus is seed-deterministic, so the expected verdicts (including
    the exact PSNR doubles) are emitted as a VALUES oracle below."""
    from auto_ria_spark.functions.corpus import verify_corpus
    from auto_ria_spark.sources import worldgen

    corpus = worldgen.corpus_df(spark, _CORPUS_N, partitions=4)
    return verify_corpus(corpus)


def _corpus_verify_oracle() -> str:
    from auto_ria_spark.oracle import corpus_verify_expected, values_sql

    return values_sql(corpus_verify_expected(_CORPUS_N), _CORPUS_COLS)


_RESIZE_N, _RESIZE_W, _RESIZE_H = 64, 16, 12
_RESIZE_COLS = [
    ("image_id", "VARCHAR"), ("w", "INTEGER"), ("h", "INTEGER"),
    ("fmt", "VARCHAR"), ("bytes_md5", "VARCHAR"),
]


def _q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail a deterministic corpus slice through the vectorized
    box-filter mapInPandas stage (functions/multimodal.py); the payload is
    reported as an md5 digest so the driver's value-hash gate covers the
    resized bytes, not just the dims.  The oracle recomputes every row
    with an INDEPENDENT per-pixel reference kernel (oracle.resize_reference)."""
    from auto_ria_spark.functions.multimodal import resize_images
    from auto_ria_spark.sources import worldgen

    corpus = worldgen.corpus_df(spark, _RESIZE_N, partitions=4)
    return resize_images(corpus, _RESIZE_W, _RESIZE_H).select(
        "image_id", "w", "h", "fmt", F.md5("bytes").alias("bytes_md5"))


def _image_resize_oracle() -> str:
    from auto_ria_spark.oracle import resize_expected, values_sql

    return values_sql(
        resize_expected(_RESIZE_N, _RESIZE_W, _RESIZE_H), _RESIZE_COLS)


_VIDEO_N, _VIDEO_FPV, _VIDEO_STRIDE = 12, 6, 2
_VIDEO_COLS = [
    ("video_id", "VARCHAR"), ("frame_index", "INTEGER"), ("w", "INTEGER"),
    ("h", "INTEGER"), ("frame_md5", "VARCHAR"),
]


def _q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample a deterministic FVID video corpus through the
    mapInPandas stage (functions/multimodal.sample_frames); frames are
    reported as md5 digests so the gate covers the extracted bytes.  The
    VALUES oracle replays the container walk in pure Python."""
    from auto_ria_spark.functions.multimodal import sample_frames
    from auto_ria_spark.sources import worldgen
    from auto_ria_spark.util import local_df

    vids = local_df(spark, worldgen.video_rows(_VIDEO_N, _VIDEO_FPV),
                    "video_id string, bytes binary")
    return sample_frames(vids, every_n=_VIDEO_STRIDE).select(
        "video_id", "frame_index", "w", "h",
        F.md5("bytes").alias("frame_md5"))


def _video_frames_oracle() -> str:
    from auto_ria_spark.oracle import values_sql, video_frames_expected

    return values_sql(
        video_frames_expected(_VIDEO_N, _VIDEO_FPV, _VIDEO_STRIDE),
        _VIDEO_COLS)


_AUDIO_N, _AUDIO_SR = 16, 8_000
_AUDIO_COLS = [
    ("audio_id", "VARCHAR"), ("n_samples", "BIGINT"),
    ("duration_s", "DOUBLE"), ("rms", "DOUBLE"), ("peak", "DOUBLE"),
    ("zero_crossings", "BIGINT"),
]


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM16 feature extraction over the deterministic audio clips
    (functions/multimodal.pcm16_features) — exact doubles gated by a
    VALUES oracle computed with the same reduction formulas."""
    from auto_ria_spark.functions.multimodal import pcm16_features
    from auto_ria_spark.sources import worldgen
    from auto_ria_spark.util import local_df

    clips = local_df(spark, worldgen.audio_rows(_AUDIO_N, _AUDIO_SR),
                     "audio_id string, bytes binary")
    return pcm16_features(clips, _AUDIO_SR)


def _audio_features_oracle() -> str:
    from auto_ria_spark.oracle import audio_features_expected, values_sql

    return values_sql(
        audio_features_expected(_AUDIO_N, _AUDIO_SR), _AUDIO_COLS)


_SESS_GAP_S = 1800
_SESS_BATCHES = 4


def _q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL STREAMING operator under the driver gate: gap
    sessionization via applyInPandasWithState (streaming/stateful.py),
    fed the events table as 4 time-ordered files -> 4 micro-batches
    (maxFilesPerTrigger=1, ascending mtimes), so per-key state provably
    carries across batch boundaries.  Emits CLOSED sessions; the DuckDB
    oracle is a batch gaps-and-islands query that excludes each user's
    final (still-open) session."""
    import glob
    import os
    import shutil

    from auto_ria_spark.streaming.stateful import (SESSION_SCHEMA,
                                                   sessionize)

    events = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("user_id", "ts", "value")
    tsl = F.col("ts").cast("timestamp").cast("long")
    qs = events.select(tsl.alias("t")).approxQuantile(
        "t", [i / _SESS_BATCHES for i in range(1, _SESS_BATCHES)], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    src = tempfile.mkdtemp(prefix="sess_src_")
    base = 1_700_000_000
    for i in range(_SESS_BATCHES):
        chunk = events.filter((tsl > bounds[i]) & (tsl <= bounds[i + 1]))
        tmp = tempfile.mkdtemp(prefix="sess_chunk_")
        chunk.repartition(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(src, f"batch{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (base + i, base + i))  # ascending batch order
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    closed: list = []
    with _shuffle_conf(spark, 8):
        q = (sessionize(stream, gap_s=_SESS_GAP_S)
             .writeStream.outputMode("append")
             .trigger(availableNow=True)
             .foreachBatch(lambda df, _: closed.extend(df.collect()))
             .start())
        q.awaitTermination()
    out = spark.createDataFrame(closed, schema=SESSION_SCHEMA)
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


_SESSIONIZE_ORACLE = f"""
    WITH m AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESS_GAP_S}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM m
    ), agg AS (
      SELECT user_id, sess_id,
             epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
             count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM s GROUP BY user_id, sess_id
    ), mx AS (
      SELECT user_id, max(sess_id) AS last_id FROM agg GROUP BY user_id
    )
    SELECT a.user_id, a.start_us, a.end_us, a.n_events, a.sum_value
    FROM agg a JOIN mx USING (user_id) WHERE a.sess_id <> mx.last_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = dict(Q.queries())
    qs["crawl_e2e"] = _q_crawl_e2e
    qs["crawl_e2e_html"] = _q_crawl_e2e_html
    qs["crawl_recrawl"] = _q_crawl_recrawl
    qs["corpus_verify"] = _q_corpus_verify
    qs["image_resize"] = _q_image_resize
    qs["video_frames"] = _q_video_frames
    qs["audio_features"] = _q_audio_features
    qs["sessionize_events"] = _q_sessionize_events
    return qs


def oracle_sql() -> dict[str, str]:
    sqls = Q.oracle_sql()
    sqls["crawl_e2e"] = _crawl_e2e_oracle()
    sqls["crawl_e2e_html"] = _crawl_e2e_oracle()
    sqls["crawl_recrawl"] = _crawl_e2e_oracle()
    sqls["corpus_verify"] = _corpus_verify_oracle()
    sqls["image_resize"] = _image_resize_oracle()
    sqls["video_frames"] = _video_frames_oracle()
    sqls["audio_features"] = _audio_features_oracle()
    sqls["sessionize_events"] = _SESSIONIZE_ORACLE
    return sqls
