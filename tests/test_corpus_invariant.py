"""Per-row image invariant (BASELINE.json input_hint): decoded-pixel
allclose — PSNR >= 40 dB for lossy fmt, bit-exact for png — plus caption
equality and phash stability, over the corpus table via mapInPandas."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from auto_ria_spark.functions import imaging
from auto_ria_spark.functions.corpus import decode_stats, verify_corpus
from auto_ria_spark.sources import worldgen


def test_corpus_invariant_distributed(spark):
    corpus = worldgen.corpus_df(spark, 64, partitions=4).cache()
    assert corpus.count() == 64
    verdicts = verify_corpus(corpus).cache()
    bad = verdicts.filter(
        ~F.col("pixel_ok") | ~F.col("caption_ok") | ~F.col("phash_ok")
        | ~F.col("w_ok") | ~F.col("h_ok")
    )
    assert bad.count() == 0, bad.limit(5).collect()
    # lossy rows genuinely lossy but >= 40 dB; png rows exact
    jpeg = verdicts.filter(F.col("fmt") == "jpeg")
    assert jpeg.count() > 0
    assert jpeg.agg(F.min("psnr")).first()[0] >= 40.0


def test_codecs_roundtrip_local():
    px = worldgen.gen_pixels(7)
    assert np.array_equal(imaging.decode_png(imaging.encode_png(px)), px)
    dec = imaging.decode_fjpg(imaging.encode_fjpg(px, 90))
    assert dec.shape == px.shape
    assert imaging.psnr(px, dec) >= 40.0


def test_decode_stats_stage(spark):
    corpus = worldgen.corpus_df(spark, 16, partitions=2)
    st = decode_stats(corpus)
    rows = st.collect()
    assert len(rows) == 16
    joined = corpus.select("image_id", "phash").join(
        st.select("image_id", F.col("phash").alias("phash2")), "image_id")
    assert joined.filter(F.col("phash") != F.col("phash2")).count() == 0
