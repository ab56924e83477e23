"""Corpus (image+caption) verification operators — Arrow-batched pandas UDFs.

The input_hint contract (BASELINE.json): per-row invariant vs the reference
is decoded-pixel allclose (PSNR >= 40 dB for lossy formats, bit-exact for
lossless) plus caption equality.  These operators run that check as a
distributed ``mapInPandas`` stage over the binary ``bytes`` column — never
per-row Python UDFs.  Arrow batch size is bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py) because rows
carry multi-KB..MB encoded images (SURVEY.md §4 memory discipline).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from auto_ria_spark.functions import imaging

VERIFY_SCHEMA = (
    "image_id string, fmt string, psnr double, pixel_ok boolean,"
    " caption_ok boolean, phash_ok boolean, w_ok boolean, h_ok boolean"
)


def verify_corpus(corpus: DataFrame, psnr_lossy_db: float = 40.0) -> DataFrame:
    """Decode every row's ``bytes`` and check the per-row invariant against
    the deterministically regenerated reference pixels/caption.

    Returns one verdict row per image.  Engine-side decode + PSNR is the
    exact shape a production pixel-validation stage takes (the reference
    never stores pixels — it keeps only image_url/images_count, reference:
    app/core/models.py:60-61; the graft's corpus table carries the payload).
    """
    from auto_ria_spark.sources import worldgen

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                g = int(row["image_id"].removeprefix("img"))
                ref_px = worldgen.gen_pixels(g)
                got_px = imaging.decode_image(bytes(row["bytes"]))
                p = imaging.psnr(ref_px, got_px)
                if row["fmt"] == "png":
                    pixel_ok = bool(np.array_equal(ref_px, got_px))
                else:
                    pixel_ok = bool(p >= psnr_lossy_db)
                out.append({
                    "image_id": row["image_id"],
                    "fmt": row["fmt"],
                    "psnr": float(min(p, 1e9)),
                    "pixel_ok": pixel_ok,
                    "caption_ok": row["caption"] == worldgen.caption_for(g),
                    "phash_ok": imaging.hamming64(
                        int(row["phash"]), imaging.phash64(got_px)) == 0,
                    "w_ok": got_px.shape[1] == int(row["w"]),
                    "h_ok": got_px.shape[0] == int(row["h"]),
                })
            yield pd.DataFrame(out)

    return corpus.mapInPandas(check, schema=VERIFY_SCHEMA)


DECODE_STATS_SCHEMA = (
    "image_id string, w int, h int, mean_r double, mean_g double,"
    " mean_b double, phash long"
)


def decode_stats(corpus: DataFrame) -> DataFrame:
    """Decode + featurize stage (the multimodal-pipeline shape): per-image
    channel means and a recomputed perceptual hash, via ``mapInPandas``."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                px = imaging.decode_image(bytes(row["bytes"]))
                m = px.reshape(-1, 3).mean(axis=0)
                out.append({
                    "image_id": row["image_id"],
                    "w": px.shape[1], "h": px.shape[0],
                    "mean_r": float(m[0]), "mean_g": float(m[1]),
                    "mean_b": float(m[2]),
                    "phash": imaging.phash64(px),
                })
            yield pd.DataFrame(out)

    return corpus.select("image_id", "bytes").mapInPandas(
        stats, schema=DECODE_STATS_SCHEMA)
