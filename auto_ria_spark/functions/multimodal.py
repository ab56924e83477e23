"""Multimodal column operators — image resize, video frame-sampling, audio
feature extraction.  All Arrow-batched ``mapInPandas`` over opaque
``binary`` columns with typed metadata (the training-data-pipeline shape
the 100-TB corpus needs); never row-at-a-time Python UDFs.

Codec policy (sandbox has no image/audio/video libraries):

* **images** — the repo's own PNG/DCT codec (functions/imaging.py): real
  decode/encode, deterministic.
* **audio** — raw PCM16 is pure numpy: real decode + features.  Container
  formats (mp3/ogg/flac) are gated behind an import-try and raise a
  clearly-marked NotImplementedError here.
* **video** — a deterministic frame container ("FVID": little-endian
  frame count + length-prefixed encoded frames) exercises the REAL Spark
  plumbing (schema, Arrow batch shape, per-frame decode, sampling
  stride); foreign codecs (h264/vp9) raise NotImplementedError the same
  way.

Arrow batch sizing note: rows carry multi-KB..MB payloads — sessions cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py) so a batch
of binaries stays memory-bounded (SURVEY.md §4).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from auto_ria_spark.functions import imaging

# --------------------------------------------------------------------------
# image resize
# --------------------------------------------------------------------------
RESIZE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string")


def _area_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area-average resample (box filter) — pure numpy,
    loop-free: ``np.add.reduceat`` sums each output cell's pixel block on
    both axes, then one division by the block areas.  Downscale only (this
    is the thumbnail stage); upscaling raises instead of producing the
    empty-slice NaN garbage the old per-pixel kernel silently cast.

    Block sums of uint8 values are exact integers in float64 (< 2^53), so
    the vectorized quotient is bit-identical to the naive per-pixel
    mean the pure-Python oracle computes (oracle.resize_reference)."""
    h, w = px.shape[0], px.shape[1]
    if out_h > h or out_w > w:
        raise ValueError(
            f"_area_resize is a downscale (thumbnail) stage: "
            f"({w}x{h}) -> ({out_w}x{out_h}) upscales")
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(int)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(int)
    acc = px.astype(np.float64)
    rowsum = np.add.reduceat(acc, ys[:-1], axis=0)
    blocksum = np.add.reduceat(rowsum, xs[:-1], axis=1)
    areas = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    return (blocksum / areas[:, :, None]).round().astype(np.uint8)


def resize_images(corpus, out_w: int, out_h: int, fmt: str = "png"):
    """Decode -> box-filter resample to (out_w, out_h) -> re-encode.
    Input needs (image_id, bytes); output carries the new payload +
    dimensions.  The thumbnail stage of a multimodal training pipeline."""

    def stage(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px = imaging.decode_image(bytes(data))
                small = _area_resize(px, out_w, out_h)
                rows.append((iid, imaging.encode_image(small, fmt),
                             out_w, out_h, fmt))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return corpus.select("image_id", "bytes").mapInPandas(
        stage, schema=RESIZE_SCHEMA)


# --------------------------------------------------------------------------
# video frame sampling (FVID deterministic container; real codecs stubbed)
# --------------------------------------------------------------------------
_FVID_MAGIC = b"FVID"
FRAME_SCHEMA = ("video_id string, frame_index int, bytes binary,"
                " w int, h int")


def encode_fvid(frames: list[bytes]) -> bytes:
    """Pack encoded frames into the deterministic FVID container."""
    out = [_FVID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def _decode_fvid(data: bytes) -> list[bytes]:
    if data[:4] != _FVID_MAGIC:
        # real-codec decode is NOT implemented in this sandbox (no
        # ffmpeg/pyav); the plumbing below is codec-agnostic
        raise NotImplementedError(
            "only the deterministic FVID container decodes in-sandbox; "
            "swap _decode_fvid for an ffmpeg/pyav demuxer in production")
    (n,) = struct.unpack_from("<I", data, 4)
    off, frames = 8, []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        frames.append(data[off:off + ln])
        off += ln
    return frames


def sample_frames(videos, every_n: int = 2):
    """Every ``every_n``-th frame of each video, decoded to verify and
    re-emitted as one row per kept frame (posexplode-shaped output from a
    mapInPandas stage — frame extraction cannot be a column expression).
    Input needs (video_id, bytes)."""

    def stage(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                for idx, frame in enumerate(_decode_fvid(bytes(data))):
                    if idx % every_n:
                        continue
                    px = imaging.decode_image(frame)
                    rows.append((vid, idx, frame, px.shape[1], px.shape[0]))
            yield pd.DataFrame(
                rows,
                columns=["video_id", "frame_index", "bytes", "w", "h"])

    return videos.select("video_id", "bytes").mapInPandas(
        stage, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# audio features (raw PCM16 — real numpy decode; containers stubbed)
# --------------------------------------------------------------------------
AUDIO_SCHEMA = ("audio_id string, n_samples long, duration_s double,"
                " rms double, peak double, zero_crossings long")


def pcm16_features(audio, sample_rate: int = 16_000):
    """Feature-extract over raw little-endian PCM16 mono ``bytes``:
    duration, RMS, peak, zero-crossing count — the corpus-filtering
    primitives for an audio modality.  Container formats (mp3/flac/ogg)
    need a decoder this sandbox does not ship; gate them like so:

        try:
            import soundfile  # noqa
        except ImportError:
            raise NotImplementedError("PCM16 only in-sandbox")
    """

    def stage(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                x = np.frombuffer(bytes(data), np.int16).astype(np.float64)
                x /= 32768.0
                n = len(x)
                zc = int(np.count_nonzero(np.diff(np.signbit(x))))
                rows.append((
                    aid, n, n / sample_rate,
                    float(np.sqrt(np.mean(x * x))) if n else 0.0,
                    float(np.abs(x).max()) if n else 0.0, zc))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "n_samples", "duration_s", "rms", "peak",
                "zero_crossings"])

    return audio.select("audio_id", "bytes").mapInPandas(
        stage, schema=AUDIO_SCHEMA)
