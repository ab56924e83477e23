"""Image codecs + perceptual hashing — numpy-only, deterministic.

The corpus table (BASELINE.json input_hint) carries encoded image bytes.
Pillow is not available in this sandbox, so:

* ``fmt="png"``   — a real, spec-conformant PNG codec (8-bit RGB, zlib,
  filter 0). Lossless: decode(encode(x)) is bit-exact. Any standard PNG
  reader can open our files.
* ``fmt="jpeg"``  — JPEG-like lossy DCT codec used as a deterministic
  stand-in: BT.601 YCbCr + 8x8 block DCT + standard JPEG quantization
  tables scaled by quality + zlib entropy stage (magic ``FJPG``). It is
  *lossy in the same way JPEG is* (quantized DCT coefficients), so the
  PSNR >= 40 dB per-row invariant is meaningful. When Pillow IS importable
  (real cluster image), `encode_image`/`decode_image` transparently use
  real JPEG instead — the Spark-side plumbing (binary column, pandas UDFs,
  Arrow batch sizing) is identical either way.

All functions are driver/executor-side plain Python called from pandas
UDFs / ``mapInPandas`` over Arrow batches — never per-row Spark UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # real-image path on clusters that have Pillow
    from PIL import Image  # noqa: F401
    import io

    _HAVE_PIL = True
except Exception:  # pragma: no cover - sandbox has no Pillow
    _HAVE_PIL = False

# --------------------------------------------------------------------------
# PNG (real format, lossless)
# --------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 -> PNG bytes (filter 0 rows)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    idat = b""
    h = 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    filters = raw[:, 0]
    pix = raw[:, 1:].astype(np.int32).reshape(h, w, 3)
    out = np.zeros_like(pix)
    for y in range(h):
        f = filters[y]
        row = pix[y].copy()
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub
            for x in range(w):
                row[x] = (row[x] + (out[y, x - 1] if x else 0)) % 256
            out[y] = row
        elif f == 2:  # Up
            out[y] = (row + (out[y - 1] if y else 0)) % 256
        else:  # pragma: no cover - our encoder emits filter 0
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8)


# --------------------------------------------------------------------------
# JPEG-style lossy DCT codec (deterministic stand-in; magic FJPG)
# --------------------------------------------------------------------------
_QY = np.array(  # standard JPEG luminance quantization table (Annex K)
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_QC = np.array(  # standard chrominance table
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


_D8 = _dct_matrix(8)


def _scale_q(q: np.ndarray, quality: int) -> np.ndarray:
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    t = np.floor((q * s + 50) / 100)
    return np.clip(t, 1, 255)


def _blockify(ch: np.ndarray) -> np.ndarray:
    h, w = ch.shape
    return ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(b: np.ndarray) -> np.ndarray:
    nh, nw = b.shape[:2]
    return b.transpose(0, 2, 1, 3).reshape(nh * 8, nw * 8)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128, ycc[..., 2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


_FJPG_MAGIC = b"FJPG"


def encode_fjpg(rgb: np.ndarray, quality: int = 90) -> bytes:
    h, w, _ = rgb.shape
    ph, pw = -h % 8, -w % 8
    img = np.pad(rgb.astype(np.float64), ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(img) - 128.0
    coeffs = []
    for ci in range(3):
        q = _scale_q(_QY if ci == 0 else _QC, quality)
        blocks = _blockify(ycc[..., ci])
        dct = np.einsum("ij,abjk,lk->abil", _D8, blocks, _D8)
        coeffs.append(np.round(dct / q).astype(np.int16))
    payload = zlib.compress(np.stack(coeffs).tobytes(), 6)
    return _FJPG_MAGIC + struct.pack(">HHB", w, h, quality) + payload


def decode_fjpg(data: bytes) -> np.ndarray:
    assert data[:4] == _FJPG_MAGIC, "not an FJPG stream"
    w, h, quality = struct.unpack(">HHB", data[4:9])
    hh, ww = h + (-h % 8), w + (-w % 8)
    arr = np.frombuffer(zlib.decompress(data[9:]), np.int16).reshape(
        3, hh // 8, ww // 8, 8, 8
    )
    chans = []
    for ci in range(3):
        q = _scale_q(_QY if ci == 0 else _QC, quality)
        dct = arr[ci].astype(np.float64) * q
        blocks = np.einsum("ji,abjk,kl->abil", _D8, dct, _D8)
        chans.append(_unblockify(blocks))
    ycc = np.stack(chans, axis=-1) + 128.0
    rgb = _ycbcr_to_rgb(ycc)[:h, :w]
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# format dispatch
# --------------------------------------------------------------------------
def encode_image(rgb: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    if fmt == "png":
        return encode_png(rgb)
    if fmt == "jpeg":
        if _HAVE_PIL:  # pragma: no cover
            buf = io.BytesIO()
            Image.fromarray(rgb).save(buf, "JPEG", quality=quality)
            return buf.getvalue()
        return encode_fjpg(rgb, quality)
    raise ValueError(f"unknown fmt {fmt}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:4] == _FJPG_MAGIC:
        return decode_fjpg(data)
    if _HAVE_PIL:  # pragma: no cover
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise ValueError("unknown image container")


# --------------------------------------------------------------------------
# metrics + perceptual hash
# --------------------------------------------------------------------------
def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


_D32 = _dct_matrix(32)


def phash64(rgb: np.ndarray) -> int:
    """64-bit perceptual hash: luma -> 32x32 area-sample -> DCT -> top-left
    8x8 (minus DC) thresholded at the median -> packed signed int64."""
    y = _rgb_to_ycbcr(rgb.astype(np.float64))[..., 0]
    h, w = y.shape
    yi = ((np.arange(32) + 0.5) * h / 32).astype(int)
    xi = ((np.arange(32) + 0.5) * w / 32).astype(int)
    small = y[np.ix_(yi, xi)]
    dct = _D32 @ small @ _D32.T
    block = dct[:8, :8].flatten()[1:]
    med = np.median(block)
    bits = (block > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
