"""Self-contained pure-numpy image codecs: raw / ppm / png (zlib) / lossy.

The sandbox has no PIL/imageio, so the engine carries its own codecs. They
exist to make the pipeline's decode stage REAL (bytes -> pixels -> dimension
consistency check -> perceptual hash) and to make the PSNR>=40dB round-trip
invariant for the lossy format a meaningful check rather than a vacuous one
(BASELINE.json input_hint; SURVEY.md §7.0).

All encoders take/return ``np.ndarray`` of shape (h, w, 3), dtype uint8.

Formats:
  raw   -- magic ``RAW0`` + u32le w + u32le h + raw RGB bytes (lossless)
  ppm   -- binary P6 netpbm (lossless)
  png   -- real PNG: IHDR/IDAT/IEND chunks, color type 2, filter 0 rows,
           zlib deflate (lossless, readable by any standard viewer)
  lossy -- magic ``LSY0`` + u32le w + u32le h + zlib(6-bit-quantized RGB);
           uniform quantization step 4 with midpoint reconstruction gives
           MSE = 1.5 -> PSNR ≈ 46.4 dB (> 40 dB target, but genuinely lossy)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "ppm", "png", "lossy")
LOSSLESS = frozenset({"raw", "ppm", "png"})

_RAW_MAGIC = b"RAW0"
_LSY_MAGIC = b"LSY0"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class CodecError(ValueError):
    """Raised for undecodable or corrupt image payloads."""


# ---------------------------------------------------------------- raw

def encode_raw(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return _RAW_MAGIC + struct.pack("<II", w, h) + img.tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != _RAW_MAGIC:
        raise CodecError("bad raw magic")
    w, h = struct.unpack("<II", data[4:12])
    body = data[12:]
    if len(body) != w * h * 3:
        raise CodecError("raw payload size mismatch")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3).copy()


# ---------------------------------------------------------------- ppm

def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise CodecError("bad ppm magic")
    # header: P6 <ws> w <ws> h <ws> maxval <single ws> pixels
    parts = data.split(b"\n", 3)
    if len(parts) < 4:
        raise CodecError("truncated ppm header")
    try:
        w, h = (int(x) for x in parts[1].split())
        maxval = int(parts[2])
    except Exception as exc:  # noqa: BLE001
        raise CodecError(f"bad ppm header: {exc}") from exc
    if maxval != 255:
        raise CodecError("only maxval 255 supported")
    body = parts[3]
    if len(body) != w * h * 3:
        raise CodecError("ppm payload size mismatch")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3).copy()


# ---------------------------------------------------------------- png

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor RGB
    # filter byte 0 prepended to every scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_sub(row: np.ndarray) -> np.ndarray:
    out = row.astype(np.int32)
    for i in range(3, len(out)):
        out[i] = (out[i] + out[i - 3]) & 0xFF
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_MAGIC:
        raise CodecError("bad png magic")
    pos, w, h, idat = 8, None, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise CodecError("unsupported png variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise CodecError("png missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + w * 3
    if len(raw) != h * stride:
        raise CodecError("png payload size mismatch")
    rows = raw.reshape(h, stride)
    out = np.empty((h, w * 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        ftype, rest = rows[y, 0], rows[y, 1:]
        if ftype == 0:
            cur = rest
        elif ftype == 1:  # Sub
            cur = _unfilter_sub(rest)
        elif ftype == 2:  # Up
            cur = ((rest.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
        else:
            raise CodecError(f"unsupported png filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------- lossy

_Q_SHIFT = 2  # quantize to 6 bits: step 4, midpoint reconstruction


def encode_lossy(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    q = (img >> _Q_SHIFT).astype(np.uint8)
    return _LSY_MAGIC + struct.pack("<II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _LSY_MAGIC:
        raise CodecError("bad lossy magic")
    w, h = struct.unpack("<II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8)
    if len(q) != w * h * 3:
        raise CodecError("lossy payload size mismatch")
    step_mid = 1 << (_Q_SHIFT - 1)
    out = ((q.astype(np.uint16) << _Q_SHIFT) + step_mid).clip(0, 255).astype(np.uint8)
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------- dispatch

_ENCODERS = {"raw": encode_raw, "ppm": encode_ppm, "png": encode_png, "lossy": encode_lossy}
_DECODERS = {"raw": decode_raw, "ppm": decode_ppm, "png": decode_png, "lossy": decode_lossy}


def encode(img: np.ndarray, fmt: str) -> bytes:
    try:
        enc = _ENCODERS[fmt]
    except KeyError:
        raise CodecError(f"unknown format {fmt!r}") from None
    return enc(np.ascontiguousarray(img, dtype=np.uint8))


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Decode ``data`` as ``fmt``. Raises CodecError on unknown/corrupt input."""
    try:
        dec = _DECODERS[fmt]
    except KeyError:
        raise CodecError(f"unknown format {fmt!r}") from None
    try:
        return dec(data)
    except CodecError:
        raise
    except Exception as exc:  # zlib/struct errors on corrupt payloads
        raise CodecError(f"corrupt {fmt} payload: {exc}") from exc


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
