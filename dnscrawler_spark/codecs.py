"""Self-contained image codecs (no PIL in this environment — SURVEY §7.0).

Payload formats for the ``pages`` corpus (``fmt`` column):

- ``raw``  — header + raw uint8 RGB bytes (lossless)
- ``png``  — header + zlib-compressed raw bytes (lossless; our own
  container, named for the role it plays, not the PNG wire format)
- ``qjpg`` — header + zlib-compressed 6-bit-quantized bytes (lossy;
  quantization step 4, decode to bin midpoint ⇒ per-pixel |err| ≤ 2,
  PSNR ≈ 46 dB ≥ the 40 dB invariant from BASELINE.json input_hint)

Header: b"SGIM" | fmt:uint8 | w:uint16 | h:uint16 | c:uint8  (little-endian)

All functions are numpy-only and deterministic; used inside Arrow
``mapInPandas`` batches (per-image zlib is the irreducible Python cost —
there is no Spark builtin for codec work, which is exactly the case
where a vectorized-batch UDF is the sanctioned slow path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"SGIM"
_FMT_CODE = {"raw": 0, "png": 1, "qjpg": 2}
_FMT_NAME = {v: k for k, v in _FMT_CODE.items()}
_HEADER = struct.Struct("<4sBHHB")
QSTEP = 4  # qjpg quantization step

LOSSLESS_FMTS = frozenset({"raw", "png"})
ALL_FMTS = ("raw", "png", "qjpg")


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, c) uint8 array into the given format."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3:
        raise ValueError("pixels must be (h, w, c) uint8")
    h, w, c = pixels.shape
    head = _HEADER.pack(MAGIC, _FMT_CODE[fmt], w, h, c)
    if fmt == "raw":
        return head + pixels.tobytes()
    if fmt == "png":
        return head + zlib.compress(pixels.tobytes(), 6)
    if fmt == "qjpg":
        q = (pixels // QSTEP).astype(np.uint8)
        return head + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(blob: bytes) -> tuple[np.ndarray, str]:
    """Decode a payload back to ((h, w, c) uint8, fmt)."""
    magic, code, w, h, c = _HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("bad magic")
    body = blob[_HEADER.size :]
    fmt = _FMT_NAME[code]
    if fmt == "raw":
        arr = np.frombuffer(body, dtype=np.uint8)
    elif fmt == "png":
        arr = np.frombuffer(zlib.decompress(body), dtype=np.uint8)
    else:  # qjpg: decode to bin midpoint
        q = np.frombuffer(zlib.decompress(body), dtype=np.uint8)
        arr = (q.astype(np.uint16) * QSTEP + QSTEP // 2).clip(0, 255).astype(np.uint8)
    return arr.reshape(h, w, c), fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def payload_ok(blob: bytes, reference_pixels: np.ndarray, min_psnr_db: float = 40.0) -> bool:
    """Per-row payload invariant (BASELINE.json input_hint): decoded
    pixels must equal the reference exactly for lossless formats, or
    reach PSNR ≥ 40 dB for lossy ones.

    Hot path (r6, guide §1.2 step 2 — this runs once per fetched URL):
    lossless formats compare the decoded byte run directly (one memcmp)
    instead of materializing a per-pixel boolean array, and the lossy
    threshold is tested on the exact integer sum of squared error
    instead of a float64 mean + log10 — same verdict in every case
    (``mse = ssd/n`` exactly, both integer-valued float sums < 2^53, and
    ``psnr ≥ t ⟺ ssd·10^(t/10) ≤ 255²·n`` by monotonicity of log10).
    Shape/size mismatches fall back to the original decode path so the
    error/False behavior is unchanged."""
    magic, code, w, h, c = _HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("bad magic")
    body = blob[_HEADER.size :]
    fmt = _FMT_NAME[code]
    if fmt in LOSSLESS_FMTS:
        raw = body if fmt == "raw" else zlib.decompress(body)
        if (h, w, c) != reference_pixels.shape or len(raw) != reference_pixels.size:
            # original semantics: reshape raises on a size mismatch,
            # array_equal is False on a shape mismatch
            decoded = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
            return bool(np.array_equal(decoded, reference_pixels))
        return raw == reference_pixels.tobytes()
    q = np.frombuffer(zlib.decompress(body), dtype=np.uint8)
    arr = (q.astype(np.uint16) * QSTEP + QSTEP // 2).clip(0, 255).astype(np.uint8)
    decoded = arr.reshape(h, w, c)
    if decoded.shape != reference_pixels.shape:
        return psnr(decoded, reference_pixels) >= min_psnr_db
    d = decoded.ravel().astype(np.int64) - reference_pixels.ravel()
    ssd = int(np.dot(d, d))
    if ssd == 0:
        return True
    return ssd * (10.0 ** (min_psnr_db / 10.0)) <= 65025.0 * d.size
