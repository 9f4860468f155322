"""Deterministic image codecs, PSNR, and perceptual hash (SURVEY.md §2.8 F13).

PIL is not available in this container, so the "png"/"jpeg" formats of
the `input_hint` image table are implemented as deterministic
stand-in codecs with the same *testable properties* as the real ones:

- ``png``  → lossless: zlib-compressed raw RGB; decode is bit-exact.
- ``jpeg`` → lossy: channel quantization (q controls step) then zlib;
  decode error bounded by the quantization step, giving PSNR ≥ 40 dB
  for the default quality (step 4 → max abs error 2 → PSNR ≈ 43 dB).

The container format is ``FIMG | fmt(1B) | step(1B) | w(u16) | h(u16)
| zlib(payload)``. The Ray-side plumbing (binary column, batch sizes,
actor-pool decode stage, schema) is real and tested; swapping in PIL
later touches only ``encode_image``/``decode_image``.

Invariant verified by tests (BASELINE.json input_hint): every stored
row decodes; PSNR≥40 dB vs source pixels for "jpeg", bit-exact for
"png"; caption string equality.
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC = b"FIMG"
_FMT_CODE = {"png": 0, "jpeg": 1}
_CODE_FMT = {v: k for k, v in _FMT_CODE.items()}
JPEG_STEP = 4  # quantization step for the lossy path (≈43 dB PSNR)


def encode_image(pixels: np.ndarray, fmt: str = "png") -> bytes:
    """Encode an (h, w, 3) uint8 array into the stand-in container."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w = pixels.shape[:2]
    step = 1
    payload = pixels
    if fmt == "jpeg":
        step = JPEG_STEP
        payload = (pixels // step) * step + step // 2
        payload = payload.astype(np.uint8)
    header = MAGIC + bytes([_FMT_CODE[fmt], step]) + w.to_bytes(2, "big") + h.to_bytes(2, "big")
    return header + zlib.compress(payload.tobytes(), level=1)


def decode_image(data: bytes) -> np.ndarray:
    """Decode container bytes → (h, w, 3) uint8 array."""
    if data[:4] != MAGIC:
        raise ValueError("not a FIMG container (real png/jpeg decode needs PIL: stubbed)")
    w = int.from_bytes(data[6:8], "big")
    h = int.from_bytes(data[8:10], "big")
    raw = zlib.decompress(data[10:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def image_format(data: bytes) -> str:
    if data[:4] != MAGIC:
        raise ValueError("not a FIMG container")
    return _CODE_FMT[data[4]]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images.

    Integer sum-of-squares (exact; diff² ≤ 255² and the int64 total
    cannot overflow below 2^45 pixels) — same mse as the float64 path
    at a fraction of the conversion cost."""
    diff = a.astype(np.int32) - b.astype(np.int32)
    num = int(np.sum(diff * diff, dtype=np.int64))
    if num == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(num / diff.size)


def _block_mean_8x8(gray: np.ndarray) -> np.ndarray:
    """Mean-pool a 2-D array to 8x8 (simple deterministic resize).

    Vectorized: two ``np.add.reduceat`` passes instead of 64 slice
    ``.mean()`` calls (the per-block loop was ~80% of phash64's cost).
    Degenerate tiny inputs (<8 px a side) keep the slice-loop path."""
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    if h < 8 or w < 8:
        out = np.empty((8, 8), dtype=np.float64)
        for i in range(8):
            for j in range(8):
                out[i, j] = gray[
                    ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)
                ].mean()
        return out
    rows = np.add.reduceat(gray.astype(np.float64), ys[:-1], axis=0)
    cells = np.add.reduceat(rows, xs[:-1], axis=1)
    counts = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    return cells / counts


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8x8 block-mean luminance vs median.

    Signed int64 (two's complement) to fit the input_hint's
    ``phash:int64`` column.
    """
    h, w = pixels.shape[:2]
    if h < 8 or w < 8:
        gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        blocks = _block_mean_8x8(gray)
    else:
        # integer per-channel block sums first (exact, two reduceat
        # passes over the uint8 data), THEN luminance of the 8x8 means:
        # 192 float ops replace a full-resolution float64 matmul.
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        rows = np.add.reduceat(pixels, ys[:-1], axis=0, dtype=np.int64)
        cells = np.add.reduceat(rows, xs[:-1], axis=1)  # (8, 8, 3) int64
        counts = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
        blocks = (cells @ np.array([0.299, 0.587, 0.114])) / counts
    flat = blocks.ravel()
    part = np.partition(flat, (31, 32))
    median = (part[31] + part[32]) / 2.0  # == np.median for n=64
    bits = flat > median
    # packbits puts bits[0] in the MSB — identical to the shift loop
    value = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return value - (1 << 64) if value >= (1 << 63) else value


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# -- synthetic video container -----------------------------------------------
# A trivial deterministic multi-frame container (magic + frame index +
# concatenated encoded frames) standing in for mp4/webm, which need a
# real decoder this container lacks. The Ray-side plumbing (binary
# column in, sampled frames out, actor pools, small batches) is real.

_VIDEO_MAGIC = b"VSYN"


def encode_video(frames: list, fmt: str = "png") -> bytes:
    """frames: list of (h, w, 3) uint8 arrays → container bytes."""
    payloads = [encode_image(f, fmt) for f in frames]
    out = bytearray(_VIDEO_MAGIC)
    out += len(payloads).to_bytes(4, "little")
    for p in payloads:
        out += len(p).to_bytes(4, "little")
    for p in payloads:
        out += p
    return bytes(out)


def decode_video(data: bytes) -> list:
    """Container bytes → list of per-frame ENCODED payloads (decode a
    frame with :func:`decode_image`)."""
    if data[:4] != _VIDEO_MAGIC:
        raise ValueError("not a VSYN container")
    n = int.from_bytes(data[4:8], "little")
    lens = [int.from_bytes(data[8 + 4 * i : 12 + 4 * i], "little") for i in range(n)]
    off = 8 + 4 * n
    frames = []
    for ln in lens:
        frames.append(data[off : off + ln])
        off += ln
    return frames
