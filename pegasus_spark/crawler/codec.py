"""Deterministic image codec + perceptual hash (pure numpy).

The container has no PIL/cv2, so real PNG/JPEG codecs are unavailable. Per
the build contract the decode step may be a deterministic fake as long as the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch shape)
is real. This module is that fake, with honest lossless/lossy semantics:

- ``fmt="png"``  → zlib over raw RGB bytes — bit-exact roundtrip (the
  lossless `allclose` branch of the BASELINE.json input_hint invariant).
- ``fmt="jpeg"`` → 2-bit right-shift quantization (decode error ∈ [-2, 1])
  then zlib — worst-case MSE 1.5 ⇒ PSNR ≈ 46 dB, always ≥ the 40 dB bound
  the invariant requires for lossy formats.

Header: magic ``PSI1`` + fmt byte + uint16 h,w (big-endian), then the zlib
payload. Everything here is called from inside pandas/Arrow UDF batches
(vectorized over rows of tiny images), never per-row from the driver.

Reference parity: the payload columns (image_id, bytes, w, h, fmt, caption,
phash) ride where pegasus carried Apartment rows
(/root/reference/src/pegasus/lianjia/apartments.go:23-39).
"""

from __future__ import annotations

import zlib

import numpy as np

_MAGIC = b"PSI1"
_FMT_PNG = 0
_FMT_JPEG = 1


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt ∈ {png, jpeg}."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {arr.dtype}{arr.shape}")
    h, w = arr.shape[:2]
    if fmt == "png":
        code, payload = _FMT_PNG, arr.tobytes()
    elif fmt == "jpeg":
        code, payload = _FMT_JPEG, (arr >> 2).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    head = _MAGIC + bytes([code]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    return head + zlib.compress(payload, level=1)


def decode_image(data: bytes) -> np.ndarray:
    """Decode back to an (h, w, 3) uint8 array."""
    if data[:4] != _MAGIC:
        raise ValueError("bad image magic")
    code = data[4]
    h = int.from_bytes(data[5:7], "big")
    w = int.from_bytes(data[7:9], "big")
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, 3)
    if code == _FMT_JPEG:
        # dequantize to bin centers: values 0..63 → 2..254
        raw = (raw.astype(np.uint16) * 4 + 2).clip(0, 255).astype(np.uint8)
    return raw


def image_dims(data: bytes) -> tuple[int, int]:
    """(h, w) from the header without decompressing."""
    if data[:4] != _MAGIC:
        raise ValueError("bad image magic")
    return int.from_bytes(data[5:7], "big"), int.from_bytes(data[7:9], "big")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale → 8×8 block-mean downsample →
    threshold at the median. Signed int64 (Spark LongType has no unsigned).

    Deterministic and alignment-free for the fixture's 32/48/64-px images
    (all divisible by 8)."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    bh, bw = h // 8, w // 8
    small = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (small > np.median(small)).astype(np.uint64).ravel()
    val = np.uint64(0)
    for bit in bits:
        val = (val << np.uint64(1)) | bit
    return int(val.astype(np.int64))


def synth_image(image_id: str, h: int, w: int) -> np.ndarray:
    """Deterministic source pixels for an image_id (FIXTURES.md §1)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
