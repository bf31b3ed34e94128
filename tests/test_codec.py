"""Codec invariants: the BASELINE.json input_hint per-row contract —
lossless exact roundtrip, lossy PSNR ≥ 40 dB, deterministic phash."""

from __future__ import annotations

import numpy as np
import pytest

from pegasus_spark.crawler.codec import (
    decode_image,
    encode_image,
    image_dims,
    phash64,
    psnr,
    synth_image,
)


@pytest.mark.parametrize("h,w", [(32, 32), (48, 64), (64, 48)])
def test_png_roundtrip_exact(h, w):
    arr = synth_image(f"t-{h}x{w}", h, w)
    out = decode_image(encode_image(arr, "png"))
    assert np.array_equal(arr, out)


@pytest.mark.parametrize("h,w", [(32, 32), (48, 64), (64, 64)])
def test_jpeg_psnr_above_40(h, w):
    arr = synth_image(f"j-{h}x{w}", h, w)
    out = decode_image(encode_image(arr, "jpeg"))
    assert out.shape == arr.shape
    assert psnr(arr, out) >= 40.0


def test_dims_header():
    arr = synth_image("dims", 48, 64)
    assert image_dims(encode_image(arr, "png")) == (48, 64)


def test_phash_deterministic_and_discriminative():
    a = synth_image("same-id", 64, 64)
    b = synth_image("same-id", 64, 64)
    c = synth_image("other-id", 64, 64)
    assert phash64(a) == phash64(b)
    assert phash64(a) != phash64(c)


def test_phash_survives_jpeg():
    arr = synth_image("jpeg-stable", 64, 64)
    out = decode_image(encode_image(arr, "jpeg"))
    # quantization noise flips at most a few of the 64 bits
    dist = bin(phash64(arr) ^ phash64(out)).count("1")
    assert dist <= 8


def test_synth_deterministic():
    assert np.array_equal(synth_image("x", 32, 32), synth_image("x", 32, 32))
