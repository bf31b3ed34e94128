"""Hypothesis property tests (no Spark session — pure-python invariants the
engine's correctness rests on)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pegasus_spark.crawler.bloom import CuckooFilter, _positions, _set_bits, _test_bits
from pegasus_spark.crawler.codec import decode_image, encode_image, phash64, psnr
from pegasus_spark.crawler.urlnorm import canonicalize_str

# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

host = st.from_regex(r"[a-z]([a-z0-9-]{0,10}[a-z0-9])?(\.[a-z]{2,6}){1,2}", fullmatch=True)
path_seg = st.from_regex(r"[a-zA-Z0-9._~-]{1,8}", fullmatch=True)
urls = st.builds(
    lambda h, segs, slash, frag, scheme: (
        f"{scheme}://{h}/" + "/".join(segs) + ("/" if slash and segs else "")
        + (f"#{frag}" if frag else "")
    ),
    host, st.lists(path_seg, max_size=4), st.booleans(),
    st.one_of(st.none(), path_seg), st.sampled_from(["http", "https"]),
)


@settings(max_examples=200, deadline=None)
@given(urls)
def test_canonicalize_idempotent(u):
    c = canonicalize_str(u)
    assert canonicalize_str(c) == c


@settings(max_examples=200, deadline=None)
@given(urls)
def test_canonicalize_case_and_fragment_invariant(u):
    scheme, rest = u.split("://", 1)
    hostpart, _, path = rest.partition("/")
    shouty = f"{scheme.upper()}://{hostpart.upper()}/{path}"
    assert canonicalize_str(shouty) == canonicalize_str(u)
    assert canonicalize_str(u + "#x") == canonicalize_str(u.split("#")[0])


@settings(max_examples=100, deadline=None)
@given(urls)
def test_canonicalize_default_port_stripped(u):
    scheme, rest = u.split("://", 1)
    hostpart, slash, path = rest.partition("/")
    port = 443 if scheme == "https" else 80
    with_port = f"{scheme}://{hostpart}:{port}{slash}{path}"
    assert canonicalize_str(with_port) == canonicalize_str(u)


# --------------------------------------------------------------------------
# image codec
# --------------------------------------------------------------------------

dims = st.sampled_from([8, 16, 24, 32, 48, 64])


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.integers(0, 2**31 - 1))
def test_codec_png_lossless_any_dims(h, w, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_image(arr, "png")), arr)


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.integers(0, 2**31 - 1))
def test_codec_jpeg_psnr_bound(h, w, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_image(encode_image(arr, "jpeg"))
    assert psnr(arr, out) >= 40.0
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 2


@settings(max_examples=25, deadline=None)
@given(dims, dims, st.integers(0, 2**31 - 1))
def test_phash_in_signed_64(h, w, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    v = phash64(arr)
    assert -(2**63) <= v < 2**63


# --------------------------------------------------------------------------
# bloom bitset math
# --------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=200, unique=True))
def test_bloom_no_false_negatives_property(keys):
    m_bits, k = 1 << 12, 5
    bitset = np.zeros(m_bits // 8, dtype=np.uint8)
    h = np.array(keys, dtype=np.int64)
    _set_bits(bitset, _positions(h, m_bits, k))
    assert _test_bits(bitset, _positions(h, m_bits, k)).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(1, 2**62), min_size=1, max_size=100, unique=True),
    st.lists(st.integers(1, 2**62), min_size=1, max_size=100, unique=True),
)
def test_cuckoo_inserted_always_found(inserted, probes):
    cf = CuckooFilter(n_buckets=1 << 9)
    ok = [k for k in inserted if cf.insert(k)]
    for k in ok:
        assert cf.contains(k)
    # deleting a key never removes OTHER keys' membership
    if len(ok) > 1:
        cf.delete(ok[0])
        for k in ok[1:]:
            assert cf.contains(k)
