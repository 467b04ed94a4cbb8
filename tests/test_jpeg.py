"""Baseline-JPEG codec tests (``operators/jpeg.py``).

The lossless entropy layer is covered by exact roundtrips (handcrafted
layouts + Hypothesis); the lossy pixel half is pinned against a naive
O(N^4) DCT reference and tight error bounds under the flat quant table.
The 3-component decode path (interleaved MCUs, chroma subsampling,
YCbCr→RGB) is driven by a handcrafted color stream built from the
module's own writer primitives — the encoder itself is grayscale-only,
so this is the only way to exercise that decoder surface hermetically.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finance_data_ingestion_pipeline_with_kafka_spark.operators.jpeg import (
    FLAT_QUANT,
    JPEG_BLOCKS_PER_ROW,
    JPEG_BYTES_PER_ROW,
    JPEG_MAX_BLOCK_ROWS,
    JPEG_RESTART_INTERVAL,
    ZIGZAG,
    _AC_BITS,
    _AC_ENC,
    _AC_SYMBOLS,
    _BitWriter,
    _DC_BITS,
    _DC_ENC,
    _DC_SYMBOLS,
    _dht_payload,
    _magnitude,
    _segment,
    decode_jpeg,
    decode_jpeg_coefficients,
    decode_jpeg_structure,
    encode_jpeg_coefficients,
    encode_jpeg_gray,
)

# ---------------------------------------------------------------------------
# Entropy layer — exact roundtrips


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot-checks: scan starts DC, then (0,1), (1,0), (2,0), (1,1)...
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[63] == 63


def test_marker_layout_handcrafted():
    coefs = np.zeros((2, 64), dtype=np.int64)
    s = encode_jpeg_coefficients(coefs, 2)
    assert s[:2] == b"\xff\xd8" and s[-2:] == b"\xff\xd9"
    # marker walk: APP0(JFIF), DQT, SOF0, DHT, DHT, SOS in order
    markers = []
    pos = 2
    while pos < len(s) - 2:
        assert s[pos] == 0xFF
        m = s[pos + 1]
        markers.append(m)
        if m == 0xDA:
            break
        pos += 2 + struct.unpack(">H", s[pos + 2 : pos + 4])[0]
    assert markers == [0xE0, 0xDB, 0xC0, 0xC4, 0xC4, 0xDA]
    # SOF0 geometry: 8-bit, 16x8, grayscale
    frame = decode_jpeg_structure(s)
    assert (frame.width, frame.height, frame.n_components) == (16, 8, 1)
    assert frame.sampling == [(1, 1)]


def test_all_zero_blocks_are_pure_eob():
    s = encode_jpeg_coefficients(np.zeros((4, 64), dtype=np.int64), 2)
    _, _, dec = decode_jpeg_coefficients(s)
    assert np.array_equal(dec, np.zeros((4, 64)))


def test_dc_prediction_chain():
    coefs = np.zeros((4, 64), dtype=np.int64)
    coefs[:, 0] = [100, -100, 0, 2000]  # diffs 100, -200, 100, 2000
    s = encode_jpeg_coefficients(coefs, 2)
    _, _, dec = decode_jpeg_coefficients(s)
    assert np.array_equal(dec, coefs)


def test_zrl_long_zero_runs():
    coefs = np.zeros((2, 64), dtype=np.int64)
    coefs[0, 63] = 5  # 62 zeros: 3×ZRL + (run=14,size=3)
    coefs[1, 17] = -1
    coefs[1, 63] = 1
    s = encode_jpeg_coefficients(coefs, 2)
    _, _, dec = decode_jpeg_coefficients(s)
    assert np.array_equal(dec, coefs)


def test_byte_stuffing_roundtrip():
    # All-4-bit DC (value 11 = 0b1011...) + 1-padding makes 0xFF bytes in
    # the entropy stream likely; force many and verify un-stuffing.
    coefs = np.zeros((8, 64), dtype=np.int64)
    coefs[:, 0] = 2047  # first diff 2047, rest 0 — spec max DC category
    coefs[:, 1:4] = 1023
    s = encode_jpeg_coefficients(coefs, 2)
    assert b"\xff\x00" in s  # stuffing actually happened
    _, _, dec = decode_jpeg_coefficients(s)
    assert np.array_equal(dec, coefs)


def test_restart_markers_and_dc_reset():
    rng = np.random.default_rng(3)
    coefs = rng.integers(-128, 128, size=(8, 64), dtype=np.int64)
    s = encode_jpeg_coefficients(coefs, 2, restart_interval=3)
    # DRI present with interval 3; RST0 then RST1 appear in the scan
    assert b"\xff\xdd\x00\x04\x00\x03" in s
    body = s[s.find(b"\xff\xda") :]
    assert b"\xff\xd0" in body and b"\xff\xd1" in body
    _, _, dec = decode_jpeg_coefficients(s)
    assert np.array_equal(dec, coefs)


def test_restart_interval_must_reset_dc_prediction():
    # Same coefficients with/without restarts must decode identically —
    # catching a decoder that forgets the prev_dc reset at RSTn.
    coefs = np.zeros((6, 64), dtype=np.int64)
    coefs[:, 0] = [500, 400, 300, 200, 100, 0]
    plain = encode_jpeg_coefficients(coefs, 2)
    rst = encode_jpeg_coefficients(coefs, 2, restart_interval=2)
    assert np.array_equal(
        decode_jpeg_coefficients(plain)[2], decode_jpeg_coefficients(rst)[2]
    )


def test_non_flat_quant_table_roundtrip():
    # DQT is carried per-stream; the coefficient layer must be identical
    # under any table (dequantization only affects the pixel path).
    quant = (np.arange(64) % 31 + 1).astype(np.uint16)
    coefs = np.arange(-32, 32, dtype=np.int64).reshape(1, 64).repeat(2, axis=0)
    s = encode_jpeg_coefficients(coefs, 2, quant=quant)
    frame = decode_jpeg_structure(s)
    # DQT stores zigzag on the wire; frame.quant is natural order
    assert np.array_equal(frame.quant[0], quant)
    assert np.array_equal(frame.coefs[0], coefs)


def test_progressive_sof_rejected_honestly():
    coefs = np.zeros((2, 64), dtype=np.int64)
    s = bytearray(encode_jpeg_coefficients(coefs, 2))
    sof = bytes(s).find(b"\xff\xc0")
    s[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_structure(bytes(s))


def test_truncated_stream_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_structure(b"\x00\x01")


def test_magnitude_category_is_spec_extend_inverse():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.jpeg import _extend

    for v in list(range(-1023, 1024, 7)) + [-1023, -1, 0, 1, 1023]:
        size, bits = _magnitude(v)
        assert _extend(bits, size) == v


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 4),  # block rows
    st.integers(1, 3),  # blocks per row
    st.integers(0, 4),  # restart interval (0 = none)
    st.integers(0, 2**32 - 1),
)
def test_roundtrip_property(rows, bpr, rst, seed):
    rng = np.random.default_rng(seed)
    n = rows * bpr
    coefs = rng.integers(-1023, 1024, size=(n, 64), dtype=np.int64)
    # keep DC diffs in the legal [-2047, 2047] envelope
    coefs[:, 0] = rng.integers(-1023, 1024, size=n)
    s = encode_jpeg_coefficients(coefs, bpr, restart_interval=rst)
    w, h, dec = decode_jpeg_coefficients(s)
    assert (w, h) == (bpr * 8, rows * 8)
    assert np.array_equal(dec, coefs)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_catalog_framing_property(seed):
    """Exactly the jpeg_decode query's kernel: document bytes → coefs →
    JFIF → coefs → bytes is the identity on the framed prefix."""
    rng = np.random.default_rng(seed)
    n_rows = int(rng.integers(1, JPEG_MAX_BLOCK_ROWS + 1))
    raw = rng.integers(0, 256, size=n_rows * JPEG_BYTES_PER_ROW, dtype=np.uint8).tobytes()
    coefs = (np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128).reshape(-1, 64)
    s = encode_jpeg_coefficients(
        coefs, JPEG_BLOCKS_PER_ROW, restart_interval=JPEG_RESTART_INTERVAL
    )
    _, _, dec = decode_jpeg_coefficients(s)
    assert (dec + 128).astype(np.uint8).tobytes() == raw


# ---------------------------------------------------------------------------
# Pixel path — DCT reference + error bounds


def _naive_dct2(block: np.ndarray) -> np.ndarray:
    """Textbook O(N^4) 2-D DCT-II with JPEG normalization."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.125) if u == 0 else 0.5
            cv = np.sqrt(0.125) if v == 0 else 0.5
            acc = 0.0
            for x in range(8):
                for y in range(8):
                    acc += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = cu * cv * acc
    return out


def test_fdct_matches_naive_reference():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.jpeg import (
        _fdct2,
        _idct2,
    )

    rng = np.random.default_rng(11)
    block = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(_fdct2(block), _naive_dct2(block), atol=1e-9)
    assert np.allclose(_idct2(_fdct2(block)), block, atol=1e-9)


def test_constant_image_roundtrips_exactly():
    for v in (0, 77, 128, 255):
        img = bytes([v]) * (16 * 16)
        w, h, px = decode_jpeg(encode_jpeg_gray(img, 16, 16))
        assert (w, h) == (16, 16) and px == img


def test_random_image_error_bounded_under_flat_quant():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, 24 * 16, dtype=np.uint8).tobytes()
    w, h, px = decode_jpeg(encode_jpeg_gray(img, 24, 16))
    err = np.abs(
        np.frombuffer(px, np.uint8).astype(int) - np.frombuffer(img, np.uint8).astype(int)
    )
    # flat table: quantization error ≤0.5/coef → spatial error ≤4, and in
    # practice ≤2; pin the hard bound
    assert err.max() <= 4


def test_coarse_quant_preserves_means():
    # heavy quantization must keep each block's mean within q/16 of truth
    # (DC step q → DC error ≤ q/2 → pixel-mean error ≤ q/16)
    quant = np.full(64, 16, dtype=np.uint16)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, 8 * 8, dtype=np.uint8).tobytes()
    _, _, px = decode_jpeg(encode_jpeg_gray(img, 8, 8, quant=quant))
    got = np.frombuffer(px, np.uint8).astype(float).mean()
    want = np.frombuffer(img, np.uint8).astype(float).mean()
    assert abs(got - want) <= 1.5


# ---------------------------------------------------------------------------
# 3-component color decode (handcrafted streams)


def _encode_color(
    y_dc: int, cb_dc: int, cr_dc: int, width: int, height: int, sampling
) -> bytes:
    """Handcraft an interleaved 3-component baseline stream of DC-only
    blocks (each component spatially constant), using the module's own
    segment/bit primitives. ``sampling`` = [(h,v)] per component."""
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    out = bytearray(b"\xff\xd8")
    out += _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _segment(0xDB, bytes([0x00]) + bytes([1] * 64))
    comps = b"".join(
        bytes([cid, (h << 4) | v, 0])
        for cid, (h, v) in zip((1, 2, 3), sampling)
    )
    out += _segment(0xC0, struct.pack(">BHHB", 8, height, width, 3) + comps)
    out += _segment(0xC4, _dht_payload(0x00, _DC_BITS, _DC_SYMBOLS))
    out += _segment(0xC4, _dht_payload(0x10, _AC_BITS, _AC_SYMBOLS))
    out += _segment(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    w = _BitWriter()
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    prev = [0, 0, 0]
    for _ in range(mcus_x * mcus_y):
        for ci, dc in enumerate((y_dc, cb_dc, cr_dc)):
            h, v = sampling[ci]
            for _ in range(h * v):
                size, bits = _magnitude(dc - prev[ci])
                prev[ci] = dc
                code, length = _DC_ENC[size]
                w.write(code, length)
                if size:
                    w.write(bits, size)
                ec, el = _AC_ENC[0x00]
                w.write(ec, el)  # EOB
    w.flush()
    out += w.out + b"\xff\xd9"
    return bytes(out)


def _expected_rgb(yv: float, cb: float, cr: float) -> tuple[int, int, int]:
    r = yv + 1.402 * (cr - 128.0)
    g = yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yv + 1.772 * (cb - 128.0)
    return tuple(int(np.clip(round(c), 0, 255)) for c in (r, g, b))


def test_color_444_constant_image():
    # DC d → flat spatial value d/8 + 128
    y_dc, cb_dc, cr_dc = 8 * 40, 8 * (-20), 8 * 30  # Y=168, Cb=108, Cr=158
    s = _encode_color(y_dc, cb_dc, cr_dc, 16, 8, [(1, 1), (1, 1), (1, 1)])
    w, h, px = decode_jpeg(s)
    assert (w, h) == (16, 8)
    rgb = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert (rgb == _expected_rgb(168.0, 108.0, 158.0)).all()


def test_color_420_subsampled_upsamples():
    # Y 2x2, chroma 1x1 — the classic 4:2:0 layout; 16x16 = one MCU
    s = _encode_color(8 * 10, 8 * 25, 8 * (-25), 16, 16, [(2, 2), (1, 1), (1, 1)])
    w, h, px = decode_jpeg(s)
    assert (w, h) == (16, 16)
    rgb = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert (rgb == _expected_rgb(138.0, 153.0, 103.0)).all()


def test_color_coefficient_view_rejects():
    s = _encode_color(0, 0, 0, 8, 8, [(1, 1), (1, 1), (1, 1)])
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_coefficients(s)


def test_grayscale_via_decode_media():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.multimodal import (
        decode_media,
    )

    img = bytes(range(64)) * 4  # 16x16
    out = decode_media(encode_jpeg_gray(img, 16, 16), "image/jpeg")
    assert len(out) == 256
    # and the boundary for still-stubbed codecs is intact
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "video/mp4")


def test_non_divisible_sampling_rejected_at_parse_time():
    # ADVICE r8: 3x1 alongside 2x1 is legal JPEG but integer-ratio
    # nearest-neighbor upsampling can't express it — reject cleanly in
    # decode_jpeg_structure, not via a raw np.stack shape ValueError.
    s = _encode_color(0, 0, 0, 48, 8, [(3, 1), (2, 1), (1, 1)])
    with pytest.raises(NotImplementedError, match="do not divide"):
        decode_jpeg_structure(s)
