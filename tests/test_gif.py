"""GIF/LZW codec semantics (operators/gif.py): a hand-packed bitstream
pinning LSB-first packing and width-switch timing to the GIF89a spec,
round-trips across every code-width boundary and the 4096-entry reset,
the KwKwK case, extension skipping, and the documented error surface.
"""

from __future__ import annotations

import hashlib
import struct

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _prand(n: int, seed: bytes = b"gif") -> bytes:
    """Deterministic pseudo-random bytes (no Math.random in tests)."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(seed + counter.to_bytes(8, "big")).digest()
        counter += 1
    return bytes(out[:n])


# ---------------------------------------------------------------- spec pins


def test_hand_packed_bitstream_matches_spec():
    """mcs=2, pixels [1,2,2]: codes are CLEAR(4)@3, 1@3, 2@3, 2@3,
    EOI(5)@4 — the decoder's table hits 8 entries while processing the
    final content code, so EOI must already be read at 4 bits. Packed
    LSB-first: bits 001|100|010|010|1010 -> bytes 0x8C 0x54
    (hand-computed)."""
    assert _lzw_encode(bytes([1, 2, 2]), 2) == bytes([0x8C, 0x54])
    assert _lzw_decode(bytes([0x8C, 0x54]), 2, 3) == bytes([1, 2, 2])


def test_full_gif_container_hand_checked():
    """The container around the hand-pinned stream: build a 3x1 GIF via
    encode_gif and verify the exact block layout the spec mandates."""
    gif = encode_gif(bytes([1, 2, 2]), 3, 1)
    assert gif[:6] == b"GIF89a"
    w, h = struct.unpack_from("<HH", gif, 6)
    assert (w, h) == (3, 1)
    assert gif[10] == 0xF7  # GCT present, 256 entries
    assert gif[-1:] == b";"
    w, h, indices, palette = decode_gif(gif)
    assert (w, h) == (3, 1)
    assert indices == bytes([1, 2, 2])
    assert palette[3 * 7 : 3 * 7 + 3] == bytes([7, 7, 7])  # grayscale GCT


# ---------------------------------------------------------------- round trips


@pytest.mark.parametrize(
    "data",
    [
        b"",  # empty stream: CLEAR + EOI only
        b"a",
        b"aaaa",  # immediate KwKwK
        b"a" * 1000,  # long single-symbol run: KwKwK chain
        b"ab" * 2000,  # two-symbol alternation
        bytes(range(256)) * 3,  # full alphabet
        _prand(600),  # crosses the 9->10 bit boundary
        _prand(2000),  # crosses 9->10->11
        _prand(6000),  # crosses into 12 bits AND the 4096 reset
    ],
)
def test_lzw_roundtrip(data):
    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data


def test_lzw_roundtrip_small_alphabet():
    # mcs=2: widths start at 3 bits, so every boundary arrives quickly
    data = bytes(b % 4 for b in _prand(3000))
    assert _lzw_decode(_lzw_encode(data, 2), 2, len(data)) == data


def test_reset_path_emits_clear_code():
    """6000 poorly-compressible bytes force ~1 table add per byte, so
    the encoder must pass 4096 entries and restart; prove the restart
    happened by decoding with a table-size assertion impossible under
    deferred-full (output correctness is the assertion)."""
    data = _prand(6000, seed=b"reset")
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data
    # and the stream is genuinely compressive bookkeeping, not escape
    # hatches: re-encoding the decode is identical (determinism)
    assert _lzw_encode(_lzw_decode(enc, 8, len(data)), 8) == enc


def test_gif_roundtrip_with_extension_in_the_way():
    idx = _prand(11 * 7)
    gif = encode_gif(idx, 11, 7)
    assert b"engine" in gif  # the comment extension is really in there
    w, h, indices, _ = decode_gif(gif)
    assert (w, h, indices) == (11, 7, idx)


def test_gif_multi_subblock_payload():
    # 64x64 random indices -> LZW stream far beyond 255 bytes -> the
    # sub-block reassembly path carries real weight
    idx = _prand(64 * 64)
    gif = encode_gif(idx, 64, 64)
    _, _, indices, _ = decode_gif(gif)
    assert indices == idx


# ---------------------------------------------------------------- error surface


def test_interlace_is_documented_boundary():
    gif = bytearray(encode_gif(b"abcabcabc", 3, 3))
    # image descriptor sits after header(13) + GCT(768) + comment(11);
    # searching for 0x2C would hit the palette's (44,44,44) entry
    at = 13 + 768 + 11
    assert gif[at] == 0x2C
    gif[at + 9] |= 0x40  # set interlace flag
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(gif))


def test_truncated_subblock_raises_value_error():
    gif = encode_gif(b"abcabcabc", 3, 3)
    with pytest.raises(ValueError):
        decode_gif(gif[: len(gif) - 6])


def test_wrong_pixel_count_raises():
    with pytest.raises(ValueError):
        encode_gif(b"abc", 2, 2)


def test_no_image_block_raises():
    # header + LSD + GCT + trailer, no image
    gif = encode_gif(b"ab", 2, 1)
    head = gif[: 13 + 768]
    with pytest.raises(ValueError):
        decode_gif(head + b";")


def test_foreign_code_out_of_range_raises():
    # craft an LZW stream whose second code references a table entry
    # that cannot exist yet: codes CLEAR(256)@9, 65@9, 300@9
    bits = []
    for code in (256, 65, 300):
        bits.extend((code >> k) & 1 for k in range(9))
    buf = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        buf.append(byte)
    with pytest.raises(ValueError):
        _lzw_decode(bytes(buf), 8, 100)


def test_output_bound_enforced():
    # a valid stream for 9 pixels must be rejected when the image
    # header promised fewer — the malicious-balloon guard
    enc = _lzw_encode(b"abcabcabc", 8)
    with pytest.raises(ValueError):
        _lzw_decode(enc, 8, 4)
