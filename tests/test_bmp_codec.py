"""The real BMP codec behind decode_media (multimodal U7).

The decoder is exercised on handcrafted byte layouts — not just on the
encoder's own output — so a bug pair that cancels in roundtrip (e.g.
both sides skipping the flip) cannot hide.
"""

import struct

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.operators.multimodal import (
    decode_bmp,
    decode_media,
    encode_bmp,
)


def _bmp_bytes(width, height_field, rows_bottom_to_top, bpp=24, compression=0):
    """Handcraft a BMP: ``rows_bottom_to_top`` is the pixel array as
    stored (already padded rows, BGR), ``height_field`` signed."""
    body = b"".join(rows_bottom_to_top)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height_field, 1, bpp, compression,
        len(body), 2835, 2835, 0, 0,
    )
    return header + dib + body


def test_decode_handcrafted_bottom_up_with_padding():
    # 1x2 image (width 1 -> 3 pixel bytes + 1 pad byte per row).
    # Stored bottom-up: file row 0 is the IMAGE'S BOTTOM row.
    bottom = bytes([10, 20, 30, 0])  # BGR + pad -> RGB (30,20,10)
    top = bytes([40, 50, 60, 0])  # -> RGB (60,50,40)
    bmp = _bmp_bytes(1, 2, [bottom, top])
    w, h, rgb = decode_bmp(bmp)
    assert (w, h) == (1, 2)
    assert rgb == bytes([60, 50, 40, 30, 20, 10])  # top-down RGB


def test_decode_handcrafted_top_down_negative_height():
    first = bytes([1, 2, 3, 0])  # stored first = image top (BGR)
    second = bytes([4, 5, 6, 0])
    bmp = _bmp_bytes(1, -2, [first, second])
    w, h, rgb = decode_bmp(bmp)
    assert (w, h) == (1, 2)
    assert rgb == bytes([3, 2, 1, 6, 5, 4])


def test_roundtrip_identity_odd_width():
    # width 3 -> 9-byte rows -> 3 pad bytes: padding path exercised
    rgb = bytes(range(2, 2 + 3 * 3 * 2))  # 3x2 image
    w, h, back = decode_bmp(encode_bmp(rgb, 3, 2))
    assert (w, h, back) == (3, 2, rgb)


def test_decode_media_dispatches_bmp():
    rgb = bytes(range(3 * 2 * 3))
    assert decode_media(encode_bmp(rgb, 2, 3), "image/bmp") == rgb


def test_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG....")
    bmp8 = _bmp_bytes(1, 1, [bytes(4)], bpp=8)
    with pytest.raises(NotImplementedError, match="24-bpp"):
        decode_bmp(bmp8)
    rle = _bmp_bytes(1, 1, [bytes(4)], compression=1)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(rle)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(_bmp_bytes(4, 2, [bytes(12)]))  # claims 2 rows, has 1
    # JPEG is a real codec now (operators/jpeg.py): truncated input gets
    # a clean parse error, and the honest NotImplementedError boundary
    # has moved to the native-lib formats (MP3/video)
    with pytest.raises(ValueError, match="truncated JPEG"):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "audio/mpeg")


# --- WAV (16-bit PCM RIFF/WAVE) ---

from finance_data_ingestion_pipeline_with_kafka_spark.operators.multimodal import (  # noqa: E402
    decode_wav,
    encode_wav,
)


def test_wav_roundtrip_and_header_fields():
    pcm = bytes(range(10))  # 5 samples
    rate, ch, back = decode_wav(encode_wav(pcm, 12000))
    assert (rate, ch, back) == (12000, 1, pcm)


def test_wav_odd_data_chunk_padding():
    """A 3-byte data chunk forces the even-alignment pad; a chunk after
    data (handcrafted) must still be walkable."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = b"\x01\x02\x03"
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + b"\x00"  # pad
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, ch, pcm = decode_wav(wav)
    assert (rate, ch, pcm) == (8000, 1, data)


def test_wav_chunk_walk_skips_list_before_data():
    wav = encode_wav(b"\x10\x20", 16000)  # encoder emits LIST before data
    assert b"LIST" in wav
    _r, _c, pcm = decode_wav(wav)
    assert pcm == b"\x10\x20"


def test_wav_rejections():
    import struct

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + bytes(20))
    # 8-bit PCM refused
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 0)
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_wav(wav)
    # missing data chunk
    body = b"fmt " + struct.pack("<I", len(struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))) + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="missing"):
        decode_wav(wav)


def test_wav_truncated_data_chunk_raises():
    """A data chunk whose declared size overruns the payload must raise
    (matching decode_bmp's 'truncated' contract), never silently return
    partial PCM."""
    import struct

    wav = encode_wav(b"\x01\x00\x02\x00\x03\x00", 8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-2])  # cut the last sample off the data chunk
    # same for a handcrafted size field larger than the actual body
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 100) + b"\x01\x00"
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav)


def test_decode_media_dispatches_wav():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.multimodal import (
        decode_media as dm,
    )

    pcm = b"\x01\x00\x02\x00"
    assert dm(encode_wav(pcm, 8000), "audio/wav") == pcm


# --- PNG (8-bit truecolor, stdlib zlib) ---

from finance_data_ingestion_pipeline_with_kafka_spark.operators.multimodal import (  # noqa: E402
    decode_png,
    encode_png,
)


def test_png_roundtrip_exercises_all_filters():
    """6 rows → filters None/Sub/Up/Average/Paeth(+None again) all run;
    a gradient image makes Average/Paeth prediction non-trivial."""
    w, h = 16, 6
    rgb = bytes(
        ((x * 7 + y * 13 + ch * 31) % 256)
        for y in range(h)
        for x in range(w)
        for ch in range(3)
    )
    assert decode_png(encode_png(rgb, w, h)) == (w, h, rgb)


def test_png_multiple_idat_chunks_concatenated():
    """The encoder splits the zlib stream across two IDAT chunks; the
    decoder must concatenate before inflating (inflate-per-chunk fails)."""
    rgb = bytes(range(0, 90))  # 30 pixels
    png = encode_png(rgb, 10, 3)
    assert png.count(b"IDAT") == 2
    assert decode_png(png)[2] == rgb


def test_png_crc_mismatch_raises():
    png = bytearray(encode_png(bytes(30), 5, 2))
    # flip one byte inside the first IDAT chunk's data
    idat_pos = png.index(b"IDAT")
    png[idat_pos + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_png_truncation_raises():
    png = encode_png(bytes(60), 5, 4)
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(png[:-6])


def _hand_png(width, height, color_type, scanlines):
    """Handcraft a PNG: raw (filter byte + pixel bytes) scanlines are
    zlib-deflated into a single IDAT."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(scanlines)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_grayscale_handcrafted():
    """Color type 0 decodes with 1-byte-per-pixel filter semantics and
    expands to RGB. Row 2 uses the Sub filter at bpp=1 (left neighbor is
    the PREVIOUS BYTE, unlike truecolor's 3-back) — a decoder that
    hardcodes bpp=3 fails here."""
    png = _hand_png(
        3, 2, 0,
        [
            b"\x00" + bytes([10, 20, 30]),          # None
            b"\x01" + bytes([5, 1, 1]),             # Sub: 5, 6, 7
        ],
    )
    w, h, rgb = decode_png(png)
    assert (w, h) == (3, 2)
    assert rgb == bytes(
        [10, 10, 10, 20, 20, 20, 30, 30, 30, 5, 5, 5, 6, 6, 6, 7, 7, 7]
    )


def test_png_rgba_handcrafted():
    """Color type 6 decodes with 4-byte pixels (Up filter across rows)
    and strips alpha in the RGB projection."""
    row1 = b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 128])
    row2 = b"\x02" + bytes([10, 10, 10, 0, 10, 10, 10, 0])  # Up: +10 rgb, alpha kept
    png = _hand_png(2, 2, 6, [row1, row2])
    w, h, rgb = decode_png(png)
    assert (w, h) == (2, 2)
    assert rgb == bytes([1, 2, 3, 4, 5, 6, 11, 12, 13, 14, 15, 16])


def test_png_rejections():
    import struct
    import zlib

    with pytest.raises(ValueError, match="PNG"):
        decode_png(b"BM" + bytes(60))
    # palette (color type 3) stays out of the supported boundary
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="grayscale/truecolor"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)
    # 16-bit depth likewise
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_decode_media_dispatches_png():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.multimodal import (
        decode_media as dm,
    )

    rgb = bytes(range(45))  # 15 pixels
    assert dm(encode_png(rgb, 5, 3), "image/png") == rgb
