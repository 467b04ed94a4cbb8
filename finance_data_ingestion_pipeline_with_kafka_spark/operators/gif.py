"""Dependency-free GIF87a/89a codec — the palette/LZW member of the
real-codec family (SURVEY §2.10 U7, next to BMP/PNG/JPEG/WAV/MP3/MP4).

GIF is the one mainstream image container whose pixel data is LZW
(variable-width codes, 9→12 bits, LSB-first bit packing, in-stream
CLEAR/EOI control codes, 255-byte sub-block framing) — none of which
the zlib/Huffman paths of the PNG/JPEG codecs exercise. Both directions
are implemented from the public GIF89a specification; no image library.

LZW width-switch correctness argument (the classic interop trap): the
DECODER grows its code width when its string table size reaches
``2^width`` (capped at 12 bits; a full 4096-entry table defers growth
until CLEAR). The decoder's table trails the encoder's by exactly one
entry — it learns the entry for emission *n* only while reading
emission *n+1* — so an encoder that switches width off its OWN table
size desynchronizes at every boundary. ``_lzw_encode`` therefore tracks
``dec_size`` — the size of the table the decoder will have built before
reading the NEXT code — and derives the emission width from that,
making the two sides consistent by construction (pinned by round-trip
tests across the 9→10→11→12 boundaries and the 4096 reset, plus a
hand-packed bitstream test that pins LSB-first packing to the spec).

Every parse error on arbitrary bytes is ValueError (malformed) or
NotImplementedError (documented boundary: interlaced images), matching
the fuzz contract of the other parsers (tests/test_parser_fuzz.py).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

_LZW_MAX_WIDTH = 12
_LZW_TABLE_CAP = 1 << _LZW_MAX_WIDTH  # 4096


def _lzw_encode(data: bytes, mcs: int) -> bytes:
    """GIF-variant LZW: emit CLEAR, greedy longest-match encoding with
    width switching driven by the decoder's table accounting (module
    docstring), CLEAR+reset when the table fills, EOI last."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"LZW min code size {mcs} outside 2..8")
    clear = 1 << mcs
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int, int, bool]:
        table = {bytes([i]): i for i in range(clear)}
        return table, clear + 2, clear + 2, mcs + 1, True

    # enc_next: the next code THIS side will assign. dec_size: the
    # decoder's table size after it processes the emission — it trails
    # enc_next because the FIRST content code of a segment teaches the
    # decoder nothing and every later one teaches exactly one entry
    # (module docstring). Width changes derive from dec_size alone.
    table, enc_next, dec_size, width, first = fresh()
    emit(clear, width)

    def content_emit(code: int) -> None:
        nonlocal dec_size, width, first
        emit(code, width)
        if first:
            first = False
            return
        dec_size += 1  # the decoder's add while processing this code
        if dec_size == (1 << width) and width < _LZW_MAX_WIDTH:
            width += 1

    seq = b""
    for i in range(len(data)):
        ch = data[i : i + 1]
        cand = seq + ch
        if cand in table:
            seq = cand
            continue
        content_emit(table[seq])
        table[cand] = enc_next
        enc_next += 1
        seq = ch
        if enc_next == _LZW_TABLE_CAP:
            # own table full: CLEAR and restart with the pending single
            # byte carried over (the decoder never learns the last
            # entry — nothing references it). Never relies on the
            # decoder's deferred-full mode.
            emit(clear, width)
            table, enc_next, dec_size, width, first = fresh()
    if seq:
        content_emit(table[seq])
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, max_pixels: int) -> bytes:
    """Inverse of ``_lzw_encode`` and a conformant decoder for foreign
    streams: KwKwK case, deferred growth on a full table, hard output
    bound (``max_pixels``) so a malicious stream cannot balloon memory."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"LZW min code size {mcs} outside 2..8")
    clear = 1 << mcs
    eoi = clear + 1
    base: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended before EOI code")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first LZW code {code} not in table")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                addition = prev + entry[:1]
            elif code == len(table):
                entry = prev + prev[:1]  # KwKwK
                addition = entry
            else:
                raise ValueError(f"LZW code {code} beyond table size {len(table)}")
            if len(table) < _LZW_TABLE_CAP:
                table.append(addition)
                if len(table) == (1 << width) and width < _LZW_MAX_WIDTH:
                    width += 1
        out += entry
        prev = entry
        if len(out) > max_pixels:
            raise ValueError(
                f"LZW output exceeds declared pixel count {max_pixels}"
            )


def _grayscale_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(indices: bytes, width: int, height: int) -> bytes:
    """Encode palette indices as a GIF89a file: 256-entry grayscale
    global color table (index i → RGB (i,i,i)), a comment extension (so
    every round-trip exercises the decoder's extension-skip path), one
    non-interlaced image, LZW min code size 8."""
    if width <= 0 or height <= 0 or len(indices) != width * height:
        raise ValueError(
            f"need width*height={width * height} indices, got {len(indices)}"
        )
    lsd = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    comment = b"!\xfe\x07engine\x00\x00"  # 7-byte comment sub-block + terminator
    img_desc = b"," + struct.pack("<HHHHB", 0, 0, width, height, 0)
    lzw = _lzw_encode(indices, 8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a" + lsd + _grayscale_palette() + comment
        + img_desc + bytes([8]) + bytes(blocks) + b";"
    )


def decode_gif(payload: bytes) -> tuple[int, int, bytes, bytes]:
    """Parse a GIF payload → (width, height, palette indices, palette
    RGB bytes) for the FIRST image. Walks the block sequence (skipping
    extensions), honors local color tables, rejects interlace with the
    documented NotImplementedError boundary, and validates that the LZW
    stream yields exactly width·height pixels."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    _sw, _sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = b""
    if flags & 0x80:
        n = 3 * (2 << (flags & 0x07))
        if pos + n > len(payload):
            raise ValueError("truncated global color table")
        palette = payload[pos : pos + n]
        pos += n
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended without an image or trailer")
        introducer = payload[pos]
        pos += 1
        if introducer == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if introducer == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated extension introducer")
            pos += 1  # label
            pos = _skip_subblocks(payload, pos)
            continue
        if introducer != 0x2C:
            raise ValueError(f"unexpected GIF block introducer 0x{introducer:02x}")
        break
    if pos + 9 > len(payload):
        raise ValueError("truncated image descriptor")
    _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if iflags & 0x40:
        raise NotImplementedError(
            "interlaced GIF images are a documented boundary (the row "
            "reorder is mechanical but no fixture produces them); "
            "non-interlaced decode is complete"
        )
    if iflags & 0x80:
        n = 3 * (2 << (iflags & 0x07))
        if pos + n > len(payload):
            raise ValueError("truncated local color table")
        palette = payload[pos : pos + n]
        pos += n
    if not palette:
        raise ValueError("no color table (global absent, local absent)")
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate image dimensions {w}x{h}")
    if pos >= len(payload):
        raise ValueError("truncated before LZW min code size")
    mcs = payload[pos]
    pos += 1
    lzw = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated image data sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(payload):
            raise ValueError(f"sub-block declares {n} bytes, fewer remain")
        lzw += payload[pos : pos + n]
        pos += n
    indices = _lzw_decode(bytes(lzw), mcs, w * h)
    if len(indices) != w * h:
        raise ValueError(
            f"LZW stream produced {len(indices)} pixels for a {w}x{h} image"
        )
    if any(i >= len(palette) // 3 for i in indices):
        raise ValueError("palette index out of range")
    return w, h, indices, palette


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("truncated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        if pos + n > len(payload):
            raise ValueError(f"sub-block declares {n} bytes, fewer remain")
        pos += n


GIF_WIDTH = 11  # ≠ BMP/PNG widths; 1 palette index per source byte
GIF_MAX_ROWS = 7


@query(
    "gif_decode",
    oracle=f"""
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n
               FROM documents)
    SELECT doc_id,
           CAST({GIF_WIDTH} AS BIGINT) AS width,
           CAST(LEAST({GIF_MAX_ROWS}, n // {GIF_WIDTH}) AS BIGINT) AS height,
           CAST(LEAST({GIF_MAX_ROWS}, n // {GIF_WIDTH}) * {GIF_WIDTH} AS BIGINT)
             AS n_pixels,
           md5(substring(hx, 1,
               CAST(LEAST({GIF_MAX_ROWS}, n // {GIF_WIDTH}) * {GIF_WIDTH * 2} AS INT)))
             AS pixel_md5
    FROM h WHERE n >= {GIF_WIDTH} ORDER BY doc_id
    """,
    tags=("U7",),
)
def gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U7] REAL LZW-codec decode (no stub): each document's leading
    bytes become the palette indices of an actual GIF89a file
    (``encode_gif`` — real variable-width LZW with width switching and
    sub-block framing, grayscale GCT, a comment extension in the way)
    and are decoded back by the dependency-free parser (``decode_gif``).
    The decoded indices must be byte-identical to the original prefix,
    which the oracle knows analytically — an error anywhere in the LZW
    bit unpacking, width-switch accounting, KwKwK case, sub-block
    reassembly, or block walk breaks the md5 compare. Arrow-batched
    ``mapInPandas``, corpus-linear; the 100 TB posture is identical to
    ``bmp_decode`` (decode is per-row narrow work, no shuffle)."""
    from .multimodal import media_table

    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    m = media_table(spark, sf_dir).filter(F.col("meta.n_bytes") >= GIF_WIDTH)

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                height = min(GIF_MAX_ROWS, len(raw) // GIF_WIDTH)
                idx = raw[: height * GIF_WIDTH]
                gif = encode_gif(idx, GIF_WIDTH, height)
                w, h, indices, _palette = decode_gif(gif)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "n_pixels": len(indices),
                        "pixels": indices,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_pixels", "pixels"]
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("n_pixels", LongType()),
            StructField("pixels", BinaryType()),
        ]
    )
    out = m.select("doc_id", "payload").mapInPandas(_roundtrip, schema)
    return out.select(
        "doc_id",
        "width",
        "height",
        "n_pixels",
        F.md5(F.hex("pixels")).alias("pixel_md5"),
    ).orderBy("doc_id")


@query(
    "gif_features",
    oracle=f"""
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n
               FROM documents),
    px AS (SELECT doc_id,
                  LEAST({GIF_MAX_ROWS}, n // {GIF_WIDTH}) * {GIF_WIDTH} AS np,
                  hx
           FROM h WHERE n >= {GIF_WIDTH})
    SELECT doc_id, CAST(np * 3 AS BIGINT) AS n_bytes,
           3 * len(list_filter(range(0, np), i -> hx[CAST(i*2+1 AS INT)] = '0'))
             AS bin0_count,
           3 * len(list_filter(range(0, np), i -> hx[CAST(i*2+1 AS INT)] = '1'))
             AS bin1_count,
           16 AS n_bins
    FROM px ORDER BY doc_id
    """,
    tags=("U7", "U1"),
)
def gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U7] The full multimodal feature pipeline dispatched through the
    LZW codec: document bytes become the palette indices of an actual
    GIF89a file (``encode_gif``), ``meta.mime='image/gif'``, and the
    standard ``featurize_media`` kernel decodes via ``decode_media`` →
    ``decode_gif`` → grayscale-palette expansion (index i → (i,i,i))
    before histogramming. The oracle knows the decoded stream
    analytically: every prefix byte appears exactly 3× (the palette
    triple), so ``n_bytes`` and each bin count are 3× the prefix's —
    an error anywhere in LZW or the palette lookup breaks the compare.
    Same ``bmp_features`` shape, one more real mime in the dispatch."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..catalog import load_table
    from .multimodal import featurize_media

    d = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode("text", "utf-8")) >= GIF_WIDTH
    )

    def _to_gif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                height = min(GIF_MAX_ROWS, len(raw) // GIF_WIDTH)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": encode_gif(
                            raw[: height * GIF_WIDTH], GIF_WIDTH, height
                        ),
                        "meta": {
                            "mime": "image/gif",
                            "n_bytes": len(raw),
                            "origin": "gif",
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "meta"])

    media_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("mime", StringType()),
                        StructField("n_bytes", LongType()),
                        StructField("origin", StringType()),
                    ]
                ),
            ),
        ]
    )
    gif_media = d.select("doc_id", "text").mapInPandas(_to_gif, media_schema)
    feats = featurize_media(gif_media)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("features", 1) * F.col("n_bytes"), 0)
        .cast("long")
        .alias("bin0_count"),
        F.round(F.element_at("features", 2) * F.col("n_bytes"), 0)
        .cast("long")
        .alias("bin1_count"),
        F.size("features").alias("n_bins"),
    ).orderBy("doc_id")
