"""ISO-BMFF (MP4) box-walker tests (``operators/mp4.py``): size/4cc
walk, 64-bit largesize, size-0 run-to-EOF, container recursion with
scope bounds, loud truncation, and the catalog framing property."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finance_data_ingestion_pipeline_with_kafka_spark.operators.mp4 import (
    MP4_FIXED_BOX_COUNT,
    MP4_MAX_PAYLOAD,
    encode_mp4,
    parse_mp4,
)


def test_fixed_tree_shape_and_mvhd_size():
    boxes, rec = parse_mp4(encode_mp4(bytes(32)))
    assert [(p, t) for p, t, _ in boxes] == [
        ("", "ftyp"),
        ("", "moov"),
        ("/moov", "mvhd"),
        ("/moov", "udta"),
        ("/moov/udta", "meta"),
        ("", "mdat"),
    ]
    assert len(boxes) == MP4_FIXED_BOX_COUNT
    # the version-0 mvhd is exactly 108 bytes in the spec — a wrong
    # field layout shows up here before it shows up anywhere else
    assert dict(((t, s) for _, t, s in boxes))["mvhd"] == 108


def test_payload_roundtrip_both_size_forms():
    raw = bytes(range(256))
    for large in (False, True):
        _, rec = parse_mp4(encode_mp4(raw, large_mdat=large))
        assert rec == raw


def test_size_zero_runs_to_eof():
    raw = bytes(100)
    s = encode_mp4(b"")  # tree with empty mdat
    s = s[:-8]  # drop the empty mdat box (8-byte header)
    s += struct.pack(">I", 0) + b"mdat" + raw
    boxes, rec = parse_mp4(s)
    assert rec == raw
    assert boxes[-1][1] == "mdat"


def test_truncated_and_overrunning_boxes_raise():
    s = encode_mp4(bytes(64))
    with pytest.raises(ValueError, match="remain in scope"):
        parse_mp4(s[:-5])
    with pytest.raises(ValueError, match="truncated box header"):
        parse_mp4(s + b"\x00\x00\x00")  # trailing partial header


def test_nested_scope_is_bounded():
    # a child whose size overruns its PARENT (not the file) must fail:
    # scope bounds are per-container, not global
    s = bytearray(encode_mp4(bytes(16)))
    moov_at = s.find(b"moov") - 4
    mvhd_at = s.find(b"mvhd") - 4
    struct.pack_into(">I", s, mvhd_at, 200)  # mvhd claims past moov's end
    with pytest.raises(ValueError, match="remain in scope"):
        parse_mp4(bytes(s))
    assert moov_at < mvhd_at  # sanity on the fixture itself


def test_non_ascii_box_type_raises():
    s = struct.pack(">I", 12) + b"\xff\xfe\x00a" + bytes(4)
    with pytest.raises(ValueError, match="non-ASCII"):
        parse_mp4(s)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=16, max_size=700), st.booleans())
def test_catalog_framing_property(raw, large):
    prefix = raw[:MP4_MAX_PAYLOAD]
    boxes, rec = parse_mp4(encode_mp4(prefix, large_mdat=large))
    assert rec == prefix
    assert len(boxes) == MP4_FIXED_BOX_COUNT


def test_nested_container_bomb_raises_valueerror_not_recursionerror():
    # ADVICE r8: a crafted stream of nested container headers (8 bytes
    # per level) must stay inside the ValueError contract instead of
    # escaping via RecursionError (~1000 frames default limit).
    levels = 2000
    inner = b""
    for depth in range(levels):
        size = 8 * (levels - depth)
        inner += struct.pack(">I", size) + b"moov"
    with pytest.raises(ValueError, match="nesting exceeds"):
        parse_mp4(inner)


def test_legal_nesting_depth_unaffected_by_cap():
    # the fixed tree nests 3 deep (moov/udta/meta) — far below the cap
    boxes, payload = parse_mp4(encode_mp4(b"x" * 32))
    assert payload == b"x" * 32
    assert any(p.startswith("/moov/udta") for p, _, _ in boxes)
