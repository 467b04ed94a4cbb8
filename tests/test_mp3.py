"""MP3 frame-structure codec tests (``operators/mp3.py``): header field
decode against the public ISO tables, ID3v2 syncsafe skip, alternating
bitrate walk, loud truncation failures, and the catalog query's framing
kernel as a Hypothesis property."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finance_data_ingestion_pipeline_with_kafka_spark.operators.mp3 import (
    BITRATE_KBPS_V1L3,
    MP3_BITRATE_CYCLE,
    MP3_CUM_PAYLOAD,
    MP3_MAX_FRAMES,
    SAMPLE_RATE_V1,
    encode_id3v2,
    encode_mp3_frames,
    frame_length,
    parse_mp3,
)


def test_frame_length_matches_known_values():
    # the canonical spot values every MP3 reference quotes
    assert frame_length(128, 44100, 0) == 417
    assert frame_length(128, 44100, 1) == 418
    assert frame_length(320, 44100, 0) == 1044
    assert frame_length(32, 44100, 0) == 104
    assert frame_length(48, 44100, 0) == 156
    assert frame_length(128, 48000, 0) == 384


def test_header_fields_roundtrip():
    raw = bytes(range(100))
    s = encode_mp3_frames(raw, [1], with_id3=False)
    frames, rec = parse_mp3(s)
    assert rec == raw
    f = frames[0]
    assert (f.bitrate_kbps, f.sample_rate, f.padding, f.length) == (32, 44100, 0, 104)


def test_id3v2_tag_is_skipped_by_syncsafe_size():
    raw = bytes(100)
    s = encode_mp3_frames(raw, [1], with_id3=True)
    assert s[:3] == b"ID3"
    # tag body may legally contain 0xFF bytes — a walker that scans for
    # sync instead of skipping the declared size would desync
    frames, rec = parse_mp3(s)
    assert len(frames) == 1 and rec == raw


def test_alternating_bitrates_walk():
    raw = bytes(i % 256 for i in range(MP3_CUM_PAYLOAD[-1]))
    s = encode_mp3_frames(
        raw, [MP3_BITRATE_CYCLE[k % 2] for k in range(MP3_MAX_FRAMES)]
    )
    frames, rec = parse_mp3(s)
    assert [f.bitrate_kbps for f in frames] == [32, 48, 32, 48]
    assert rec == raw


def test_truncated_frame_raises():
    s = encode_mp3_frames(bytes(100), [1], with_id3=False)
    with pytest.raises(ValueError, match="truncated MP3"):
        parse_mp3(s[:-1])


def test_lost_sync_raises():
    s = bytearray(encode_mp3_frames(bytes(100), [1], with_id3=False))
    s[0] = 0x00
    with pytest.raises(ValueError, match="sync"):
        parse_mp3(bytes(s))


def test_reserved_table_indices_raise():
    s = bytearray(encode_mp3_frames(bytes(100), [1], with_id3=False))
    s[2] = 0xF0 | (s[2] & 0x0F)  # bitrate index 15 = forbidden
    with pytest.raises(ValueError, match="reserved"):
        parse_mp3(bytes(s))


def test_non_mpeg1_layer3_is_honest_boundary():
    s = bytearray(encode_mp3_frames(bytes(100), [1], with_id3=False))
    s[1] = 0xF3  # version MPEG-2 bits
    with pytest.raises(NotImplementedError, match="MPEG-1 Layer III"):
        parse_mp3(bytes(s))


def test_tables_are_public_iso_values():
    assert BITRATE_KBPS_V1L3[9] == 128 and BITRATE_KBPS_V1L3[14] == 320
    assert SAMPLE_RATE_V1[:3] == (44100, 48000, 32000)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=MP3_CUM_PAYLOAD[0], max_size=700))
def test_catalog_framing_property(raw):
    """Exactly the mp3_frame_scan kernel: prefix → frames → prefix is
    the identity, and frame count follows the cumulative geometry."""
    n_frames = 0
    for k, cum in enumerate(MP3_CUM_PAYLOAD):
        if len(raw) >= cum:
            n_frames = k + 1
    prefix = raw[: MP3_CUM_PAYLOAD[n_frames - 1]]
    s = encode_mp3_frames(
        prefix, [MP3_BITRATE_CYCLE[k % 2] for k in range(n_frames)]
    )
    frames, rec = parse_mp3(s)
    assert rec == prefix
    assert len(frames) == n_frames


def test_id3v2_size_overrunning_buffer_raises():
    # ADVICE r8: an ID3v2 tag whose declared syncsafe size overruns the
    # buffer must raise, not return ([], b'') as silent success.
    hdr = b"ID3\x04\x00\x00" + bytes([0x00, 0x00, 0x7F, 0x7F])  # ~16 KB declared
    with pytest.raises(ValueError, match="ID3v2 tag declares"):
        parse_mp3(hdr + b"\x00" * 50)  # only 50 tag bytes present


def test_id3v2_tag_exactly_filling_file_yields_zero_frames():
    # a tag that exactly fills the buffer is a complete (if empty)
    # container, not a truncated one — zero frames, loud is wrong here
    hdr = b"ID3\x04\x00\x00" + bytes([0x00, 0x00, 0x00, 0x0A])
    frames, payload = parse_mp3(hdr + b"\x00" * 10)
    assert frames == [] and payload == b""
