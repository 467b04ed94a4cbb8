"""Adversarial-bytes fuzz over every dependency-free media parser: on
ARBITRARY input each parser must either return a well-formed result or
raise a clean, documented error (ValueError / NotImplementedError) —
never an IndexError/struct.error/infinite loop. At 100 TB the decode
UDFs run on untrusted corpus bytes inside executors; an unhandled
exception type escapes the per-document error-handling pattern and
fails whole tasks."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from finance_data_ingestion_pipeline_with_kafka_spark.operators.jpeg import (
    decode_jpeg_structure,
)
from finance_data_ingestion_pipeline_with_kafka_spark.operators.mp3 import parse_mp3
from finance_data_ingestion_pipeline_with_kafka_spark.operators.mp4 import parse_mp4
from finance_data_ingestion_pipeline_with_kafka_spark.operators.gif import decode_gif
from finance_data_ingestion_pipeline_with_kafka_spark.operators.multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
)

OK_ERRORS = (ValueError, NotImplementedError)

# random bytes, plus variants seeded with each format's magic so the
# fuzz reaches past the signature check into the structure walk
_seeded = st.one_of(
    st.binary(max_size=400),
    st.binary(max_size=400).map(lambda b: b"\xff\xd8" + b),
    st.binary(max_size=400).map(lambda b: b"ID3\x03\x00\x00" + b),
    st.binary(max_size=400).map(lambda b: b"\xff\xfb" + b),
    st.binary(max_size=400).map(lambda b: b"BM" + b),
    st.binary(max_size=400).map(lambda b: b"\x89PNG\r\n\x1a\n" + b),
    st.binary(max_size=400).map(lambda b: b"RIFF" + b),
    st.binary(max_size=400).map(lambda b: b"\x00\x00\x00\x10ftyp" + b),
    st.binary(max_size=400).map(lambda b: b"GIF89a" + b),
)


@settings(max_examples=200, deadline=None)
@given(_seeded)
def test_parsers_fail_cleanly_on_arbitrary_bytes(data):
    for parser in (
        decode_jpeg_structure,
        parse_mp3,
        parse_mp4,
        decode_bmp,
        decode_png,
        decode_wav,
        decode_gif,
    ):
        try:
            parser(data)
        except OK_ERRORS:
            pass  # documented failure contract
        # anything else (IndexError, struct.error, KeyError, ...)
        # propagates and fails the test


def _mutate(rng, valid: bytes) -> bytes:
    b = bytearray(valid)
    for _ in range(rng.randint(1, 4)):
        op = rng.random()
        if op < 0.5:
            b[rng.randrange(len(b))] = rng.randrange(256)
        elif op < 0.75 and len(b) > 4:
            del b[rng.randrange(len(b))]
        else:
            b.insert(rng.randrange(len(b)), rng.randrange(256))
    if rng.random() < 0.3:
        b = b[: rng.randrange(len(b))]
    return bytes(b)


def test_mutated_valid_streams_fail_cleanly():
    """Mutations of VALID streams penetrate far deeper than random bytes
    (past signatures into table/entropy layers); every parser must still
    fail only with its documented error types. Deterministic seed."""
    import random

    import numpy as np

    from finance_data_ingestion_pipeline_with_kafka_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_coefficients,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.mp3 import (
        encode_mp3_frames,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.mp4 import (
        encode_mp4,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.gif import (
        encode_gif,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        encode_wav,
    )

    coefs = np.arange(-32, 32, dtype=np.int64).reshape(1, 64).repeat(2, axis=0)
    cases = [
        (encode_jpeg_coefficients(coefs, 2, restart_interval=1), decode_jpeg_structure),
        (encode_jpeg_coefficients(coefs, 2), decode_jpeg),
        (encode_mp3_frames(bytes(252), [1, 3]), parse_mp3),
        (encode_mp4(bytes(64)), parse_mp4),
        (encode_bmp(bytes(36), 4, 3), decode_bmp),
        (encode_png(bytes(39), 13, 1), decode_png),
        (encode_wav(bytes(40), 8000), decode_wav),
        (encode_gif(bytes(range(33)) + b"abcabc", 13, 3), decode_gif),
    ]
    rng = random.Random(1234)
    for valid, parser in cases:
        for _ in range(600):
            try:
                parser(_mutate(rng, valid))
            except OK_ERRORS:
                pass
