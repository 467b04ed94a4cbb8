"""pHash image near-dup: crafted near-identical fixtures, hand-traced
DCT reference, detector separation, and plan-shape checks.

The oracle-parity of ``phash_near_dup`` / ``phash_recall`` is covered by
the full-catalog sweep in ``test_oracle_queries``; these tests pin the
SEMANTICS (a single-token edit stays within the Hamming budget, an
unrelated document does not) and the kernel arithmetic against an
independent loop-nest reimplementation.
"""

import math

import numpy as np
import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.operators.phash import (
    PHASH_BAND,
    PHASH_DIM,
    PHASH_HAMMING,
    PHASH_SCALE,
    _DCT_ROWS,
    phash64,
    phash_pairs,
    token_raster,
)


def _phash_reference(text: str) -> int:
    """Independent straight-loop reimplementation (no numpy matmul, no
    codec): the test's own ground truth for the integer pipeline."""
    raster = token_raster(text)
    b = [
        [raster[y * PHASH_DIM + x] for x in range(PHASH_DIM)]
        for y in range(PHASH_DIM)
    ]
    c = [[0] * PHASH_DIM for _ in range(PHASH_BAND)]
    for u, x, v in _DCT_ROWS:
        c[u][x] = v
    flat = []
    for u in range(PHASH_BAND):
        for v in range(PHASH_BAND):
            d = sum(
                b[y][x] * c[u][y] * c[v][x]
                for y in range(PHASH_DIM)
                for x in range(PHASH_DIM)
            )
            flat.append(d)
    flat = flat[1:]
    med = sorted(flat)[31]
    return sum(1 << i for i, val in enumerate(flat) if val > med)


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


#: Corpus-typical document length: on sparse short docs each token is a
#: large fraction of the raster's energy and a single edit can flip more
#: near-median bits than the detector budget — exactly the regime where
#: real image pHash also degrades (tiny images). 300 tokens matches the
#: documents table's scale.
BASE = " ".join(f"token{i}" for i in range(300))


def test_dct_basis_values():
    """Spot-check the embedded integer basis against its definition."""
    table = {(u, x): c for u, x, c in _DCT_ROWS}
    assert table[(0, 0)] == round(PHASH_SCALE / math.sqrt(2.0)) == 5793
    assert table[(1, 0)] == round(
        math.cos(math.pi * 1 / 64) * PHASH_SCALE
    )
    assert table[(7, 31)] == round(
        math.cos(math.pi * 63 * 7 / 64) * PHASH_SCALE
    )
    assert len(_DCT_ROWS) == PHASH_BAND * PHASH_DIM


def test_phash_matches_loop_reference():
    for text in (BASE, "the quick brown fox " * 10, "a b c " * 40):
        assert phash64(text) == _phash_reference(text)


def test_identical_texts_hash_identically():
    assert phash64(BASE) == phash64(BASE)
    assert hamming(phash64(BASE), phash64(BASE)) == 0


def test_single_token_edit_stays_near():
    """A one-token substitution moves two pixels of the 1024-pixel
    raster — the hash must stay within the detector's Hamming budget."""
    edited = BASE.replace("token30 ", "changed ", 1)
    d = hamming(phash64(BASE), phash64(edited))
    assert 0 <= d <= PHASH_HAMMING, d


def test_unrelated_text_hashes_far():
    other = " ".join(f"word{i}" for i in range(300))
    d = hamming(phash64(BASE), phash64(other))
    assert d > 3 * PHASH_HAMMING, d


def test_insertion_is_local_not_shifting():
    """The motivating property: inserting one token near the front must
    NOT re-render every later pixel (a byte-stream tiling would)."""
    inserted = "extra " + BASE
    r0, r1 = token_raster(BASE), token_raster(inserted)
    ndiff = sum(1 for a, b in zip(r0, r1) if a != b)
    assert ndiff <= 2, ndiff  # only the inserted token's bucket moves


def test_raster_saturates():
    text = " ".join(["rep"] * 20 + ["one"])
    r = token_raster(text)
    assert max(r) == 255
    assert sorted(set(r))[:2] == [0, 32]


def test_pairs_detect_clone_and_edit_not_distinct(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    BASE,
                    BASE,  # exact clone → Hamming 0
                    BASE.replace("token30 ", "changed ", 1),  # near dup
                    " ".join(f"word{i}" for i in range(300)),  # distinct
                ],
            }
        )
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming for r in phash_pairs(docs).collect()
    }
    assert got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] <= PHASH_HAMMING
    assert (2, 3) in got
    assert not any(4 in pair for pair in got)


def test_spark_kernel_matches_python(spark, sf_dir):
    """The mapInPandas column agrees with the driver-side kernel on real
    corpus rows (first 20 docs)."""
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.phash import (
        phash_column,
    )

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 20")
    rows = {r.doc_id: r.phash for r in phash_column(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        assert rows[r.doc_id] == phash64(r.text)


def test_phash_plan_has_no_cartesian(spark, sf_dir):
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

    plan = (
        load_all()["phash_near_dup"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
