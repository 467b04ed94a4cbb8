"""Streaming MinHash near-dup detection: signature parity with the
batch lane, out-of-order volume parity against ``minhash_candidates``,
keeper TTL eviction, state-bound telemetry, and checkpoint restart.
"""

import os
import time

import pandas as pd
import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.operators.dedup import (
    HOT_BUCKET_CAP,
    MINHASH_PERMS,
    band_rows,
    minhash_candidates,
    minhash_signatures,
)
from finance_data_ingestion_pipeline_with_kafka_spark.streaming.dedup_stream import (
    band_hashes,
    banded_doc_rows,
    doc_signature,
    est_jaccard_sigs,
    minhash_bucket_fold,
    minhash_stream,
)
from finance_data_ingestion_pipeline_with_kafka_spark.streaming.sinks import (
    start_memory_sink,
)

BASE_TS = pd.Timestamp("2024-01-02 14:00:00")


def _mk_docs():
    """~40 docs with a clone pair, a boilerplate clique, near-dups and
    distinct filler — every event inside one TTL horizon."""
    base = " ".join(f"w{i}" for i in range(40))
    docs = []
    for i in range(30):
        docs.append((100 + i, " ".join(f"t{i}x{j} filler{j}" for j in range(20))))
    docs += [
        (200, base),
        (201, base),  # exact clone of 200
        (202, base.replace("w7 ", "edited ", 1)),  # near dup
        (203, "clique line " * 15),
        (204, "clique line " * 15),
        (205, "clique line " * 15),
    ]
    return [
        (doc_id, BASE_TS + pd.Timedelta(seconds=7 * k), text)
        for k, (doc_id, text) in enumerate(docs)
    ]


def _doc_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "datetime", "text"])
    )


def test_signature_parity_with_batch(spark):
    """Per-doc Python signatures == the batch expression pipeline."""
    rows = _mk_docs()[:12]
    docs = _doc_df(spark, rows)
    batch = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signatures(docs).collect()
    }
    for doc_id, _ts, text in rows:
        assert doc_signature(text) == batch[doc_id], doc_id


def test_band_hash_parity_with_batch(spark):
    rows = _mk_docs()[:8]
    docs = _doc_df(spark, rows)
    batch = {
        (r["doc_id"], r["band_id"]): r["band_hash"]
        for r in band_rows(minhash_signatures(docs)).collect()
    }
    for doc_id, _ts, text in rows:
        for b, bh in enumerate(band_hashes(doc_signature(text))):
            assert batch[(doc_id, b)] == bh


def test_short_docs_unsignable():
    assert doc_signature("one two") is None
    assert doc_signature("   ") is None
    assert doc_signature("a b c") is not None


def test_bucket_fold_pairs_and_dedup():
    sig_a = "a" * 8 * MINHASH_PERMS
    sig_b = "a" * 8 * (MINHASH_PERMS - 2) + "b" * 16
    keepers, pairs = minhash_bucket_fold(
        [], [(1000, 7, sig_a), (2000, 9, sig_b), (3000, 7, sig_a)]
    )
    # re-delivery of doc 7 dropped; one pair (7, 9)
    assert [(p[0], p[1]) for p in pairs] == [(7, 9)]
    assert pairs[0][2] == (MINHASH_PERMS - 2) / MINHASH_PERMS
    assert [k[0] for k in keepers] == [7, 9]


def test_bucket_fold_ttl_evicts():
    sig = "c" * 8 * MINHASH_PERMS
    keepers, pairs = minhash_bucket_fold(
        [], [(0, 1, sig), (700_000, 2, sig)], ttl_ms=600_000
    )
    assert pairs == []  # keeper 1 evicted before 2 arrived
    assert [k[0] for k in keepers] == [2]


def test_bucket_fold_cap_star_guard():
    sig = "d" * 8 * MINHASH_PERMS
    ripe = [(1000 + i, i, sig) for i in range(40)]
    keepers, pairs = minhash_bucket_fold([], ripe, cap=4)
    assert len(keepers) == 4  # slots never exceed the cap
    # every later doc still pairs against the 4 keepers (star behavior)
    assert sum(1 for p in pairs if p[1] == 39) == 4


def _stream_files(spark, tmp_path, rows, n_files, name):
    """Round-robin-interleave rows into n parquet files (out-of-order
    arrival), plus a far-future sentinel to flush the watermark."""
    src = str(tmp_path / name)
    os.makedirs(src, exist_ok=True)
    chunks = [
        [r for i, r in enumerate(rows) if i % n_files == b]
        for b in range(n_files)
    ]
    chunks.append(
        [(999_999, BASE_TS + pd.Timedelta(days=30), "z z z z z z")]
    )
    now = time.time()
    for b, chunk in enumerate(chunks):
        df = pd.DataFrame(chunk, columns=["doc_id", "datetime", "text"])
        p = os.path.join(src, f"f{b}.parquet")
        spark.createDataFrame(df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        os.utime(p, (now - 120 + 10 * b, now - 120 + 10 * b))
    schema = "doc_id long, datetime timestamp, text string"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*.parquet"))
    )


def _expected_batch_pairs(spark, rows):
    """Batch comparator: distinct candidate pairs + signature-estimated
    jaccard over the same documents."""
    docs = _doc_df(spark, rows)
    sigs = {
        r["doc_id"]: "".join(r["minhash"])
        for r in minhash_signatures(docs).collect()
    }
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates(minhash_signatures(docs)).collect()
    }
    return {
        (a, b): est_jaccard_sigs(sigs[a], sigs[b]) for a, b in pairs
    }


def test_stream_volume_parity_out_of_order(spark, tmp_path):
    """Across interleaved micro-batches the DISTINCT streaming pair set
    (with estimates) equals the batch minhash_candidates set — the
    dedup-at-ingest twin of the nightly batch pass."""
    rows = _mk_docs()
    stream = _stream_files(spark, tmp_path, rows, 5, "mh_vol")
    q = start_memory_sink(
        minhash_stream(stream, watermark="100 hours", ttl_ms=86_400_000),
        "mh_vol_t",
    )
    q.awaitTermination(120)
    got = {}
    for r in spark.sql("SELECT * FROM mh_vol_t").collect():
        if r["doc_a"] == 999_999 or r["doc_b"] == 999_999:
            continue
        got[(r["doc_a"], r["doc_b"])] = r["est_jaccard"]
    assert got == _expected_batch_pairs(spark, rows)
    assert got  # non-vacuous: the fixture contains real near-dups
    # duplicate-delivery safety: per (band, pair) exactly one row
    per_band = [
        ((r["band_id"], r["doc_a"], r["doc_b"]))
        for r in spark.sql("SELECT * FROM mh_vol_t").collect()
    ]
    assert len(per_band) == len(set(per_band))


def test_stream_state_is_bounded(spark, tmp_path):
    """stateOperators telemetry: state rows stay O(active buckets), not
    O(documents) — keepers are capped and the ripe buffer drains."""
    rows = _mk_docs()
    stream = _stream_files(spark, tmp_path, rows, 3, "mh_state")
    q = start_memory_sink(
        minhash_stream(stream, watermark="100 hours", ttl_ms=86_400_000),
        "mh_state_t",
    )
    q.awaitTermination(120)
    progress = q.lastProgress
    n_state = progress["stateOperators"][0]["numRowsTotal"]
    n_buckets = (
        banded_doc_rows(
            _doc_df(spark, rows + [(999_999, BASE_TS, "z z z z z z")])
        )
        .select("band_id", "band_hash")
        .distinct()
        .count()
    )
    assert 0 < n_state <= n_buckets


def test_stream_restart_no_duplicate_pairs(spark, tmp_path):
    """Stop after the first files, restart on the same checkpoint with
    the remaining files: the union of outputs has no duplicated
    (band, pair) row and matches the batch comparator."""
    rows = _mk_docs()
    src = str(tmp_path / "mh_restart")
    ckpt = str(tmp_path / "mh_restart_ckpt")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, datetime timestamp, text string"

    def write_file(chunk, fname, mtime):
        df = pd.DataFrame(chunk, columns=["doc_id", "datetime", "text"])
        p = os.path.join(src, fname)
        spark.createDataFrame(df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        os.utime(p, (mtime, mtime))

    now = time.time()
    half = len(rows) // 2
    write_file(rows[:half], "f0.parquet", now - 100)

    out_dir = str(tmp_path / "mh_restart_out")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*.parquet"))
        )
        q = (
            minhash_stream(stream, watermark="100 hours", ttl_ms=86_400_000)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    write_file(rows[half:], "f1.parquet", now - 80)
    write_file(
        [(999_999, BASE_TS + pd.Timedelta(days=30), "z z z z z z")],
        "f2.parquet",
        now - 60,
    )
    run()

    out = [
        r
        for r in spark.read.parquet(out_dir).collect()
        if r["doc_a"] != 999_999 and r["doc_b"] != 999_999
    ]
    combined = [(r["band_id"], r["doc_a"], r["doc_b"]) for r in out]
    assert len(combined) == len(set(combined))
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in out}
    assert got == _expected_batch_pairs(spark, rows)
