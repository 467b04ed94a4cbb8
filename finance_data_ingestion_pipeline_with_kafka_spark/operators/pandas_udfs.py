"""Pandas UDF / UDAF / UDTF surface (SURVEY §2.10 U1–U3).

These exist to prove the Arrow-batched Python escape hatch with exact,
oracle-checkable semantics — each one computes something deterministic
(integer or per-row arithmetic) so the DuckDB oracle matches bit-for-bit.
The hot path of the engine never needs them; they are the pattern for
logic Spark builtins genuinely can't express (custom models, tokenizers).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table
from ..registry import query


@pandas_udf(IntegerType())
def _token_count(text: pd.Series) -> pd.Series:
    """U1: scalar Series→Series pandas UDF (Arrow-batched)."""
    return text.str.strip().str.split(r"\s+", regex=True).str.len().astype("int32")


@query(
    "pandas_udf_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("U1",),
)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U1] Scalar pandas UDF token counter — same semantics as the
    built-in ``size(split(...))`` (which remains the production path;
    the UDF proves the Arrow boundary)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", _token_count("text").alias("n_tokens")).orderBy("doc_id")


_FLIPS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_flips", LongType()),
    ]
)


def _sign_flips(pdf: pd.DataFrame) -> pd.DataFrame:
    """U2 kernel: count direction changes of `value` in event-time order —
    integer result, so exact under any oracle."""
    pdf = pdf.sort_values(["ts", "event_id"])
    diffs = pdf["value"].diff().dropna()
    signs = diffs[diffs != 0].apply(lambda x: 1 if x > 0 else -1)
    flips = int((signs != signs.shift()).sum()) - (1 if len(signs) else 0)
    return pd.DataFrame(
        {"user_id": [pdf["user_id"].iloc[0]], "n_events": [len(pdf)], "n_flips": [flips]}
    )


@query(
    "grouped_pandas_sign_flips",
    oracle="""
    WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    diffs AS (
      SELECT user_id, ts, event_id,
             value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
      FROM events_us
    ), signs AS (
      -- keep (ts, event_id) as the explicit sequence key: a bare
      -- ROW_NUMBER() with no ORDER BY is nondeterministic under parallel
      -- DuckDB execution (surfaced at sf0.1)
      SELECT user_id, ts, event_id, CASE WHEN d > 0 THEN 1 ELSE -1 END AS s
      FROM diffs WHERE d IS NOT NULL AND d <> 0
    )
    SELECT e.user_id,
           COUNT(*) AS n_events,
           COALESCE(f.n_flips, 0) AS n_flips
    FROM events_us e
    LEFT JOIN (
      SELECT user_id, COUNT(*) AS n_flips
      FROM (SELECT user_id, s,
                   LAG(s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
            FROM signs)
      WHERE prev_s IS NOT NULL AND s <> prev_s
      GROUP BY user_id
    ) f USING (user_id)
    GROUP BY e.user_id, f.n_flips
    ORDER BY user_id
    """,
    tags=("U2",),
)
def grouped_pandas_sign_flips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U2] Grouped-map pandas UDAF via ``applyInPandas``: per-user count
    of direction changes in the time-ordered value series."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .applyInPandas(_sign_flips, schema=_FLIPS_SCHEMA)
        .orderBy("user_id")
    )


_EXPLODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("position", IntegerType()),
        StructField("token", StringType()),
    ]
)


def _tokenize_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """U3 kernel: one input row → N output rows (UDTF shape)."""
    for pdf in batches:
        out_doc, out_pos, out_tok = [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            for i, tok in enumerate(str(text).strip().split()):
                out_doc.append(doc_id)
                out_pos.append(i)
                out_tok.append(tok)
        yield pd.DataFrame({"doc_id": out_doc, "position": out_pos, "token": out_tok})


@query(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(u.position - 1 AS INT) AS position,
           u.token AS token
    FROM (SELECT doc_id,
                 unnest(list_transform(string_split_regex(trim(text), '\\s+'),
                                       (x, i) -> {'token': x, 'position': i})) AS u
          FROM documents WHERE doc_id < 50)
    ORDER BY doc_id, position
    """,
    tags=("U3",),
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U3] UDTF-style row expansion via ``mapInPandas`` (1 row → N rows):
    positional tokenization of a document subset."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select("doc_id", "text")
        .mapInPandas(_tokenize_rows, schema=_EXPLODE_SCHEMA)
        .orderBy("doc_id", "position")
    )


@query(
    "udtf_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id, UNNEST(range(len(t) - 1)) AS pos,
           UNNEST(list_transform(list_zip(t[:len(t)-1], t[2:]), s -> s[1] || ' ' || s[2])) AS ngram
    FROM toks WHERE len(t) >= 2
    ORDER BY doc_id, pos
    """,
    tags=("U3",),
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U3] A real Python UDTF (Spark 4 ``@udtf``, Arrow-optimized) used
    via ``LATERAL`` — one input row expands to N output rows inside the
    executor, streaming batches over Arrow. This is the genuine UDTF
    surface next to the ``mapInPandas`` formulation in
    :func:`udtf_tokenize`; prefer built-in ``explode`` when the expansion
    is expressible — a Python UDTF is for logic builtins can't state."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, ngram string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):
            toks = (text or "").strip().split()
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("engine_bigrams", Bigrams)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.ngram
        FROM _udtf_docs d, LATERAL engine_bigrams(d.text) t
        ORDER BY doc_id, pos
        """
    )
