"""Trained byte-pair-encoding merges over the document corpus (SURVEY
§2.10 U6; VERDICT r14 ask #6 — ``bpe_token_count`` counts pre-tokenizer
pieces but never LEARNS merges; this closes the tokenizer-fit story
``vocab_coverage`` audits).

Classic BPE (Sennrich et al. 2016, public): start from words as
character sequences with corpus frequencies, repeatedly merge the most
frequent adjacent symbol pair. The trainer's working set is the DISTINCT
VOCABULARY with counts — vocabulary-cardinality, not corpus-cardinality
— so at 100 TB the only corpus-linear work is one word-count pass; each
of the K fixed merge iterations is one explode+grouped-sum over the
vocab plus a 1-row broadcast of the winning pair (the ``kmeans_refine``
declarative-iteration shape, with ``localCheckpoint`` per round to keep
plan depth constant, like ``near_dup_clusters``).

Symbol sequences are carried as a SENTINEL-WRAPPED STRING rather than an
array: each symbol rides as ``\\x1f<sym>\\x1f``, so word "ab" is
``\\x1fa\\x1f\\x1fb\\x1f``. Merging pair (l, r) is then the literal
string replace ``\\x1fl\\x1f\\x1fr\\x1f → \\x1flr\\x1f`` — and because
``replace`` in BOTH engines substitutes non-overlapping occurrences left
to right, and each symbol's wrappers are private (adjacent matches share
no characters), one replace call IS one greedy BPE merge pass:
``[a,a,a,a]`` → ``[aa,aa]``, exactly the reference algorithm. Every
count is an integer and the winning pair tie-breaks (count DESC, lhs
ASC, rhs ASC) — bit-exact across engines, no floats anywhere.

Determinism caveat pinned by tests: the corpus must yield at least
``BPE_MERGES`` distinct pairs (it does at every fixture SF; a crafted
two-char corpus exhausts earlier and the trainer would emit fewer rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

#: symbol sentinel — any char absent from the token alphabet works; the
#: fixtures are lowercase-ascii words, and real corpora would strip or
#: escape 0x1f during pre-tokenization.
SEP = "\x1f"
BPE_MERGES = 6
_TOKEN_SPLIT = r"\s+"


def _vocab(docs: DataFrame) -> DataFrame:
    """(s, freq): sentinel-wrapped character sequence per DISTINCT word
    with its corpus frequency — the trainer's entire working set."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), _TOKEN_SPLIT)).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.regexp_replace("w", "(.)", f"{SEP}$1{SEP}").alias("s"), "freq"
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent-symbol pair frequencies over the vocab,
    freq-weighted. Symbols are recovered by stripping the outer
    sentinels and splitting on the double sentinel between symbols."""
    syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP)
    n = F.size(syms)
    zipped = F.arrays_zip(
        F.slice(syms, F.lit(1), n - 1), F.slice(syms, F.lit(2), n - 1)
    )
    return (
        vocab.filter(n >= 2)
        .select("freq", F.explode(zipped).alias("z"))
        .groupBy(F.col("z.0").alias("l"), F.col("z.1").alias("r"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _best_pair(vocab: DataFrame) -> DataFrame:
    """1-row (l, r, cnt): the most frequent pair, (cnt DESC, l, r)
    tie-broken — broadcast into the merge-apply step."""
    return _pair_counts(vocab).orderBy(F.desc("cnt"), "l", "r").limit(1)


def _apply_merge(df: DataFrame, best: DataFrame, col: str = "s") -> DataFrame:
    """Replace every non-overlapping ``(l, r)`` adjacency in ``col`` with
    the merged symbol — one greedy BPE pass (see module docstring)."""
    pat = F.concat(F.lit(SEP), F.col("l"), F.lit(SEP + SEP), F.col("r"), F.lit(SEP))
    rep = F.concat(F.lit(SEP), F.col("l"), F.col("r"), F.lit(SEP))
    keep = [c for c in df.columns if c != col]
    return df.crossJoin(F.broadcast(best)).select(
        *keep, F.replace(F.col(col), pat, rep).alias(col)
    )


def train_merges(docs: DataFrame, k: int = BPE_MERGES) -> list[DataFrame]:
    """Learn ``k`` merges; returns the k 1-row best-pair DataFrames in
    merge order (each over a checkpointed vocab state, so the combined
    plan depth stays constant per round)."""
    vocab = _vocab(docs).localCheckpoint(eager=True)
    bests: list[DataFrame] = []
    for _ in range(k):
        best = _best_pair(vocab).localCheckpoint(eager=True)
        bests.append(best)
        vocab = _apply_merge(vocab, best).localCheckpoint(eager=True)
    return bests


def _trainer_ctes(k: int = BPE_MERGES) -> str:
    """DuckDB twin of ``train_merges``: chained (p, b, w) CTEs per merge."""
    parts = [
        f"""words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT UNNEST(string_split_regex(trim(text), '\\s+')) AS w FROM documents
      ) WHERE w <> '' GROUP BY w
    ), w0 AS MATERIALIZED (
      SELECT regexp_replace(w, '(.)', '{SEP}\\1{SEP}', 'g') AS s, freq FROM words
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""p{i} AS (
      SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT freq, syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT) + 1] AS r
        FROM (SELECT freq, string_split(s[2:-2], '{SEP}{SEP}') AS syms FROM w{i - 1}),
             UNNEST(range(1, len(syms))) AS t(i)
      ) GROUP BY l, r
    ), b{i} AS MATERIALIZED (
      SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1
    ), w{i} AS MATERIALIZED (
      SELECT replace(s, '{SEP}' || l || '{SEP}{SEP}' || r || '{SEP}',
                        '{SEP}' || l || r || '{SEP}') AS s, freq
      FROM w{i - 1} CROSS JOIN b{i}
    )"""
        )
    return ", ".join(parts)


_TRAIN_ORACLE = (
    "WITH "
    + _trainer_ctes()
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT {i} AS step, l AS lhs, r AS rhs, l || r AS merged,"
        f" cnt AS pair_count FROM b{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    + "\n    ORDER BY step"
)


@query("bpe_train_merges", oracle=_TRAIN_ORACLE, tags=("U6",), prepared=False)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Learn the top-{BPE_MERGES} BPE merges on the corpus — the
    merge table a tokenizer trainer ships (step, lhs, rhs, merged,
    pair_count), oracle-exact because every step is integer counting plus
    a deterministic tie-break (module docstring). ``prepared=False``: the
    trainer checkpoints per merge round."""
    docs = load_table(spark, sf_dir, "documents")
    bests = train_merges(docs)
    rows = [
        b.select(
            F.lit(i + 1).cast("int").alias("step"),
            F.col("l").alias("lhs"),
            F.col("r").alias("rhs"),
            F.concat("l", "r").alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        for i, b in enumerate(bests)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("step")


_APPLY_ORACLE = (
    "WITH "
    + _trainer_ctes()
    + f""", d0 AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
             list_aggregate(
               list_transform(string_split_regex(trim(text), '\\s+'),
                              w -> regexp_replace(w, '(.)', '{SEP}\\1{SEP}', 'g')),
               'string_agg', '|') AS s
      FROM documents
    ), """
    + ", ".join(
        f"""d{i} AS (
      SELECT doc_id, n_words,
             replace(s, '{SEP}' || b{i}.l || '{SEP}{SEP}' || b{i}.r || '{SEP}',
                        '{SEP}' || b{i}.l || b{i}.r || '{SEP}') AS s
      FROM d{i - 1} CROSS JOIN b{i}
    )"""
        for i in range(1, BPE_MERGES + 1)
    )
    + f"""
    SELECT doc_id, n_words,
           n_words + CAST(length(s) - length(replace(s, '{SEP}{SEP}', '{SEP}'))
                     AS BIGINT) AS n_tokens_bpe,
           md5(s) AS tok_md5
    FROM d{BPE_MERGES}
    ORDER BY doc_id"""
)


@query("bpe_apply_tokenize", oracle=_APPLY_ORACLE, tags=("U6",), prepared=False)
def bpe_apply_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Apply the learned merge table to the corpus — per-doc BPE
    token counts + a tokenization fingerprint. The doc rides as its
    words' wrapped symbol strings joined by ``|`` (a char outside the
    sentinel scheme, so no merge pattern can cross a word boundary) and
    the K merges chain as K broadcast-1-row replaces — corpus-linear,
    narrow, whole-stage-codegen string work; token count falls out of
    the double-sentinel count, no re-tokenization pass."""
    docs = load_table(spark, sf_dir, "documents")
    bests = train_merges(docs)
    words = F.split(F.trim(F.col("text")), _TOKEN_SPLIT)
    out = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.array_join(
            F.transform(
                words, lambda w: F.regexp_replace(w, "(.)", f"{SEP}$1{SEP}")
            ),
            "|",
        ).alias("s"),
    )
    for best in bests:
        out = _apply_merge(out, best)
    n_dseps = F.length("s") - F.length(F.replace(F.col("s"), F.lit(SEP + SEP), F.lit(SEP)))
    return out.select(
        "doc_id",
        "n_words",
        (F.col("n_words") + n_dseps).cast("long").alias("n_tokens_bpe"),
        F.md5(F.encode("s", "utf-8")).alias("tok_md5"),
    ).orderBy("doc_id")
