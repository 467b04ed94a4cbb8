"""Unigram-LM (SentencePiece-style) tokenizer training and application
— the complement of the trained-BPE lane (``operators/bpe.py``): where
BPE learns merges bottom-up, the unigram LM starts from a substring
candidate vocabulary and refines piece scores by iterative
re-segmentation (hard-EM / Viterbi-EM), then tokenizes by best-path
segmentation.

Exactness contract (the same discipline as the graph fixed-point
lanes): every quantity is integer. Piece scores are saturating counts
(``LEAST(999, count)``), and the Viterbi objective is the
deterministic total order

    (fewest pieces) → (largest product of piece scores) → (lexico-
    smallest piece sequence)

— a length-penalized maximum-likelihood segmentation whose product
term never exceeds ``999^12 < 10^36`` (words are capped at 12 chars,
scores at 999), so DuckDB evaluates it exactly in HUGEINT and Python
in arbitrary-precision int: no floats, no cross-engine log/exp trust,
no tie ambiguity. K = 2 EM rounds, fixed (declarative iteration, like
``kmeans_refine`` / ``domain_pagerank``).

100 TB posture: the corpus is touched only by distributed token
counting and (per EM round) a re-count aggregation; the model — a few
hundred (piece, score) rows — is collected and broadcast per round,
the same small-model boundary as IVF centroids
(``operators/similarity.py``). Per-word Viterbi runs in an
Arrow-batched ``mapInPandas`` over the DISTINCT-word frame (work ∝
vocabulary, not corpus), and every score update is a hash aggregation
on piece keys. Nothing driver-side ever scales with the corpus.

Reference parity: the reference has no tokenizer at all (SURVEY §2
U6's text-analysis row is the declared surface); this lane exists for
the LLM-training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .text import tokens

#: Words longer than this are excluded from training and tokenization
#: (both engines) — keeps the exact product term inside HUGEINT.
UL_WORD_CAP = 12
#: Saturation ceiling for piece scores: 999^12 < 2^127 and < 10^38.
UL_SCORE_CAP = 999
#: Multi-char candidate pieces kept (top by corpus frequency); single
#: chars are always kept for segmentation coverage.
UL_VOCAB_MULTI = 200
#: Candidate piece lengths 1..4.
UL_PIECE_MAX = 4
#: Fixed EM rounds.
UL_EM_ROUNDS = 2
#: Piece separator inside a segmentation path (never appears in
#: whitespace-split corpus tokens).
UL_SEP = chr(31)
#: Rows emitted by the two catalog queries.
UL_TRAIN_TOP = 50
UL_TOKENIZE_TOP = 200


def viterbi_segment(word: str, scores: dict[str, int]) -> tuple[int, str]:
    """(n_pieces, path) of the best segmentation of ``word`` under the
    exact total order (k ASC, product DESC, path ASC). ``scores`` maps
    piece → integer score; pieces with score < 1 are unusable. Single
    chars are guaranteed usable by vocabulary construction, so the DP
    always completes."""
    n = len(word)
    # dp[p] = (k, -prod, path) — min() under this tuple IS the order
    dp: list[tuple[int, int, str] | None] = [None] * (n + 1)
    dp[0] = (0, -1, "")
    for p in range(1, n + 1):
        best = None
        for j in range(1, min(UL_PIECE_MAX, p) + 1):
            prev = dp[p - j]
            if prev is None:
                continue
            piece = word[p - j : p]
            s = scores.get(piece, 0)
            if s < 1:
                continue
            k, negprod, path = prev
            cand = (
                k + 1,
                negprod * s,  # both negative-scaled: (-a)·s = -(a·s)
                piece if path == "" else path + UL_SEP + piece,
            )
            if best is None or cand < best:
                best = cand
        dp[p] = best
    assert dp[n] is not None, f"uncoverable word {word!r}"
    k, _negprod, path = dp[n]
    return k, path


def _word_counts(docs: DataFrame) -> DataFrame:
    """(word, freq) over whitespace tokens with 1 ≤ len ≤ cap —
    distributed token counting, the only corpus-wide pass."""
    return (
        docs.select(F.explode(tokens()).alias("word"))
        .filter(F.length("word").between(1, UL_WORD_CAP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _candidate_scores(words: DataFrame) -> DataFrame:
    """Initial (piece, score): all substrings of length 1..4 weighted by
    word frequency; top ``UL_VOCAB_MULTI`` multi-char pieces by
    (freq DESC, piece ASC) plus every single char."""
    from pyspark.sql import Window

    subs = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda s: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(UL_PIECE_MAX), F.length("word") - s + 1
                            ),
                        ),
                        lambda j: F.substring(F.col("word"), s, j),
                    ),
                )
            )
        ).alias("piece"),
        "freq",
    )
    freq = subs.groupBy("piece").agg(F.sum("freq").alias("freq"))
    multi = (
        freq.filter(F.length("piece") >= 2)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("freq").desc(), F.col("piece"))
            ),
        )
        .filter(F.col("rn") <= UL_VOCAB_MULTI)
        .drop("rn")
    )
    single = freq.filter(F.length("piece") == 1)
    return multi.unionByName(single).select(
        "piece",
        F.least(
            F.lit(UL_SCORE_CAP), F.greatest(F.col("freq"), F.lit(1))
        )
        .cast("long")
        .alias("score"),
    )


def _segment_words(
    words: DataFrame, scores: dict[str, int]
) -> DataFrame:
    """(word, freq, n_pieces, path) via per-word Viterbi in an Arrow
    batch — ``scores`` is the broadcast small model."""
    from collections.abc import Iterator

    import pandas as pd

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks, paths = [], []
            for w in pdf["word"]:
                k, path = viterbi_segment(w, scores)
                ks.append(k)
                paths.append(path)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "freq": pdf["freq"],
                    "n_pieces": ks,
                    "path": paths,
                }
            )

    return words.mapInPandas(
        seg, "word string, freq long, n_pieces int, path string"
    )


def _recount_scores(seg: DataFrame, vocab: DataFrame) -> DataFrame:
    """Next-round (piece, score): pieces re-counted from the chosen
    segmentations (weight = word freq); multi-char pieces may drop to 0
    (unusable next round), single chars stay ≥ 1 for coverage."""
    cnt = (
        seg.select(
            F.explode(F.split("path", UL_SEP)).alias("piece"), "freq"
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    return (
        vocab.select("piece")
        .join(cnt, "piece", "left")
        .select(
            "piece",
            F.when(
                F.length("piece") == 1,
                F.least(
                    F.lit(UL_SCORE_CAP),
                    F.greatest(F.coalesce(F.col("cnt"), F.lit(0)), F.lit(1)),
                ),
            )
            .otherwise(
                F.least(
                    F.lit(UL_SCORE_CAP),
                    F.coalesce(F.col("cnt"), F.lit(0)),
                )
            )
            .cast("long")
            .alias("score"),
        )
    )


def _train(spark: SparkSession, sf_dir: str):
    """Run the fixed-round Viterbi-EM: returns (final scores DataFrame,
    final segmentation DataFrame). Each round collects only the model
    (a few hundred rows — the IVF-centroid boundary); the corpus-scale
    frames never leave the cluster."""
    docs = load_table(spark, sf_dir, "documents")
    words = _word_counts(docs)
    vocab = _candidate_scores(words)
    score_df = vocab
    seg = None
    for _ in range(UL_EM_ROUNDS):
        model = {r["piece"]: r["score"] for r in score_df.collect()}
        seg = _segment_words(words, model)
        score_df = _recount_scores(seg, vocab)
    return score_df, seg


def _ul_cte() -> str:
    """Oracle CTE chain reproducing the whole pipeline in DuckDB: token
    counting, substring candidates, the unrolled per-position Viterbi DP
    (exact HUGEINT products, row_number over the same total order), and
    the two EM re-counts. Terminates in ``ul_score_final`` (piece,
    score) and ``ul_seg_final`` (word, freq, n_pieces, path)."""
    dp_rounds = []
    for r in range(1, UL_EM_ROUNDS + 1):
        score_tbl = f"ul_score{r - 1}"
        chain = [
            f"dp{r}_0 AS MATERIALIZED (SELECT word, freq, 0 AS k, 1::HUGEINT AS prod,"
            f" '' AS path FROM ul_words)"
        ]
        for p in range(1, UL_WORD_CAP + 1):
            exts = []
            for j in range(1, min(UL_PIECE_MAX, p) + 1):
                exts.append(f"""
        SELECT d.word, d.freq, d.k + 1 AS k, d.prod * v.score AS prod,
               CASE WHEN d.path = '' THEN v.piece
                    ELSE d.path || chr(31) || v.piece END AS path
        FROM dp{r}_{p - j} d
        JOIN {score_tbl} v
          ON v.piece = substr(d.word, {p - j + 1}, {j}) AND v.score >= 1
        WHERE length(d.word) >= {p}""")
            union = " UNION ALL ".join(exts)
            chain.append(f"""
    dp{r}_{p} AS MATERIALIZED (
      SELECT word, freq, k, prod, path FROM (
        SELECT word, freq, k, prod, path,
               row_number() OVER (
                 PARTITION BY word ORDER BY k, prod DESC, path) AS rn
        FROM ({union})
      ) WHERE rn = 1
    )""")
        done = " UNION ALL ".join(
            f"SELECT word, freq, k, path FROM dp{r}_{p}"
            f" WHERE length(word) = {p}"
            for p in range(1, UL_WORD_CAP + 1)
        )
        chain.append(f"""
    ul_seg{r} AS MATERIALIZED (
      SELECT word, freq, CAST(k AS INT) AS n_pieces, path FROM ({done})
    )""")
        chain.append(f"""
    ul_cnt{r} AS (
      SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split(path, chr(31))) AS piece, freq
        FROM ul_seg{r}
      ) GROUP BY piece
    )""")
        chain.append(f"""
    ul_score{r} AS MATERIALIZED (
      SELECT v.piece,
             CAST(CASE WHEN length(v.piece) = 1
                  THEN LEAST({UL_SCORE_CAP},
                             GREATEST(COALESCE(c.cnt, 0), 1))
                  ELSE LEAST({UL_SCORE_CAP}, COALESCE(c.cnt, 0))
             END AS BIGINT) AS score
      FROM ul_vocab0 v LEFT JOIN ul_cnt{r} c ON c.piece = v.piece
    )""")
        dp_rounds.append(",\n".join(chain))
    rounds_sql = ",\n".join(dp_rounds)
    return f"""
    ul_words AS MATERIALIZED (
      SELECT tok AS word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
      ) WHERE length(tok) BETWEEN 1 AND {UL_WORD_CAP}
      GROUP BY tok
    ),
    ul_subs AS (
      SELECT substr(w.word, CAST(s.s AS INT), CAST(j.j AS INT)) AS piece,
             SUM(w.freq) AS freq
      FROM ul_words w, range(1, {UL_WORD_CAP + 1}) s(s),
           range(1, {UL_PIECE_MAX + 1}) j(j)
      WHERE s.s + j.j - 1 <= length(w.word)
      GROUP BY piece
    ),
    ul_vocab0 AS MATERIALIZED (
      SELECT piece, freq FROM (
        SELECT piece, freq,
               row_number() OVER (ORDER BY freq DESC, piece) AS rn
        FROM ul_subs WHERE length(piece) >= 2
      ) WHERE rn <= {UL_VOCAB_MULTI}
      UNION ALL
      SELECT piece, freq FROM ul_subs WHERE length(piece) = 1
    ),
    ul_score0 AS MATERIALIZED (
      SELECT piece,
             CAST(LEAST({UL_SCORE_CAP}, GREATEST(freq, 1)) AS BIGINT)
               AS score
      FROM ul_vocab0
    ),
{rounds_sql},
    ul_score_final AS (SELECT * FROM ul_score{UL_EM_ROUNDS}),
    ul_seg_final AS (SELECT * FROM ul_seg{UL_EM_ROUNDS})"""


@query(
    "unigram_lm_train",
    oracle=f"""
    WITH {_ul_cte()}
    SELECT piece, score, rank FROM (
      SELECT piece, score,
             CAST(row_number() OVER (ORDER BY score DESC, piece) AS BIGINT)
               AS rank
      FROM ul_score_final
    ) WHERE rank <= {UL_TRAIN_TOP}
    ORDER BY rank
    """,
    tags=("U6",),
    prepared=False,  # construction collects the per-round model — the
    # prepared-plan cache would replay stored model rows, not re-train
    crossover=False,  # fixed-iteration EM — convergence loops are
    # excluded from the volume-crossover phase by standing policy
)
def unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Unigram-LM tokenizer training (SentencePiece-style hard-EM):
    substring candidate vocabulary (top {UL_VOCAB_MULTI} multi-char
    pieces + all single chars) → K=2 rounds of corpus re-segmentation
    under the exact integer Viterbi order → saturating-count piece
    scores. Emits the top-{UL_TRAIN_TOP} final pieces. The oracle
    replays the identical pipeline in SQL, DP unrolled per position
    with HUGEINT products."""
    from pyspark.sql import Window

    score_df, _seg = _train(spark, sf_dir)
    return (
        score_df.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("piece")))
            .cast("long"),
        )
        .filter(F.col("rank") <= UL_TRAIN_TOP)
        .orderBy("rank")
        .select("piece", "score", "rank")
    )


@query(
    "unigram_lm_tokenize",
    oracle=f"""
    WITH {_ul_cte()}
    SELECT word, CAST(freq AS BIGINT) AS freq,
           replace(path, chr(31), ' ') AS seg, n_pieces
    FROM (
      SELECT word, freq, path, n_pieces,
             row_number() OVER (ORDER BY freq DESC, word) AS rn
      FROM ul_seg_final
    ) WHERE rn <= {UL_TOKENIZE_TOP}
    ORDER BY freq DESC, word
    """,
    tags=("U6",),
    prepared=False,
    crossover=False,
)
def unigram_lm_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Viterbi tokenization under the trained unigram LM: the
    final-round segmentation of the {UL_TOKENIZE_TOP} most frequent
    corpus words — fewest pieces, then highest score product, then
    lexico-smallest pieces, ties impossible beyond that (the order is
    total). ``seg`` joins pieces with spaces (words are whitespace-free
    by construction)."""
    from pyspark.sql import Window

    _scores, seg = _train(spark, sf_dir)
    return (
        seg.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("freq").desc(), F.col("word"))
            ),
        )
        .filter(F.col("rn") <= UL_TOKENIZE_TOP)
        .orderBy(F.col("freq").desc(), "word")
        .select(
            "word",
            F.col("freq").cast("long").alias("freq"),
            F.translate("path", UL_SEP, " ").alias("seg"),
            "n_pieces",
        )
    )


@query(
    "unigram_lm_eval",
    oracle=f"""
    WITH {_ul_cte()},
    used AS (
      SELECT DISTINCT unnest(string_split(path, chr(31))) AS piece
      FROM ul_seg_final
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(freq) AS BIGINT) AS n_tokens,
             CAST(SUM(freq * n_pieces) AS BIGINT) AS total_pieces,
             CAST(SUM(freq * length(word)) AS BIGINT) AS total_chars
      FROM ul_seg_final
    )
    SELECT n_words, n_tokens, total_pieces, total_chars,
           CAST(total_pieces AS DOUBLE) / n_tokens AS pieces_per_token,
           CAST(total_chars AS DOUBLE) / total_pieces AS chars_per_piece,
           CAST((SELECT COUNT(*) FROM used) AS BIGINT) AS vocab_used,
           CAST((SELECT COUNT(*) FROM ul_vocab0) AS BIGINT) AS vocab_size
    FROM stats
    """,
    tags=("U6",),
    prepared=False,
    crossover=False,
)
def unigram_lm_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Acceptance metric for the trained tokenizer — the numbers an
    operator reads before adopting a vocabulary: corpus compression
    (pieces per token — 1.0 means every word is one piece, higher means
    fragmentation), piece granularity (chars per piece), and vocabulary
    utilization (pieces actually used by the final segmentation vs the
    candidate vocabulary). All ratios are exact-integer quotients, so
    the doubles hash-match the oracle."""
    _scores, seg = _train(spark, sf_dir)
    used = (
        seg.select(F.explode(F.split("path", UL_SEP)).alias("piece"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_used"))
    )
    docs = load_table(spark, sf_dir, "documents")
    vocab_size = (
        _candidate_scores(_word_counts(docs))
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_size"))
    )
    stats = seg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("freq").cast("bigint").alias("n_tokens"),
        F.sum(F.col("freq") * F.col("n_pieces"))
        .cast("bigint")
        .alias("total_pieces"),
        F.sum(F.col("freq") * F.length("word"))
        .cast("bigint")
        .alias("total_chars"),
    )
    return (
        stats.crossJoin(used)  # three 1-row frames: literal-carry
        .crossJoin(vocab_size)
        .select(
            "n_words",
            "n_tokens",
            "total_pieces",
            "total_chars",
            (
                F.col("total_pieces").cast("double") / F.col("n_tokens")
            ).alias("pieces_per_token"),
            (
                F.col("total_chars").cast("double") / F.col("total_pieces")
            ).alias("chars_per_piece"),
            "vocab_used",
            "vocab_size",
        )
    )
