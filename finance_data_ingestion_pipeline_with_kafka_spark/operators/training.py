"""Training-data pipeline operators over ``documents`` (north-star
extension surface next to U4/U6 — the curation passes an LLM data
pipeline runs between raw crawl and tokenizer: PII scrubbing, repetition
filtering, benchmark-contamination checks, token-budget sampling, and
domain mixture weighting).

The reference stops at ingestion (its analytics stubs:
``scripts/spark_streaming_processing/yfinance_processing.py:30-31``);
these are the batch passes its promised "analysis" layer would need at
corpus scale. Everything is built-in expression work — JVM-side, linear
in document bytes, no Python in the hot path; the only joins are
broadcast (probe sets, 1-row totals) or per-document aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .dedup import shingle_rows
from .text import tokens

#: Redaction patterns — written in the regex subset Java (Spark) and RE2
#: (DuckDB) interpret identically: no lookaround, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://\S+"
LONG_NUM_RE = r"\d{9,}"

TOKEN_BUDGET = 2000  # tokens per language for the budget sampler
CONTAM_N = 5  # n-gram width for the contamination probe
CONTAM_MOD = 97  # doc_id % CONTAM_MOD == 0 -> held-out probe set


@query(
    "pii_redaction",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{URL_RE}')) AS n_urls,
           len(regexp_extract_all(text, '{LONG_NUM_RE}')) AS n_long_numbers,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
             '{LONG_NUM_RE}', '<NUM>', 'g') AS clean_text
    FROM documents
    ORDER BY doc_id
    """,
    tags=("U6",),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact emails, URLs and long digit runs, and count
    each class (the audit columns a curation run reports). Pure per-row
    regexp work inside codegen — linear in bytes at any scale. Patterns
    are deliberately in the Java∩RE2 regex subset so the oracle computes
    the identical redaction."""
    d = load_table(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ),
        LONG_NUM_RE,
        "<NUM>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(URL_RE), F.lit(0))).alias("n_urls"),
        F.size(F.regexp_extract_all("text", F.lit(LONG_NUM_RE), F.lit(0))).alias(
            "n_long_numbers"
        ),
        clean.alias("clean_text"),
    ).orderBy("doc_id")


@query(
    "repetition_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS d,
             list_transform(list_zip(t[:len(t)-1], t[2:]),
                            s -> s[1] || ' ' || s[2]) AS bgs
      FROM toks WHERE len(t) >= 2
    ), bg AS (
      SELECT doc_id, unnest(bgs) AS b FROM base
    ), cnt AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b
    ), agg AS (
      SELECT doc_id, MAX(c) AS top, SUM(c) AS tot FROM cnt GROUP BY doc_id
    )
    SELECT base.doc_id,
           ROUND(1 - CAST(d AS DOUBLE) / n, 6) AS dup_word_frac,
           ROUND(CAST(top AS DOUBLE) / tot, 6) AS top_bigram_frac,
           ROUND(1 - CAST(d AS DOUBLE) / n, 6) <= 0.5
             AND ROUND(CAST(top AS DOUBLE) / tot, 6) <= 0.18 AS keep
    FROM base JOIN agg USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("U6",),
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: duplicate-word fraction and
    most-frequent-bigram fraction per document, with the keep decision
    (thresholds 0.5 / 0.18). One explode + two per-doc aggregations —
    the groupBys share the doc_id hash partitioning, and partial
    aggregation keeps the shuffle at one row per (doc, bigram)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens()
    base = d.filter(F.size(toks) >= 2).select(
        "doc_id",
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("d"),
    )
    bg = shingle_rows(d, n=2).withColumnRenamed("sh", "b")
    agg = (
        bg.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top"), F.sum("c").alias("tot"))
    )
    dup_frac = F.round(1 - F.col("d").cast("double") / F.col("n"), 6)
    top_frac = F.round(F.col("top").cast("double") / F.col("tot"), 6)
    return (
        base.join(agg, "doc_id")
        .select(
            "doc_id",
            dup_frac.alias("dup_word_frac"),
            top_frac.alias("top_bigram_frac"),
            ((dup_frac <= 0.5) & (top_frac <= 0.18)).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query(
    "contamination_check",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               list_zip(t[:len(t)-4], t[2:len(t)-3], t[3:len(t)-2],
                        t[4:len(t)-1], t[5:]),
               s -> s[1] || ' ' || s[2] || ' ' || s[3] || ' ' || s[4] || ' ' || s[5]
             ))) AS g
      FROM toks WHERE len(t) >= 5
    ), probe AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {CONTAM_MOD} = 0
    ), train AS (
      SELECT doc_id, g FROM grams WHERE doc_id % {CONTAM_MOD} <> 0
    )
    SELECT t.doc_id, COUNT(DISTINCT t.g) AS n_shared_grams
    FROM train t JOIN probe p ON t.g = p.g
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("U4", "U6"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: training documents sharing any
    {CONTAM_N}-gram with a held-out probe set (here: doc_id %
    {CONTAM_MOD} == 0 stands in for the benchmark corpus). The probe
    gram set is small by construction → broadcast to the training-side
    gram stream, so the corpus never shuffles; at 100 TB this is the
    standard decontamination pass shape (probe set ≪ corpus)."""
    d = load_table(spark, sf_dir, "documents")
    grams = shingle_rows(d, n=CONTAM_N).distinct()
    probe = (
        grams.filter(F.col("doc_id") % CONTAM_MOD == 0).select("sh").distinct()
    )
    train = grams.filter(F.col("doc_id") % CONTAM_MOD != 0)
    return (
        train.join(F.broadcast(probe), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


@query(
    "token_budget_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS ok
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY ok, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens
      FROM t
    )
    SELECT lang, doc_id, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    ORDER BY lang, cum_tokens
    """,
    tags=("U6",),
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget sampling per language: order documents
    by a content-independent hash (md5 of doc_id — reproducible across
    engines and rebuilds), take the running-token-sum prefix up to
    {TOKEN_BUDGET} tokens. The window cumsum is one shuffle on lang; at
    corpus scale the same query caps each language's contribution to a
    training mix without a global sort."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        F.size(tokens()).alias("n_tokens"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias("ok"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("ok", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("lang", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("lang", "cum_tokens")
    )


@query(
    "domain_mix_weights",
    oracle="""
    WITH lt AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(n_tokens) AS tot, COUNT(*) AS n_langs FROM lt
    )
    SELECT lang, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / tot, 6) AS token_share,
           ROUND((1.0 / n_langs) / (CAST(n_tokens AS DOUBLE) / tot), 6) AS mix_weight
    FROM lt CROSS JOIN tot
    ORDER BY lang
    """,
    tags=("U6", "A1"),
)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixture planning: per-language doc and token
    counts, token share, and the up/down-sampling weight that would
    equalize the mix (target = uniform across observed languages). Token
    sums are exact integer aggregation; the grand total rides along as a
    broadcast 1-row aggregate (in-plan, no driver action)."""
    d = load_table(spark, sf_dir, "documents")
    lt = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens())).alias("n_tokens"),
    )
    tot = lt.agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n_langs")
    )
    share = F.col("n_tokens").cast("double") / F.col("tot")
    return (
        lt.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round((1.0 / F.col("n_langs")) / share, 6).alias("mix_weight"),
        )
        .orderBy("lang")
    )


BOILERPLATE_N = 8  # chunk width (words) for the shared-run detector
BOILERPLATE_MIN_DOCS = 2  # a chunk in >= this many docs counts as shared


@query(
    "boilerplate_ngrams",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t)-{BOILERPLATE_N - 1}, 0)+1),
                    i -> {" || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(BOILERPLATE_N))})) AS g
      FROM toks WHERE len(t) >= {BOILERPLATE_N}
    ), shared AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (s.g IS NOT NULL) AS BIGINT) AS n_shared,
           ROUND(COUNT(*) FILTER (s.g IS NOT NULL)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS shared_frac
    FROM grams LEFT JOIN shared s USING (g)
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("U6", "U4"),
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (the C4/RefinedWeb-style
    shared-run filter): fraction of a document's distinct 8-word chunks
    that also appear in other documents. High ``shared_frac`` marks
    navigation chrome / license banners / templated text that inflates
    token counts without adding signal.

    Shape at scale: chunk rows are one narrow explode (work ∝ corpus
    tokens), the shared set is a (chunk)-keyed aggregation whose output
    is bounded by distinct chunks, and attribution back to documents is
    an equi-join on the chunk hash — every stage key-bounded, no pair
    space anywhere (contrast ``ngram_jaccard_pairs``, which verifies
    candidate PAIRS)."""
    d = load_table(spark, sf_dir, "documents")
    grams = (
        shingle_rows(d, n=BOILERPLATE_N)
        .select("doc_id", F.col("sh").alias("g"))
        .distinct()
    )
    shared = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILERPLATE_MIN_DOCS)
        .select("g")
    )
    flagged = grams.join(shared.withColumn("is_shared", F.lit(1)), "g", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count("is_shared").cast("bigint").alias("n_shared"),
            F.round(
                F.count("is_shared") / F.count(F.lit(1)).cast("double"), 6
            ).alias("shared_frac"),
        )
        .orderBy("doc_id")
    )


PSI_BINS = 10  # equal-width bins over the observed value range
VOCAB_K = 16  # vocabulary size for the coverage probe (fixture corpus ~31 words)


@query(
    "psi_value_drift",
    oracle=f"""
    WITH stats AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
    binned AS (
      SELECT CASE WHEN mx > mn THEN
               LEAST(CAST(FLOOR((value - mn) * {PSI_BINS}.0 / (mx - mn)) AS BIGINT),
                     {PSI_BINS - 1})
             ELSE CAST(0 AS BIGINT) END AS bin,
             user_id % 2 AS grp
      FROM events, stats
    ), counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT bin, n_a, n_b,
             CAST(SUM(n_a) OVER () AS DOUBLE) AS ta,
             CAST(SUM(n_b) OVER () AS DOUBLE) AS tb
      FROM counts
    )
    SELECT bin, n_a, n_b,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN
                   (CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
                   * ln((CAST(n_a AS DOUBLE) / ta) / (CAST(n_b AS DOUBLE) / tb))
                 ELSE NULL END, 6) AS psi_term
    FROM tot ORDER BY bin
    """,
    tags=("A7",),
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A7-adjacent] Population Stability Index between two event cohorts
    (user_id parity) over equal-width value bins — the standard
    distribution-drift monitor a data pipeline runs between ingest
    batches or dataset versions. Per-bin PSI terms
    ``(p_a - p_b)·ln(p_a/p_b)``; Σ terms = the PSI statistic (>0.2 is the
    classic "investigate" threshold). Empty-on-either-side bins yield
    NULL terms in both engines.

    Scale: one scalar min/max aggregation broadcast to the binning pass,
    one PSI_BINS-row aggregation — two linear passes, no wide shuffle.
    ln-drift between engines is ~1e-15 relative, far below the 6-digit
    rounding grain (the ``word_entropy`` precedent)."""
    e = load_table(spark, sf_dir, "events")
    stats = F.broadcast(e.agg(F.min("value").alias("mn"), F.max("value").alias("mx")))
    # degenerate-range guard: mx == mn makes the bin divisor 0 — Spark's
    # non-ANSI divide would NULL the bin while DuckDB's IEEE divide gives
    # NaN/inf; both engines pin everything to bin 0 instead
    bin_expr = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.floor((F.col("value") - F.col("mn")) * F.lit(float(PSI_BINS)) / (F.col("mx") - F.col("mn"))).cast("long"),
            F.lit(PSI_BINS - 1).cast("long"),
        ),
    ).otherwise(F.lit(0).cast("long"))
    binned = e.crossJoin(stats).select(
        bin_expr.alias("bin"),
        (F.col("user_id") % 2).alias("grp"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    w = Window.partitionBy()
    tot = counts.select(
        "bin",
        "n_a",
        "n_b",
        F.sum("n_a").over(w).cast("double").alias("ta"),
        F.sum("n_b").over(w).cast("double").alias("tb"),
    )
    ra = F.col("n_a").cast("double") / F.col("ta")
    rb = F.col("n_b").cast("double") / F.col("tb")
    term = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0), (ra - rb) * F.log(ra / rb)
    ).otherwise(F.lit(None))
    return tot.select("bin", "n_a", "n_b", F.round(term, 6).alias("psi_term")).orderBy("bin")


@query(
    "ks_drift",
    oracle="""
    WITH counts AS (
      SELECT event_type, value,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
      FROM events GROUP BY event_type, value
    ), cum AS (
      SELECT event_type, value,
             SUM(c_a) OVER (PARTITION BY event_type ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(c_b) OVER (PARTITION BY event_type ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cum_b,
             CAST(SUM(c_a) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
             CAST(SUM(c_b) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
      FROM counts
    ), gaps AS (
      SELECT event_type, value, n_a, n_b,
             ABS(CAST(cum_a AS DECIMAL(38,0)) * n_b
                 - CAST(cum_b AS DECIMAL(38,0)) * n_a) AS d_num
      FROM cum
    )
    SELECT event_type, n_a, n_b, value AS ks_at,
           ROUND(CAST(d_num AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS ks_d
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY d_num DESC, value) AS rn
      FROM gaps
    ) WHERE rn = 1
    ORDER BY event_type
    """,
    tags=("A7",),
)
def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A7-adjacent] Two-sample Kolmogorov–Smirnov statistic per
    event_type between the same user-parity cohorts ``psi_value_drift``
    monitors — the binning-free drift test that catches shape changes
    PSI's equal-width histogram smears out (PSI needs a bin count; KS is
    the sup-norm gap between the two empirical CDFs and has a
    distribution-free critical value). Curation pipelines run both: PSI
    for the per-bin attribution, KS for the sharp accept/reject.

    Exactness by construction: the CDF gap at each distinct value is the
    integer cross-product ``|cum_a·n_b − cum_b·n_a|`` — no per-row
    division — carried in DECIMAL(38,0) (cum ≤ n, so the product is
    bounded by n_a·n_b; the decimal lane holds both cohorts to ~1e19
    rows, far past any realistic per-type volume, where a bare int64
    lane would wrap at n_a·n_b > 9.2e18 — the ``pq_ann`` headroom
    lesson applied at design time). The argmax row is elected by
    (gap DESC, value ASC) ROW_NUMBER — a total order, so the reported
    location is deterministic under ties. The single division happens
    once per event_type on the elected row; n_a·n_b at any volume below
    2^53 makes it exact-operand, and past that the 6-digit rounding
    grain dominates the ULP.

    Scale: one (event_type, value) hash aggregation with map-side
    partials absorbs the tick volume; the window pass then sorts only
    DISTINCT values per type (domain-bounded, ≪ tick count). For a
    genuinely continuous value domain at extreme scale the same plan
    runs on quantile-bucketed values (the PSI binning) — the gap
    statistic degrades gracefully to a binned KS."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c_b"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        "value",
        F.sum("c_a").over(wcum).alias("cum_a"),
        F.sum("c_b").over(wcum).alias("cum_b"),
        F.sum("c_a").over(wtot).cast("bigint").alias("n_a"),
        F.sum("c_b").over(wtot).cast("bigint").alias("n_b"),
    )
    d_num = F.abs(
        F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
        - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
    )
    welect = Window.partitionBy("event_type").orderBy(F.desc("d_num"), "value")
    gaps = cum.withColumn("d_num", d_num).withColumn(
        "rn", F.row_number().over(welect)
    )
    return (
        gaps.filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.col("value").alias("ks_at"),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("ks_d"),
        )
        .orderBy("event_type")
    )


@query(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ), wc AS (
      SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), vocab AS (
      SELECT w FROM wc ORDER BY c DESC, w LIMIT {VOCAB_K}
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           ROUND(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    tags=("U6",),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Per-document out-of-vocabulary rate against a corpus top-K
    vocabulary — the tokenizer-fit probe a training pipeline runs before
    committing to a vocab (high OOV = wasted UNK mass).

    The vocabulary is a global top-K by (count DESC, token ASC) computed
    with ``orderBy().limit()`` — Spark plans that as
    TakeOrderedAndProject (per-partition top-K then a K-row merge), never
    a global sort; the K-row vocab then broadcasts to the per-token
    membership join. Deterministic tie-break by token."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens()).alias("w"))
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = wc.orderBy(F.desc("c"), "w").limit(VOCAB_K).select(F.col("w").alias("vw"))
    joined = toks.join(F.broadcast(vocab), toks["w"] == F.col("vw"), "left")
    n_oov = F.sum(F.when(F.col("vw").isNull(), 1).otherwise(0))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            n_oov.cast("bigint").alias("n_oov"),
            F.round(n_oov.cast("double") / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


@query(
    "bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), pairs AS (
      SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS b
      FROM toks, UNNEST(range(1, len(t))) AS r(i)
      WHERE len(t) >= 2
    ), c2 AS (
      SELECT b, COUNT(*) AS cb FROM pairs GROUP BY b
    ), c1 AS (
      SELECT w1, COUNT(*) AS cw FROM pairs GROUP BY w1
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(-CAST(SUM(CAST(ln(CAST(c2.cb AS DOUBLE) / c1.cw) AS DECIMAL(30,6)))
                       AS DOUBLE) / COUNT(*), 6) AS avg_nll
    FROM pairs p JOIN c2 ON p.b = c2.b JOIN c1 ON p.w1 = c1.w1
    GROUP BY p.doc_id ORDER BY p.doc_id
    """,
    tags=("U6",),
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Corpus-bigram language-model score per document — the
    KenLM-style perplexity proxy curation pipelines use as a fluency /
    formulaicity filter (CCNet's perplexity bucketing, shallow-model
    edition). Model: MLE P(w2|w1) = count(w1 w2) / count(w1 ·) from the
    corpus itself (every document bigram therefore has nonzero count — no
    smoothing needed); score = average negative log-likelihood per
    bigram. Low = predictable/templated text, high = unusual token
    sequences; both tails are curation candidates.

    Scale: bigram and head-count tables are key-bounded aggregations; the
    scoring joins shuffle on those same keys (no broadcast assumption —
    a 100 TB corpus's bigram table is itself large). Per-term
    DEC-rounding before the exact sum keeps distributed partial
    aggregation order-independent (the ``word_entropy`` precedent)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens()
    pairs = (
        d.filter(F.size(toks) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.struct(
                        a.alias("w1"), F.concat(a, F.lit(" "), b).alias("b")
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.b").alias("b"))
    )
    c2 = pairs.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    term = F.log(F.col("cb").cast("double") / F.col("cw")).cast("decimal(30,6)")
    return (
        pairs.join(c2, "b")
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                -F.sum(term).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


#: Iglewicz-Hoaglin robust outlier threshold on the modified z-score.
MAD_Z_CUTOFF = 3.5
MAD_CONSISTENCY = 0.6745  # Φ⁻¹(0.75): makes MAD estimate σ under normality


@query(
    "length_outliers",
    oracle=f"""
    WITH med AS (
      SELECT quantile_cont(n_chars, 0.5) AS med FROM documents
    ), mad AS (
      SELECT quantile_cont(ABS(n_chars - med), 0.5) AS mad FROM documents, med
    ), z AS (
      SELECT doc_id, n_chars, mad,
             {MAD_CONSISTENCY} * (n_chars - med) / mad AS zr
      FROM documents, med, mad
    )
    SELECT doc_id, n_chars,
           CASE WHEN mad = 0 THEN NULL
                ELSE floor(zr * 10000 + 0.5) / 10000 END AS robust_z,
           CASE WHEN mad = 0 THEN NULL
                ELSE ABS(zr) > {MAD_Z_CUTOFF} END AS is_outlier
    FROM z
    ORDER BY doc_id
    """,
    tags=("U6", "A7"),
)
def length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6/A7] Robust (median/MAD) document-length outlier flags — the
    curation filter that survives the very outliers it hunts (mean/std
    would be dragged by them). Modified z-score
    ``0.6745·(x − median)/MAD``; |z| > 3.5 is the Iglewicz-Hoaglin
    cutoff. Two scalar aggregations broadcast back to one linear pass —
    no shuffle of the corpus itself; degenerate MAD = 0 (majority-equal
    lengths) yields NULL flags rather than division blowups.

    Rounding note: z is a small-denominator rational here (integer
    lengths, half-integer median/MAD), so 4-digit ROUND ties are COMMON —
    and engine ROUND internals differ on representation ties (Spark
    rounds the shortest decimal repr half-up, DuckDB rounds the binary
    value). Both sides therefore round with pure IEEE arithmetic,
    ``floor(z·10⁴ + 0.5)/10⁴`` — identical doubles in, identical doubles
    out."""
    d = load_table(spark, sf_dir, "documents")
    med = F.broadcast(d.agg(F.expr("percentile(n_chars, 0.5)").alias("med")))
    mad = F.broadcast(
        d.crossJoin(med).agg(
            F.expr("percentile(abs(n_chars - med), 0.5)").alias("mad")
        )
    )
    z = F.lit(MAD_CONSISTENCY) * (F.col("n_chars") - F.col("med")) / F.col("mad")
    return (
        d.crossJoin(med)
        .crossJoin(mad)
        .select(
            "doc_id",
            "n_chars",
            F.when(
                F.col("mad") != 0, F.floor(z * 10000 + F.lit(0.5)) / 10000
            ).alias("robust_z"),
            F.when(F.col("mad") != 0, F.abs(z) > MAD_Z_CUTOFF).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


@query(
    "zscore_by_group",
    oracle="""
    WITH s AS (
      SELECT lang, COUNT(*) AS n,
             CAST(SUM(CAST(n_chars AS DECIMAL(30,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(n_chars * n_chars AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           CASE WHEN s.n > 1 AND (s.n * s.sxx - s.sx * s.sx) > 0
                THEN ROUND((d.n_chars - s.sx / s.n)
                     / sqrt((s.n * s.sxx - s.sx * s.sx) / (s.n * (s.n - 1))), 4)
                ELSE NULL END AS z
    FROM documents d JOIN s ON d.lang = s.lang
    ORDER BY d.doc_id
    """,
    tags=("U6", "A7"),
)
def zscore_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6/A7] Per-language z-score standardization of document length —
    the grouped feature-scaling pass (normalize within stratum, not
    across: a 200-char doc is short for English, long for a CJK
    corpus). Group moments via exact decimal sums (the ``correlation``
    formulation) so the distributed stats are bit-stable; the tiny
    per-group stats table broadcasts back onto the corpus scan."""
    d = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars")
    s = F.broadcast(
        d.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast("decimal(30,6)")).cast("double").alias("sx"),
            F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("sxx"),
        )
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    z = (x - sx / n) / F.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
    # degenerate-group guard (mirrors length_outliers' mad=0 CASE): a
    # singleton or all-equal group has zero variance — Spark's non-ANSI
    # divide yields NULL there but DuckDB's IEEE ops yield NaN/inf, an
    # oracle divergence waiting for a testdata regeneration. NULL in both.
    z_guarded = F.when((n > 1) & ((n * sxx - sx * sx) > 0), F.round(z, 4))
    return (
        d.join(s, "lang")
        .select("doc_id", "lang", "n_chars", z_guarded.alias("z"))
        .orderBy("doc_id")
    )


#: Target mixture weights for dataset interleaving. Dyadic (powers of
#: two) so the stride positions rank/weight are EXACT doubles — the
#: cross-engine compare needs no rounding tolerance.
INTERLEAVE_WEIGHTS = {"en": 4, "zh": 2, "es": 2, "de": 1, "fr": 1}
INTERLEAVE_N = 300


def _interleave_weight_sql() -> str:
    return " ".join(
        f"WHEN '{lang}' THEN {w}" for lang, w in sorted(INTERLEAVE_WEIGHTS.items())
    )


@query(
    "dataset_interleave",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS lang_rank,
             CASE lang {_interleave_weight_sql()} ELSE 1 END AS w
      FROM documents
    ), positioned AS (
      SELECT doc_id, lang, lang_rank,
             CAST(lang_rank AS DOUBLE) / w AS position
      FROM ranked
    )
    SELECT mix_idx, doc_id, lang, lang_rank, position FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY position, lang, doc_id) AS mix_idx
      FROM positioned
    ) WHERE mix_idx <= {INTERLEAVE_N}
    ORDER BY mix_idx
    """,
    tags=("O4",),
)
def dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture materialization — interleave per-language
    corpora at fixed ratios (stride scheduling: a language with weight w
    emits its rank-r document at position r/w, so the merged prefix
    holds languages in ~w proportion). This is the step that turns
    ``domain_mix_weights``' plan into an actual training order;
    hash-ranking within language makes the schedule rerun-stable with
    no RNG. Weights are dyadic so positions are exact doubles — the
    compare needs no tolerance.

    Scale: per-language rank is a partitioned window; the global merge
    is a top-N by (position) — orderBy+limit (TakeOrdered, the top-k
    plan), never a full global sort, and the final index numbers only
    the N-row prefix."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    wlang = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    weight = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(w))
            for lang, w in sorted(INTERLEAVE_WEIGHTS.items())
        ],
        F.lit(1),
    )
    positioned = d.select(
        "doc_id",
        "lang",
        F.row_number().over(wlang).alias("lang_rank"),
    ).withColumn("position", F.col("lang_rank").cast("double") / weight)
    top = positioned.orderBy("position", "lang", "doc_id").limit(INTERLEAVE_N)
    widx = Window.orderBy("position", "lang", "doc_id")
    return top.select(
        F.row_number().over(widx).alias("mix_idx"),
        "doc_id",
        "lang",
        "lang_rank",
        "position",
    ).orderBy("mix_idx")


#: Largest power-of-two padding bucket the length-bucketing ladder emits;
#: documents longer than this land in the terminal bucket. 2^14 = 16384
#: tokens covers any fixture document with an order of magnitude to spare.
MAX_BUCKET_POW = 14


def _pow2_ladder_sql(col: str) -> str:
    """CASE ladder mapping a token count to the smallest power of two
    ≥ it — integer compares only, shared text between both engines so no
    ``log2`` float is ever evaluated (an exact-power input sitting on the
    boundary would hinge on libm rounding)."""
    whens = " ".join(
        f"WHEN {col} <= {1 << k} THEN {1 << k}" for k in range(MAX_BUCKET_POW + 1)
    )
    return f"CASE {whens} ELSE {1 << (MAX_BUCKET_POW + 1)} END"


def _pow2_ladder(col: F.Column) -> F.Column:
    expr = F.lit(1 << (MAX_BUCKET_POW + 1))
    for k in reversed(range(MAX_BUCKET_POW + 1)):
        expr = F.when(col <= (1 << k), F.lit(1 << k)).otherwise(expr)
    return expr


@query(
    "length_bucketing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens,
             CAST({_pow2_ladder_sql("n_tokens")} AS BIGINT) AS padded_len
      FROM t
    )
    SELECT padded_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(padded_len) AS BIGINT) AS padded_tokens,
           CAST(SUM(padded_len - n_tokens) AS BIGINT) AS wasted_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / SUM(padded_len) AS packing_efficiency
    FROM b GROUP BY padded_len ORDER BY padded_len
    """,
    tags=("U6", "A1"),
)
def length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Training-batch length bucketing — the padding-waste audit a
    dataloader runs before choosing between bucketed batching and
    sequence packing: documents bucket to the smallest power-of-two
    sequence length that fits them, and each bucket reports how many
    tokens a pad-to-bucket batcher would carry versus waste
    (``packing_efficiency`` = real/padded — compare against
    ``sequence_packing``, which wastes nothing but splits documents).
    The bucket boundary is an integer CASE ladder shared textually with
    the oracle — never ``log2`` on a double, whose behavior at exact
    powers would hinge on libm rounding. One narrow projection + one
    groupBy on ≤ {MAX_BUCKET_POW + 2} keys: fully partial-aggregated,
    scan-bound at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens()).cast("long")
    b = d.select(
        n_tokens.alias("n_tokens"),
        _pow2_ladder(n_tokens).cast("long").alias("padded_len"),
    )
    return (
        b.groupBy("padded_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("padded_len").cast("bigint").alias("padded_tokens"),
            F.sum(F.col("padded_len") - F.col("n_tokens"))
            .cast("bigint")
            .alias("wasted_tokens"),
            (
                F.sum("n_tokens").cast("double") / F.sum("padded_len")
            ).alias("packing_efficiency"),
        )
        .orderBy("padded_len")
    )


PACK_TOKENS = 256  # training-sequence token budget
PACK_SHARDS = 8  # parallel packing streams


@query(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ), placed AS (
      SELECT shard, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS start_offset
      FROM toks
    )
    SELECT shard, doc_id, n_tokens, start_offset,
           CAST(start_offset // {PACK_TOKENS} AS BIGINT) AS pack_id,
           CAST((start_offset + n_tokens - 1) // {PACK_TOKENS}
                - start_offset // {PACK_TOKENS} + 1 AS BIGINT) AS spans_packs
    FROM placed
    ORDER BY shard, doc_id
    """,
    tags=("U6",),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Sequence packing — assign every document a position in a
    fixed-``PACK_TOKENS`` training-sequence stream (the concat-then-split
    packing LLM dataloaders run: documents are laid end-to-end in a
    deterministic order and the stream is cut at budget boundaries, so
    ``pack_id`` is the training sequence a document starts in and
    ``spans_packs`` how many boundaries it straddles). Sharding by
    ``doc_id % PACK_SHARDS`` gives independent packing streams — ONE
    shuffle on the shard key, then a running-sum window per shard; at
    100 TB the shard count scales with the cluster and each stream packs
    in isolation (no global sequential dependency)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens()).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = t.withColumn(
        "start_offset", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    )
    return placed.select(
        "shard",
        "doc_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {PACK_TOKENS}").alias("pack_id"),
        F.expr(
            f"(start_offset + n_tokens - 1) div {PACK_TOKENS} "
            f"- start_offset div {PACK_TOKENS} + 1"
        ).alias("spans_packs"),
    ).orderBy("shard", "doc_id")


def _corpus_funnel_oracle() -> str:
    from .dedup import _minhash_cte
    from .text import QUALITY_SQL

    return f"""
    WITH {_minhash_cte()},
    tokc AS (
      SELECT doc_id, text,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents
    ), q AS (
      SELECT doc_id, text, n_tok FROM tokc WHERE {QUALITY_SQL} >= 0.5
    ), ex AS (
      SELECT doc_id, n_tok FROM (
        SELECT doc_id, n_tok,
               ROW_NUMBER() OVER (
                 PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                 ORDER BY doc_id) AS rn
        FROM q
      ) WHERE rn = 1
    ), nd AS (
      SELECT doc_id, n_tok FROM ex
      WHERE doc_id NOT IN (SELECT doc_b FROM near_dup)
    )
    SELECT 'a_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM tokc
    UNION ALL
    SELECT 'b_quality', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT) FROM q
    UNION ALL
    SELECT 'c_exact_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT) FROM ex
    UNION ALL
    SELECT 'd_near_dup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT) FROM nd
    ORDER BY stage
    """


@query(
    "corpus_build_funnel",
    oracle=_corpus_funnel_oracle(),
    tags=("U4", "U6"),
    prepared=False,  # composes minhash_near_dup, whose construction
    # materializes the verified pair set (localCheckpoint)
)
def corpus_build_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U4/U6] The end-to-end training-corpus build as ONE auditable
    funnel — the pipeline a dataset release actually runs, with
    per-stage doc/token attrition: raw → quality filter (shared
    ``quality_expr``, threshold 0.5) → exact dedup (canonical-fingerprint
    keeper = min doc_id) → near-dup drop (any doc that is the higher-id
    member of a verified MinHash pair is removed — the same verified
    pair relation the ``minhash_near_dup`` query emits). Every stage
    reuses the EXACT operator the catalog verifies individually, so the
    funnel is a composition proof, not a reimplementation; counts and
    token sums are integers, hash-exact by construction. Scale: each
    stage is one shuffle-bounded transformation on the surviving set —
    the attrition report costs four aggregates over a shared lineage."""
    from .dedup import minhash_near_dup
    from .text import quality_expr, tokens

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens()).cast("long")
    tokc = docs.select("doc_id", "text", n_tok.alias("n_tok"))
    q = tokc.filter(F.round(quality_expr(), 6) >= 0.5)
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    ex = (
        q.withColumn("fingerprint", fp)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_tok")
    )
    dropped = minhash_near_dup(spark, sf_dir).select("doc_b").distinct()
    nd = ex.join(dropped, ex["doc_id"] == dropped["doc_b"], "left_anti")

    def stage(name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    return (
        stage("a_raw", tokc)
        .unionByName(stage("b_quality", q))
        .unionByName(stage("c_exact_dedup", ex))
        .unionByName(stage("d_near_dup", nd))
        .orderBy("stage")
    )


K_ANON = 5  # k-anonymity threshold for the quasi-identifier audit


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH b AS (
      SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi FROM customer
    ), q AS (
      SELECT c_nationkey AS nat,
             CASE WHEN hi = lo THEN 0
                  ELSE CAST(least(9, greatest(0,
                       floor((c_acctbal - lo) * 10 / (hi - lo)))) AS BIGINT)
             END AS bal_decile
      FROM customer, b
    ), g AS (
      SELECT nat, bal_decile, CAST(COUNT(*) AS BIGINT) AS sz
      FROM q GROUP BY nat, bal_decile
    )
    SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(sz) AS BIGINT) AS min_group_size,
           CAST(COALESCE(SUM(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END), 0)
                AS BIGINT) AS n_violating_rows,
           CAST(COALESCE(SUM(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END), 0)
                AS DOUBLE) / SUM(sz) AS violating_share
    FROM g
    """,
    tags=("U6", "A1"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[governance] k-anonymity audit over quasi-identifiers — the
    release-gating check that complements ``pii_redaction``: redaction
    strips DIRECT identifiers, but a record is still re-identifiable
    when its quasi-identifier combination (here nationality × account-
    balance decile) is shared by fewer than k individuals. The audit
    quantizes the continuous QI by value range (the ``zorder_skipping``
    quantizer expression — identical doubles in both engines), groups on
    the QI tuple, and reports the minimum group size plus how many rows
    sit in sub-k groups — the exact population a k-anonymizer would have
    to generalize or suppress before the dataset ships to training.

    Scale: one pass for the bounds (broadcast scalar), one QI-keyed
    aggregation with map-side partials, one tiny summary over the group
    table — at 100 TB the cost is the single groupBy, and the group
    table (|nations| × 10 rows here) stays KB-sized however large the
    input."""
    c = load_table(spark, sf_dir, "customer")
    b = c.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    q = c.crossJoin(F.broadcast(b)).select(
        F.col("c_nationkey").alias("nat"),
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(9),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("c_acctbal") - F.col("lo"))
                        * 10
                        / (F.col("hi") - F.col("lo"))
                    ),
                ),
            ).cast("bigint")
        )
        .alias("bal_decile"),
    )
    g = q.groupBy("nat", "bal_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    small = F.coalesce(
        F.sum(F.when(F.col("sz") < K_ANON, F.col("sz")).otherwise(F.lit(0))),
        F.lit(0),
    )
    return g.agg(
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("sz").cast("bigint").alias("min_group_size"),
        small.cast("bigint").alias("n_violating_rows"),
        (small.cast("double") / F.sum("sz")).alias("violating_share"),
    )


@query(
    "pit_feature_matrix",
    oracle="""
    WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)
               AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS n_purchases
      FROM events_us GROUP BY user_id, day, day_idx
    ), feat AS (
      SELECT user_id, day, day_idx, n_events, n_purchases,
             CAST(COALESCE(SUM(n_events) OVER win, 0) AS BIGINT)
               AS f_events_prev7,
             CAST(COALESCE(SUM(n_purchases) OVER win, 0) AS BIGINT)
               AS f_purchases_prev7
      FROM daily
      WINDOW win AS (PARTITION BY user_id ORDER BY day_idx
                     RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT f.user_id, CAST(f.day AS TIMESTAMP) AS day,
           f.f_events_prev7, f.f_purchases_prev7,
           CAST(COALESCE(nxt.n_purchases, 0) AS BIGINT)
             AS label_next_day_purchases
    FROM feat f
    LEFT JOIN daily nxt ON nxt.user_id = f.user_id
                       AND nxt.day_idx = f.day_idx + 1
    ORDER BY f.user_id, f.day
    """,
    tags=("U6", "W3"),
)
def pit_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6/W3] Point-in-time-correct feature/label matrix — the
    training-set construction step where most real-world ML pipelines
    silently leak: for every observed (user, day), trailing-week
    features computed over days [d−7, d−1] ONLY (a RANGE frame ending
    at 1 PRECEDING — the current day can never feed its own features),
    and the label taken from day d+1 by an exact calendar join (LEAD
    would silently grab the next OBSERVED day across gaps — a subtle
    leakage-adjacent bug this formulation cannot have; absent next days
    are honest zero labels).

    All quantities are exact integer counts; the RANGE frame is over an
    integer day index so frame membership is unambiguous in both
    engines.

    At 100 TB: one shuffle to (user, day) grain, then the feature
    window and the label self-join both run user-partitioned — on a
    user-bucketed lake the whole matrix build is zero-Exchange, which
    is why the feature-store pattern IS this query run incrementally."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.to_date("ts").alias("day"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("day_idx"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint")
        .alias("n_purchases"),
    )
    return (
        pit_features_from_daily(daily)
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            "f_events_prev7",
            "f_purchases_prev7",
            "label_next_day_purchases",
        )
        .orderBy("user_id", "day")
    )


def pit_features_from_daily(daily: DataFrame) -> DataFrame:
    """Point-in-time kernel over a (user_id, day, day_idx, n_events,
    n_purchases) daily-grain frame: trailing-week features from a RANGE
    frame over days [d−7, d−1] (the current day can never feed its own
    features) and the label from day d+1 by exact calendar index join
    (absent next days are zero labels). Shared by the catalog query and
    the Hypothesis no-leakage property (brute-force window recount on
    arbitrary generated day grids)."""
    win = Window.partitionBy("user_id").orderBy("day_idx").rangeBetween(-7, -1)
    feat = daily.select(
        "user_id",
        "day",
        "day_idx",
        F.coalesce(F.sum("n_events").over(win), F.lit(0))
        .cast("bigint")
        .alias("f_events_prev7"),
        F.coalesce(F.sum("n_purchases").over(win), F.lit(0))
        .cast("bigint")
        .alias("f_purchases_prev7"),
    )
    nxt = daily.select(
        F.col("user_id").alias("n_user"),
        (F.col("day_idx") - 1).alias("n_idx"),
        F.col("n_purchases").alias("next_p"),
    )
    return feat.join(
        nxt,
        (feat["user_id"] == nxt["n_user"]) & (feat["day_idx"] == nxt["n_idx"]),
        "left",
    ).select(
        "user_id",
        "day",
        "day_idx",
        "f_events_prev7",
        "f_purchases_prev7",
        F.coalesce(F.col("next_p"), F.lit(0))
        .cast("bigint")
        .alias("label_next_day_purchases"),
    )


@query(
    "ab_test_readout",
    oracle="""
    WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    assign AS (
      SELECT DISTINCT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant
      FROM events_us
    ), conv AS (
      SELECT DISTINCT user_id FROM events_us WHERE event_type = 'purchase'
    ), wide AS (
      SELECT
        CAST(COUNT(*) FILTER (WHERE a.variant = 'A') AS BIGINT) AS n_a,
        CAST(COUNT(c.user_id) FILTER (WHERE a.variant = 'A') AS BIGINT)
          AS conv_a,
        CAST(COUNT(*) FILTER (WHERE a.variant = 'B') AS BIGINT) AS n_b,
        CAST(COUNT(c.user_id) FILTER (WHERE a.variant = 'B') AS BIGINT)
          AS conv_b
      FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CASE WHEN n_a > 0 THEN CAST(conv_a AS DOUBLE) / n_a END AS rate_a,
           CASE WHEN n_b > 0 THEN CAST(conv_b AS DOUBLE) / n_b END AS rate_b,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a
           END AS abs_lift,
           CASE WHEN n_a = 0 OR n_b = 0
                  OR conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                THEN NULL
                ELSE (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
                  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                         * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                         * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
                END AS z_score
    FROM wide
    """,
    tags=("U6", "A1"),
)
def ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6/A1] A/B experiment readout — conversion-rate lift with a
    two-proportion z statistic, over a DETERMINISTIC 50/50 hash
    assignment (first md5 hex digit of user_id — the same
    content-hash-bucket mechanism as ``dataset_split``, so assignment
    is stable across engines, re-runs and incremental rebuilds; no
    stored assignment table needed). Conversion = any purchase event.

    Every input to the z-score is an exact integer (user and converter
    counts); pooled rate, lift and z are one fixed double expression —
    engine-identical with no rounding. The single-row output is the
    decision artifact: sign of lift, magnitude, and whether |z| clears
    the 1.96 bar is the reader's one-line takeaway.

    At 100 TB: two distinct-aggregates on user_id (co-located on a
    user-bucketed lake) and a 2-row aggregate — experiment readouts are
    scan-bound, never shuffle-bound."""
    e = load_table(spark, sf_dir, "events")
    assign = e.select("user_id").distinct().select(
        "user_id",
        F.when(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A")
        .otherwise("B")
        .alias("variant"),
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    wide = assign.join(conv, "user_id", "left").agg(
        F.count(F.when(F.col("variant") == "A", 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("variant") == "A", F.col("converted")))
        .cast("bigint")
        .alias("conv_a"),
        F.count(F.when(F.col("variant") == "B", 1)).cast("bigint").alias("n_b"),
        F.count(F.when(F.col("variant") == "B", F.col("converted")))
        .cast("bigint")
        .alias("conv_b"),
    )
    # every rate/lift/z is NULL-guarded on EXACT INTEGER conditions: an
    # empty arm (possible on a regenerated fixture draw — the old
    # filter-into-two-frames shape would then emit ZERO rows while the
    # oracle emits one) and the degenerate 0%/100% pooled conversion
    # both degrade to NULL instead of an ANSI DIVIDE_BY_ZERO; the single
    # conditional aggregate always returns exactly one row
    rate_a = F.when(
        F.col("n_a") > 0, F.col("conv_a").cast("double") / F.col("n_a")
    )
    rate_b = F.when(
        F.col("n_b") > 0, F.col("conv_b").cast("double") / F.col("n_b")
    )
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    degenerate = (
        (F.col("n_a") == 0)
        | (F.col("n_b") == 0)
        | ((F.col("conv_a") + F.col("conv_b")) == 0)
        | ((F.col("conv_a") + F.col("conv_b")) == (F.col("n_a") + F.col("n_b")))
    )
    z = F.when(
        ~degenerate,
        (
            F.col("conv_b").cast("double") / F.col("n_b")
            - F.col("conv_a").cast("double") / F.col("n_a")
        )
        / F.sqrt(
            pooled
            * (1 - pooled)
            * (
                F.lit(1).cast("double") / F.col("n_a")
                + F.lit(1).cast("double") / F.col("n_b")
            )
        ),
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.col("conv_b").cast("double") / F.col("n_b")
            - F.col("conv_a").cast("double") / F.col("n_a"),
        ).alias("abs_lift"),
        z.alias("z_score"),
    )


DSIR_BUCKETS = 64
#: "wiki-like" target domain for the importance-weight estimate: four of
#: the twenty synthetic sources (20% of the corpus), so both the target
#: and raw unigram models are estimated from the fixtures themselves.
DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")


#: Shared oracle CTE chain for the DSIR family: token → md5 bucket →
#: target/raw unigram models → per-(doc, bucket) log-ratio terms.
_DSIR_CTES = f"""
    toks AS (
      SELECT doc_id, source, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ), tb AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) % {DSIR_BUCKETS} AS b
      FROM toks
    ), raw_counts AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS r_b FROM tb GROUP BY b
    ), tgt_counts AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS t_b FROM tb
      WHERE source IN {DSIR_TARGET_SOURCES!r} GROUP BY b
    ), totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS r_tot,
             CAST(SUM(CASE WHEN source IN {DSIR_TARGET_SOURCES!r}
                           THEN 1 ELSE 0 END) AS BIGINT) AS t_tot
      FROM tb
    ), bstats AS (
      SELECT rc.b, rc.r_b, COALESCE(tc.t_b, 0) AS t_b
      FROM raw_counts rc LEFT JOIN tgt_counts tc USING (b)
    ), dbc AS (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS k FROM tb GROUP BY doc_id, b
    ), terms AS (
      SELECT d.doc_id, d.k,
             CAST(d.k * ln(CAST((s.t_b + 1) * (t.r_tot + {DSIR_BUCKETS}) AS DOUBLE)
                           / CAST((s.r_b + 1) * (t.t_tot + {DSIR_BUCKETS}) AS DOUBLE))
                  AS DECIMAL(30,6)) AS term
      FROM dbc d JOIN bstats s USING (b) CROSS JOIN totals t
    )"""


@query(
    "dsir_importance_selection",
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_tokens,
           CAST(SUM(term) AS DOUBLE) / SUM(k) AS avg_logratio,
           CAST(CASE WHEN SUM(term) > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM terms GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("U6",),
)
def dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): every document gets
    an importance log-ratio under hashed-unigram bag-of-words models of
    a TARGET domain versus the RAW corpus — the published recipe for
    choosing pretraining data that "looks like" a trusted domain without
    training a classifier. Features are md5-hashed token buckets
    (``DSIR_BUCKETS`` = 64, the engine-portable 15-hex-char hash the
    SimHash family established), models are add-one-smoothed bucket
    unigrams, and a document is ``selected`` when its total log-ratio is
    positive (importance weight > 1 — target-typical).

    Numeric contract (the ``unigram_logprob`` pattern): each per-bucket
    term is ``k · ln(exact-integer ratio)`` — the ratio's numerator and
    denominator are exact BIGINT products, the single ``ln`` drifts
    ~1e-12 across libms, and the term is rounded into DECIMAL(30,6)
    before the order-free exact sum; the ``selected`` flag compares the
    EXACT decimal sum to zero, and ``avg_logratio`` is the UNROUNDED
    quotient of that exact sum by the exact token count — bit-identical
    inputs through the identical IEEE divide, with no final ROUND to
    hit the cross-engine .5e-6 boundary (which a sf0.1 draw did hit).

    Scale: one token explode, two 64-row bucket aggregations (map-side
    partials absorb token skew) broadcast back, a per-(doc, bucket)
    regroup, and one 1-row totals carry — no Python, no pairwise joins;
    at 100 TB this is two passes over the token stream, the same cost
    envelope as TF-IDF."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.explode(tokens()).alias("w"))
    tb = toks.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).alias("b"),
    )
    is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
    raw_counts = tb.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("r_b"))
    tgt_counts = (
        tb.filter(is_target)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t_b"))
    )
    totals = tb.agg(
        F.count(F.lit(1)).cast("bigint").alias("r_tot"),
        F.sum(F.when(is_target, 1).otherwise(0)).cast("bigint").alias("t_tot"),
    )
    bstats = (
        raw_counts.join(tgt_counts, "b", "left")
        .select("b", "r_b", F.coalesce("t_b", F.lit(0)).alias("t_b"))
        .crossJoin(F.broadcast(totals))
    )
    dbc = tb.groupBy("doc_id", "b").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    term = (
        F.col("k")
        * F.log(
            ((F.col("t_b") + 1) * (F.col("r_tot") + DSIR_BUCKETS)).cast("double")
            / ((F.col("r_b") + 1) * (F.col("t_tot") + DSIR_BUCKETS)).cast("double")
        )
    ).cast("decimal(30,6)")
    return (
        dbc.join(F.broadcast(bstats), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            (F.sum(term).cast("double") / F.sum("k")).alias("avg_logratio"),
            F.when(F.sum(term) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("selected"),
        )
        .orderBy("doc_id")
    )


@query(
    "dsir_selection_eval",
    oracle=f"""
    WITH {_DSIR_CTES}, sel AS (
      SELECT doc_id,
             CAST(CASE WHEN SUM(term) > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
      FROM terms GROUP BY doc_id
    ), truth AS (
      SELECT doc_id,
             CAST(CASE WHEN source IN {DSIR_TARGET_SOURCES!r}
                       THEN 1 ELSE 0 END AS BIGINT) AS is_target
      FROM documents
    ), conf AS (
      SELECT CAST(SUM(selected * is_target) AS BIGINT) AS tp,
             CAST(SUM(selected * (1 - is_target)) AS BIGINT) AS fp,
             CAST(SUM((1 - selected) * is_target) AS BIGINT) AS fn,
             CAST(SUM((1 - selected) * (1 - is_target)) AS BIGINT) AS tn
      FROM sel JOIN truth USING (doc_id)
    )
    SELECT tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision_sel,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall_sel,
           CAST(tp + fp AS BIGINT) AS n_selected
    FROM conf
    """,
    tags=("U6", "A1"),
)
def dsir_selection_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6/A1] Acceptance metric for ``dsir_importance_selection`` (the
    r7 acceptance-metric layer extended to the new selector): since the
    fixtures carry true source labels, the hashed-unigram importance
    selector can be scored as a domain classifier — confusion counts
    plus precision/recall of ``selected`` against actual target-source
    membership. This is the number a data-curation operator reads
    before trusting DSIR weights to compose a pretraining mix: a recall
    near the positive base rate means the bag-of-hashed-words models
    carry no domain signal at this corpus (the honest expected outcome
    on the synthetic uniform-source fixtures); on real multi-domain
    corpora the same query is the selector's dashboard. Composes the
    verified selector query verbatim (one extra doc-keyed join + a
    one-row conditional aggregate — exact integer counts, ratio guards
    on exact ints per the ANSI DIVIDE_BY_ZERO rule)."""
    sel = dsir_importance_selection(spark, sf_dir).select("doc_id", "selected")
    d = load_table(spark, sf_dir, "documents")
    truth = d.select(
        "doc_id",
        F.when(F.col("source").isin(*DSIR_TARGET_SOURCES), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_target"),
    )
    conf = (
        sel.join(truth, "doc_id")
        .agg(
            F.sum(F.col("selected") * F.col("is_target")).cast("bigint").alias("tp"),
            F.sum(F.col("selected") * (1 - F.col("is_target")))
            .cast("bigint")
            .alias("fp"),
            F.sum((1 - F.col("selected")) * F.col("is_target"))
            .cast("bigint")
            .alias("fn"),
            F.sum((1 - F.col("selected")) * (1 - F.col("is_target")))
            .cast("bigint")
            .alias("tn"),
        )
    )
    return conf.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
        ).alias("precision_sel"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
        ).alias("recall_sel"),
        (F.col("tp") + F.col("fp")).cast("bigint").alias("n_selected"),
    )
