"""Unigram-LM tokenizer: hand-traced Viterbi segmentations, tie-break
order, EM behavior on a crafted corpus. Oracle parity of the two
catalog queries is covered by the full-catalog sweep in
``test_oracle_queries``.
"""

import pandas as pd

from finance_data_ingestion_pipeline_with_kafka_spark.operators.unigram import (
    UL_SEP,
    viterbi_segment,
)


def seg(word, scores):
    k, path = viterbi_segment(word, scores)
    return k, path.split(UL_SEP)


def test_hand_traced_fewest_pieces_wins():
    # "abcd": one 4-char piece beats any split regardless of scores
    scores = {"abcd": 1, "ab": 999, "cd": 999, "a": 9, "b": 9, "c": 9, "d": 9}
    assert seg("abcd", scores) == (1, ["abcd"])


def test_hand_traced_product_breaks_k_tie():
    # two 2-piece splits of "abcd": ab|cd (10*10=100) vs abc|d (30*3=90)
    scores = {"ab": 10, "cd": 10, "abc": 30, "d": 3, "a": 1, "b": 1, "c": 1}
    assert seg("abcd", scores) == (2, ["ab", "cd"])
    # flip the weights → the other split wins
    scores2 = {"ab": 10, "cd": 10, "abc": 30, "d": 4, "a": 1, "b": 1, "c": 1}
    assert seg("abcd", scores2) == (2, ["abc", "d"])


def test_hand_traced_lexico_breaks_product_tie():
    # ab|cd and abc|d both product 100 → lexicographically smaller
    # piece sequence wins: "ab\x1fcd" < "abc\x1fd"
    scores = {"ab": 10, "cd": 10, "abc": 20, "d": 5, "a": 1, "b": 1, "c": 1}
    assert seg("abcd", scores) == (2, ["ab", "cd"])


def test_zero_score_pieces_unusable():
    scores = {"abcd": 0, "ab": 0, "a": 1, "b": 1, "c": 1, "d": 1, "cd": 5}
    assert seg("abcd", scores) == (3, ["a", "b", "cd"])


def test_single_char_fallback_covers_everything():
    scores = {ch: 1 for ch in "xyz"}
    assert seg("zyxzyx", scores) == (6, list("zyxzyx"))


def test_em_converges_on_crafted_corpus(spark):
    """On a corpus where 'drumroll' dominates, EM keeps it whole while
    rarer words segment through high-frequency pieces."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.unigram import (
        _candidate_scores,
        _recount_scores,
        _segment_words,
        _word_counts,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    "drumroll drumroll drumroll drum",
                    "drumroll roll drum drumroll",
                    "drumroll drumroll",
                    "roll roll drumroll",
                ],
            }
        )
    )
    words = _word_counts(docs)
    vocab = _candidate_scores(words)
    score_df = vocab
    seg_df = None
    for _ in range(2):
        model = {r["piece"]: r["score"] for r in score_df.collect()}
        seg_df = _segment_words(words, model)
        score_df = _recount_scores(seg_df, vocab)
    got = {r["word"]: (r["n_pieces"], r["path"]) for r in seg_df.collect()}
    # 8-char 'drumroll' exceeds piece max (4) → must split; its halves
    # are the corpus's most frequent 4-grams so it segments drum|roll
    assert got["drumroll"] == (2, "drum" + UL_SEP + "roll")
    assert got["drum"] == (1, "drum")
    assert got["roll"] == (1, "roll")


def test_word_cap_excludes_long_words(spark):
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.unigram import (
        _word_counts,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0],
                "text": ["short averylongwordbeyondcap ok"],
            }
        )
    )
    words = {r["word"] for r in _word_counts(docs).collect()}
    assert words == {"short", "ok"}
