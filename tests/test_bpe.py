"""BPE trainer: greedy merge semantics, early stop, and the
train/apply round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from exceldatatransform_py_spark.operators.bpe import (
    _merge_fold,
    bpe_apply,
    bpe_train,
    bpe_word_table,
)


def _sym_df(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "w string")
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, F.lit(1)),
    )
    return df.select("w", chars.alias("s"))


def test_merge_fold_is_greedy_left_to_right(spark):
    d = _sym_df(spark, ["aaaa", "aaa", "aa", "a", "bab"])
    got = {
        r.w: r.m
        for r in d.select(
            "w", _merge_fold(F.col("s"), "a", "a").alias("m")
        ).collect()
    }
    assert got["aaaa"] == ["aa", "aa"]  # non-overlapping, left first
    assert got["aaa"] == ["aa", "a"]
    assert got["aa"] == ["aa"]
    assert got["a"] == ["a"]
    assert got["bab"] == ["b", "a", "b"]  # no adjacent (a, a)


def test_merge_fold_multichar_symbols(spark):
    # after a prior merge the symbols are multi-char; the fold's
    # last-symbol test must match whole symbols, not suffixes
    df = spark.createDataFrame(
        [(["xa", "a", "b"],), (["a", "ab"],)], "s array<string>"
    )
    got = [r.m for r in df.select(
        _merge_fold(F.col("s"), "a", "b").alias("m")).collect()]
    # 'xa' ends with 'a' but IS NOT the symbol 'a' — no merge there
    assert got[0] == ["xa", "ab"]
    assert got[1] == ["a", "ab"]  # pair is (a, b); ('a','ab') no match


def test_bpe_train_merge_sequence_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "ab ab ab cd") for i in range(3)], "doc_id long, text string"
    )
    out = bpe_train(bpe_word_table(docs), n_merges=3).collect()
    # 'ab' occurs 9 times (a,b); cd once → merges: (a b) then nothing
    # adjacent repeats except c d
    assert [(r["round"], r["pair"], r["n_occurrences"]) for r in out] == [
        (1, "a b", 9),
        (2, "c d", 3),
    ]  # early stop: nothing left to merge after round 2


def test_bpe_apply_reproduces_training_segmentation(spark):
    docs = spark.createDataFrame(
        [(1, "table table data"), (2, "data table")],
        "doc_id long, text string",
    )
    words = bpe_word_table(docs)
    merges = bpe_train(words, n_merges=4).collect()
    seq = [tuple(r["pair"].split(" ")) for r in merges]
    # applying the merge sequence to raw chars must land on the same
    # final symbols training reached
    applied = words.select(
        "w", bpe_apply(F.col("s"), seq).alias("enc")
    ).collect()
    enc = {r.w: r.enc for r in applied}
    for w, e in enc.items():
        assert "".join(e) == w  # lossless segmentation
    # four merges over 'table'/'data' compress at least one word to
    # fewer symbols than characters
    assert any(len(e) < len(w) for w, e in enc.items())
