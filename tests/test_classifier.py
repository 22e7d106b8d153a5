"""Trainable quality classifier: the fixed-point hard-sigmoid
logistic trainer must actually LEARN (beat the majority class by a
real margin on its weak label) and keep its scale-shape promises —
training rounds are map-only passes reduced to a model-sized
gradient (no joins, no data-sized collect)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.text import ws_tokens
from exceldatatransform_py_spark.operators.classifier import (
    _tdiv,
    dense_hashed_features,
    logreg_train_score,
)
from exceldatatransform_py_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def _scored(spark):
    from exceldatatransform_py_spark.plans.queries_llm import _qc_scored

    return _qc_scored(spark, SF)


def test_classifier_beats_majority_class(spark):
    """Deterministic (exact arithmetic, fixed data): train accuracy
    must beat always-predict-majority by ≥ 0.1 — the evidence the
    gradient loop learns rather than saturates or oscillates."""
    rows = _scored(spark).select("label", "predicted").collect()
    n = len(rows)
    pos = sum(r.label for r in rows)
    majority = max(pos, n - pos) / n
    acc = sum((r.label == 1) == bool(r.predicted) for r in rows) / n
    assert n > 0
    assert acc >= majority + 0.1, (acc, majority)


def test_classifier_probability_bounds_and_gate(spark):
    from exceldatatransform_py_spark.plans.queries_llm import _QC_SCALE

    rows = _scored(spark).collect()
    for r in rows:
        assert 0 <= r.prob_fixed <= _QC_SCALE
        assert r.predicted == (2 * r.prob_fixed >= _QC_SCALE)


def test_truncating_division_matches_sql_div():
    """Python // floors toward −∞; the trainer's driver-side update
    must truncate toward zero like Spark DIV / DuckDB //."""
    assert _tdiv(7, 2) == 3 and _tdiv(-7, 2) == -3
    assert _tdiv(1, 3) == 0 and _tdiv(-1, 3) == 0


def test_scoring_is_map_only_no_join_no_python(spark):
    """Final scoring with trained weights: weights enter as literals,
    so the scoring plan has NO join and NO Python eval — a pure
    projection over the staged feature frame."""
    docs = read_table(spark, SF, "documents")
    base = docs.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 2).cast("long").alias("y"),
        ws_tokens(F.lower(F.col("text"))).alias("__toks"),
    )
    vecs = dense_hashed_features(base, F.col("__toks"), n_buckets=8)
    out = logreg_train_score(vecs, iters=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_dense_features_shape_and_bias(spark):
    docs = read_table(spark, SF, "documents")
    base = docs.select(
        F.col("doc_id").alias("id"),
        F.lit(1).cast("long").alias("y"),
        ws_tokens(F.lower(F.col("text"))).alias("__toks"),
    )
    vecs = dense_hashed_features(base, F.col("__toks"), n_buckets=8)
    n_docs = docs.count()
    assert vecs.count() == n_docs
    stats = vecs.select(
        F.size("xs").alias("d"),
        F.element_at("xs", 9).alias("bias"),
        F.aggregate(
            "xs", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tot"),
        F.size(F.filter("xs", lambda x: x < 0)).alias("neg"),
    ).collect()
    for r in stats:
        assert r.d == 9 and r.bias == 1 and r.neg == 0
        assert r.tot >= 1  # bias + token counts

    # a zero-token document still gets its bias vector
    empty = spark.createDataFrame(
        [(99, 1, [])], "id long, y long, __toks array<string>"
    )
    ev = dense_hashed_features(
        empty, F.col("__toks"), n_buckets=8
    ).collect()
    assert len(ev) == 1 and ev[0].xs == [0] * 8 + [1]
