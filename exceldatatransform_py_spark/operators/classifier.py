"""Trainable document-quality classifier (CCNet/fastText-style gate).

The reference has no ML gate (SURVEY.md §0); this is the
training-data-pipeline operator real curation stacks put in front of
the corpus: instead of gating on hand-tuned heuristics alone, TRAIN a
linear classifier on cheap hashed text features and gate on its score.
The trainer is label-agnostic (``y`` is any 0/1 column); the scored
queries feed it a weak label distilled from a heuristic quality
signal, the same distillation CCNet does with its fastText LM filter.

Engine-exact determinism (what makes an ITERATIVE trainer fully
oracle-checkable, not rows-only — same property argument as k-means
and the PCA power iteration):

* Features are exact integer counts: each token hashes into one of
  ``n_buckets`` buckets (portable ``md5_hash32 % B``), plus a
  constant bias feature — no floats anywhere in the design matrix.
* The logistic link is the HARD sigmoid ``σ̂(z) = clamp(½ + z/4, 0,
  1)`` — piecewise linear, hence exactly computable in fixed point:
  with weights carried at scale S = 2^20, the fixed-point prediction
  is ``clamp(S/2 + margin DIV 4, 0, S)``. Every truncating division
  and every integer sum is engine-identical, so N chained gradient
  steps hash-match across engines.
* The gradient step is ``w_j += (Σ_d e_d·x_dj) DIV (n_docs·C)`` with
  error ``e_d = y_d·S − p_d`` — an exact-integer gradient of the
  squared hard-sigmoid loss, the learning rate one truncating
  division. The driver-side update divides |g| and restores the sign
  so it truncates toward zero exactly like Spark ``DIV`` / DuckDB
  ``//`` (Python ``//`` floors toward −∞ and would diverge on
  negative gradients).
* Init is all-zeros — no RNG; round 1 predicts S/2 everywhere and the
  first gradient is the class-conditional feature-count difference.

Scale shape — the MLlib/treeAggregate pattern, NOT a per-round join:
the dense ``(id, y, xs)`` frame is staged and persisted ONCE (the
token hash/count shuffle happens exactly once); each training round
is a single MAP-ONLY pass over the cache — margin, error, and
per-element gradient terms are all row-local — reduced by a (B+1)-
group aggregate whose map-side partials shrink the exchange to
B+1 × partitions rows, then collected to the driver (the gradient is
MODEL-sized, never data-sized). Updated weights re-enter the next
round as literals, i.e. a broadcast of B+1 longs. Per round: one tiny
shuffle, zero joins, zero data-sized driver traffic. Final scoring is
one more map-only projection. Magnitude audit: |e| ≤ S = 2^20 and
per-round weight growth ≤ S·x̄_j/C keep every margin term far inside
int64 for realistic token counts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.text import md5_hash32

#: fixed-point scale for weights / predictions (p ∈ [0, SCALE]).
LOGREG_SCALE = 1 << 20
#: learning-rate divisor constant: lr = 1 / (n_docs · C).
LOGREG_C = 32


def dense_hashed_features(
    df: DataFrame,
    tokens: Column,
    id_col: str = "id",
    carry: Sequence[str] = ("y",),
    n_buckets: int = 64,
    seed: int = 21,
) -> DataFrame:
    """Dense hashed-unigram design matrix: ``(id, *carry, xs)`` where
    ``xs`` is a (n_buckets+1)-long exact count vector — bucket j holds
    the count of tokens hashing (portable md5) into j, and the last
    element is the constant bias 1. Sparse token counts are aggregated
    with one (id, j)-keyed shuffle, then assembled into the dense
    array; documents with zero tokens still get their bias row."""
    toks = df.select(
        F.col(id_col).alias("id"),
        *carry,
        F.explode_outer(tokens).alias("tok"),
    )
    cnt = toks.groupBy(
        "id", *carry,
        F.when(
            F.col("tok").isNotNull(),
            md5_hash32(F.col("tok"), seed=seed) % n_buckets,
        ).alias("j"),
    ).agg(F.count("tok").cast("long").alias("x"))
    dense = cnt.groupBy("id", *carry).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.coalesce(F.col("j"), F.lit(-1)).alias("j"), "x"
                )
            )
        ).alias("__m")
    )
    xs = F.concat(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_buckets - 1)),
            lambda j: F.coalesce(
                F.element_at(F.col("__m"), j), F.lit(0).cast("long")
            ),
        ),
        F.array(F.lit(1).cast("long")),  # bias
    )
    return dense.select("id", *carry, xs.alias("xs"))


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward ZERO for all signs —
    matches Spark ``DIV`` and DuckDB ``//`` (Python ``//`` floors)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def dense_margin(xs: Column | str, w: Sequence[int]) -> Column:
    """Exact fixed-point margin ⟨xs, w⟩ over the dense feature vector
    (weights enter as an array literal — a broadcast of dim longs)."""
    warr = F.array(*[F.lit(int(wi)).cast("long") for wi in w])
    return F.aggregate(
        F.zip_with(xs, warr, lambda x, wv: x * wv),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def token_margin(
    tokens: Column,
    w: Sequence[int],
    n_buckets: int,
    seed: int = 21,
) -> Column:
    """The SERVING margin — row-local, shuffle-free: with hashed
    unigram counts, ⟨xs, w⟩ = Σ_tokens w[h(tok) % B] + w[B] (the bias),
    and int64 addition is associative, so the token-order sum is
    hash-identical to the dense dot product ``dense_margin`` computes.
    This is what makes the trained gate deployable at 100 TB: scoring
    never builds the design matrix — one map pass over the corpus with
    the (B+1)-long weight vector broadcast as literals, no explode, no
    (id, bucket) shuffle, no checkpoint."""
    warr = F.array(*[F.lit(int(wi)).cast("long") for wi in w])
    toks = F.coalesce(tokens, F.array().cast("array<string>"))
    per_tok = F.transform(
        toks,
        lambda t: F.element_at(
            warr, (md5_hash32(t, seed=seed) % n_buckets + 1).cast("int")
        ),
    )
    return F.aggregate(
        per_tok, F.lit(0).cast("long"), lambda acc, t: acc + t
    ) + F.lit(int(w[n_buckets])).cast("long")


def hard_sigmoid_fixed(margin_col: str, scale: int = LOGREG_SCALE) -> Column:
    """Fixed-point hard sigmoid ``clamp(S/2 + margin DIV 4, 0, S)``
    from the NAMED margin column the caller staged: the name is a
    parameter (no silent coupling to a hardcoded alias), and the
    expression references it exactly ONCE — CollapseProject inlines
    the staged margin HOF into every reference, so a 3-reference
    formulation was measured to triple the per-round scoring cost."""
    return F.least(
        F.greatest(
            F.lit(scale // 2).cast("long")
            + F.expr(f"`{margin_col}` DIV 4"),
            F.lit(0).cast("long"),
        ),
        F.lit(scale).cast("long"),
    )


def logreg_train(
    vecs: DataFrame,
    dim: int | None = None,
    iters: int = 8,
    scale: int = LOGREG_SCALE,
    lr_c: int = LOGREG_C,
    train_filter: Column | None = None,
) -> list[int]:
    """Train the hard-sigmoid logistic scorer on ``vecs`` (``id, y,
    xs``: dense integer features with y ∈ {0,1}) for ``iters`` exact
    fixed-point gradient rounds and return the final weights (dim
    longs — MODEL-sized, ready to re-enter any scoring plan as
    literals).

    ``dim`` is the feature-vector length (``n_buckets + 1`` from
    ``dense_hashed_features``); passing it skips a probe job. The
    document count the learning rate divides by is harvested from the
    first gradient aggregate itself (every dense row contributes every
    j, so any group's row count IS n) — training runs exactly
    ``iters`` jobs over the cached features, nothing else; the feature
    cache is released before returning.
    """
    staged = vecs.select(
        "id", F.col("y").cast("long").alias("y"), "xs"
    ).persist()
    # holdout evaluation: gradients see only the training split
    train = staged if train_filter is None else staged.filter(train_filter)
    if dim is None:
        dim = len(staged.select("xs").first()["xs"])
    n = None

    w = [0] * dim
    for _ in range(iters):
        # one map-only pass: margin → error (row-local), per-element
        # gradient terms exploded and partially aggregated map-side —
        # the exchange carries (dim × partitions) rows; the collect is
        # MODEL-sized (dim longs), the treeAggregate pattern.
        rowe = train.select(
            "xs", "y", dense_margin("xs", w).alias("__m")
        ).select(
            "xs",
            (
                F.col("y") * F.lit(scale)
                - hard_sigmoid_fixed("__m", scale)
            ).alias("__e"),
        )
        # posexplode → (dim)-group aggregate: map-side partials shrink
        # the exchange to dim × partitions rows and the collect is
        # MODEL-sized — the treeAggregate shape. (A one-row aggregate
        # with dim sum COLUMNS was measured ~25% slower end-to-end:
        # the dim-wide generated aggregate recompiles every round.)
        g_rows = (
            rowe.select(
                F.posexplode(
                    F.transform("xs", lambda x: x * F.col("__e"))
                ).alias("j", "gx")
            )
            .groupBy("j")
            .agg(
                F.sum("gx").alias("g"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        )
        if n is None:  # every group counts every doc (dense rows)
            # empty training split → n = 1 (weights stay zero instead
            # of dividing by zero); the oracle mirrors this with
            # GREATEST(n, 1) so both engines degrade identically.
            n = (g_rows[0]["cnt"] if g_rows else 0) or 1
        g = {r["j"]: r["g"] for r in g_rows}
        w = [
            wj + _tdiv(g.get(j, 0), n * lr_c) for j, wj in enumerate(w)
        ]
    staged.unpersist()
    return w


def scored_columns(
    df: DataFrame, margin: Column, scale: int = LOGREG_SCALE
) -> DataFrame:
    """Attach the scorer's output columns to ``df`` from a margin
    expression: ``margin_fixed``, ``prob_fixed`` (hard sigmoid at
    ``scale``), and ``predicted`` (probability ≥ ½). Keeps every
    existing column; the whole attachment is row-local."""
    staged = df.withColumn("__m", margin)
    p = hard_sigmoid_fixed("__m", scale)
    return staged.select(
        *[c for c in df.columns],
        F.col("__m").alias("margin_fixed"),
        p.alias("prob_fixed"),
        (p * 2 >= F.lit(scale)).alias("predicted"),
    )


def logreg_train_score(
    vecs: DataFrame,
    dim: int | None = None,
    iters: int = 8,
    scale: int = LOGREG_SCALE,
    lr_c: int = LOGREG_C,
    train_filter: Column | None = None,
) -> DataFrame:
    """Train (``logreg_train``), then score every document in ``vecs``
    with the final weights over the dense features — one LAZY map-only
    projection; the weights are literals, so the returned plan has no
    Python, no cache, and no checkpoint. Callers that hold the token
    column should prefer ``token_margin`` + ``scored_columns`` — the
    shuffle-free serving path that skips the design matrix entirely.

    Returns one row per document: ``(id, label int, margin_fixed
    bigint, prob_fixed bigint, predicted boolean)``.
    """
    if dim is None:
        dim = len(vecs.select("xs").first()["xs"])
    w = logreg_train(
        vecs, dim=dim, iters=iters, scale=scale, lr_c=lr_c,
        train_filter=train_filter,
    )
    base = vecs.select(
        "id", F.col("y").cast("int").alias("label"), "xs"
    )
    return scored_columns(
        base, dense_margin("xs", w), scale=scale
    ).drop("xs")
