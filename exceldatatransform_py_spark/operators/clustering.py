"""Distributed k-means over embedding columns (Lloyd's algorithm).

The reference has no clustering (SURVEY.md §0); this is the
training-data-pipeline operator that powers corpus bucketing /
semantic sharding at 100 TB: assign every embedding to one of k
centroids, iterating assignment → centroid update a fixed number of
rounds.

Engine-exact determinism (the property that makes an ITERATIVE
algorithm fully oracle-checkable, not rows-only):

* Points are quantized ONCE to fixed-point BIGINTs
  (``floor(x * 10^6)``) — every distance is then an exact integer
  (|x| ≤ ~1e6 ⇒ a 64-dim squared distance ≤ ~2.6e14, far inside
  BIGINT), so argmin decisions cannot drift between engines.
* Centroid updates divide exact BIGINT sums by exact counts in IEEE
  double (both magnitudes < 2^53 ⇒ the division inputs are exact, and
  double division + floor are bit-identical everywhere), then
  re-quantize with ``floor`` back to BIGINT coordinates.
* Ties in the argmin break on centroid id; initial centroids are the
  k smallest point ids — no RNG anywhere.

Scale shape: one broadcast of k centroids per iteration (a single
aggregated row — k·dim·8 bytes), one map-side scoring pass over the
points (no shuffle), and one (cid, dim)-keyed aggregate for the
update (shuffle rows = k·dim, independent of corpus size). Points are
persisted once and never reshuffled. The per-element higher-order
functions are interpreted (see NOTES) — at extreme dim·k a Pandas-UDF
scorer is the drop-in upgrade; the plan shape stays identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for point/centroid coordinates.
KMEANS_SCALE = 1_000_000


def quantize_vec(col: str | Column, scale: int = KMEANS_SCALE) -> Column:
    """``array<float>`` → exact fixed-point ``array<bigint>``:
    ``floor(cast(x as double) * scale)`` per element."""
    return F.transform(
        col, lambda e: F.floor(e.cast("double") * F.lit(float(scale))).cast("long")
    )


def _sqdist(xs: Column, cs: Column) -> Column:
    """Exact integer squared L2 distance between two bigint arrays."""
    return F.aggregate(
        F.zip_with(xs, cs, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _lloyd(
    pts: DataFrame, id_col: str, k: int, iters: int
) -> tuple[DataFrame, DataFrame]:
    """Shared Lloyd loop over pre-quantized points ``(id_col, xs)``:
    ``iters`` assignment rounds, ``iters - 1`` centroid updates.
    Returns ``(cents, assigned)`` — the centroids the FINAL assignment
    scored against (``cid``, ``cs array<bigint>``) and that assignment
    (``id_col, xs, cid, d2``). Both are lazy; a caller consuming only
    one never executes the other's tail."""
    # Centroids as ONE aggregated row holding array<struct<cid, cs>> —
    # the broadcast-scalar pattern: scoring is then a map-only pass
    # (BroadcastNestedLoopJoin of a 1-row side), never a shuffle of
    # the points.
    cents = pts.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), F.col("xs").alias("cs")
    )

    assigned = None
    for it in range(iters):
        carr = cents.agg(
            F.sort_array(F.collect_list(F.struct("cid", "cs"))).alias("carr")
        )
        scored = pts.crossJoin(F.broadcast(carr))
        best = F.array_min(
            F.transform(
                "carr",
                lambda c: F.struct(
                    _sqdist(F.col("xs"), c["cs"]).alias("d2"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        assigned = scored.select(
            id_col, "xs", best["cid"].alias("cid"), best["d2"].alias("d2")
        )
        if it == iters - 1:
            break
        # Update: per-(cid, dim) exact sums — shuffle volume k·dim
        # regardless of corpus size — then floor-requantized means,
        # reassembled into per-centroid arrays ordered by dim.
        ex = assigned.select("cid", F.posexplode("xs").alias("i", "x"))
        sums = ex.groupBy("cid", "i").agg(
            F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
        )
        cx = sums.select(
            "cid",
            "i",
            F.floor(F.col("s").cast("double") / F.col("n")).cast("long").alias("cx"),
        )
        cents = cx.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cx"))),
                lambda t: t["cx"],
            ).alias("cs")
        )
    return cents, assigned


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """Lloyd's k-means: ``iters`` assignment rounds with ``iters - 1``
    centroid updates between them; returns the final assignment
    ``(id_col, cluster_id, sqdist)``.

    ``cluster_id`` is the id of the point that seeded the centroid
    (the k smallest ids); ``sqdist`` is the exact fixed-point squared
    distance to the final centroid.
    """
    pts = df.select(
        F.col(id_col), quantize_vec(vec_col, scale).alias("xs")
    ).persist()
    _, assigned = _lloyd(pts, id_col, k, iters)
    return assigned.select(
        id_col, F.col("cid").alias("cluster_id"), F.col("d2").alias("sqdist")
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """The trained coarse quantizer: centroids after ``iters - 1``
    Lloyd updates, de-quantized back to double coordinates —
    ``(cid bigint, cvec array<double>)``. This is the DataFrame an IVF
    index plugs in as its centroid set (``similarity.ivf_topk``);
    because training is engine-exact, the composed index remains fully
    oracle-checkable end-to-end."""
    pts = df.select(
        F.col(id_col), quantize_vec(vec_col, scale).alias("xs")
    ).persist()
    cents, _ = _lloyd(pts, id_col, k, iters)
    return cents.select(
        "cid",
        F.transform(
            "cs", lambda c: c.cast("double") / F.lit(float(scale))
        ).alias("cvec"),
    )
