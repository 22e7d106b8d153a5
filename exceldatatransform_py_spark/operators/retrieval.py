"""BM25 lexical retrieval: live scoring and a persisted inverted index.

The pattern worth owning at 100 TB is the BUILD/SERVE split: tokenize
the corpus ONCE into a bucketed inverted index (postings bucketed by
term, document lengths bucketed by doc id, one-row corpus stats), then
answer every retrieval query from the index without touching document
text again. Build cost amortizes across queries exactly like the IVF
cell assignment in ``operators.similarity``; the serving join reads
only the query terms' posting lists.

Scoring is engine-exact by the module's fixed-point rule: each term's
BM25 contribution floor-scales to a BIGINT before summing (double
addition is not associative; BIGINT addition is), and idf is the
rational N/df — no ``ln``, so DuckDB oracles reproduce scores
bit-for-bit (see ``plans.queries_llm.bm25_topk_docs``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.text import ws_tokens

BM25_K1 = 1.2
BM25_B = 0.75
BM25_SCALE = 1_000_000_000


def tokenize(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) pairs: lowercased whitespace tokens, one row per
    occurrence (term frequency preserved)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tok"),
    )


def bm25_stage(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, DataFrame]:
    """Derive the three index relations live (no persistence):
    ``postings`` (tok, doc_id, tf, df), ``doclen`` (doc_id, dl),
    ``stats`` (n_docs, avgdl). The returned frames share one
    tokenize+tf subtree — callers that consume several of them should
    persist that subtree (the live query does)."""
    toks = tokenize(docs, id_col, text_col)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    return {
        "postings": tf.join(df_, "tok"),
        "doclen": doclen,
        "stats": stats,
    }


def bm25_contrib() -> Column:
    """One term's floor-scaled BM25 contribution, from columns
    (tf, df, dl, n_docs, avgdl) — the single source of truth for both
    the live query and the index-served path (and, via the same
    constants, the DuckDB oracle string)."""
    return F.floor(
        (F.col("n_docs").cast("double") / F.col("df"))
        * (F.col("tf") * (BM25_K1 + 1))
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * (F.col("dl") / F.col("avgdl")))
        )
        * BM25_SCALE
    ).cast("bigint")


def bm25_topk(
    query_terms: DataFrame,
    postings: DataFrame,
    doclen: DataFrame,
    stats: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Top-k BM25 matches per query from staged index relations.

    ``query_terms``: (query_id, tok), distinct — small, broadcast.
    Work is the sum of the query terms' posting-list sizes; the df cap
    (drop terms with df above a fraction of N before calling) is the
    stopword knob that bounds it at corpus scale. Self-matches
    (query_id == doc_id) are excluded, mirroring ``cosine_topk``.
    """
    term = (
        F.broadcast(query_terms)
        .join(postings, "tok")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", bm25_contrib().alias("contrib"))
    )
    score = term.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score_scaled"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_scaled").desc(), F.col("doc_id").asc()
    )
    return (
        score.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "doc_id",
            "score_scaled",
            "n_terms",
            (F.col("score_scaled").cast("double") / BM25_SCALE).alias("score"),
            "rk",
        )
    )


def build_bm25_index(
    docs: DataFrame,
    table_prefix: str,
    n_buckets: int,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the inverted index as bucketed catalog tables:
    ``<prefix>_postings`` (tok, doc_id, tf) bucketed+sorted by term,
    ``<prefix>_df`` (tok, df) bucketed+sorted by term — NORMALIZED out
    of the postings so a batch append only merges the vocab-sized df
    table instead of invalidating every stored posting row —
    ``<prefix>_doclen`` bucketed by doc id, and the one-row
    ``<prefix>_stats`` carrying ``sum_dl`` so corpus stats maintain
    incrementally. Serve re-joins postings⋈df on ``tok``: both sides
    bucketed identically, so the join is co-located (no exchange).
    Build is the only pass over document text; at 100 TB it runs once
    per ingest and every retrieval thereafter reads only index bytes.
    """
    from exceldatatransform_py_spark.sources.bucketing import write_bucketed

    tf = (
        tokenize(docs, id_col, text_col)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    write_bucketed(
        tf, f"{table_prefix}_postings", ["tok"], n_buckets,
        sort_cols=["tok"], path=f"{path}/postings",
    )
    write_bucketed(
        tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")),
        f"{table_prefix}_df", ["tok"], n_buckets,
        sort_cols=["tok"], path=f"{path}/df",
    )
    doclen = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    write_bucketed(
        doclen, f"{table_prefix}_doclen", ["doc_id"], n_buckets,
        path=f"{path}/doclen",
    )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    (
        stats.coalesce(1).write.mode("overwrite")
        .option("path", f"{path}/stats").saveAsTable(f"{table_prefix}_stats")
    )
    tf.unpersist()


def append_to_bm25_index(
    spark: SparkSession,
    new_docs: DataFrame,
    table_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Continuous ingest for the lexical index — work scales with the
    BATCH: the batch's postings and doc lengths bucket-append
    (``insertInto`` preserves the bucket spec), the vocab-sized df
    table merges by addition on its bucket key (one co-located
    aggregate-to-aggregate merge, the ``incremental_agg_merge``
    pattern), and the one-row stats maintain incrementally from the
    stored ``sum_dl``/``n_docs`` — no stored posting row is read or
    rewritten, and no document text outside the batch is touched.
    Serve output afterwards is identical to a full rebuild over the
    union (pinned by test): tf/df/dl are exact integers and avgdl is
    one exact-integer division.

    NOT ATOMIC across the four tables (same caveat as
    ``maintenance.compact_table``): postings/doclen append before the
    df merge and stats rewrite, so a writer that dies mid-append can
    leave postings whose tokens are missing from the df table — the
    serve-side inner postings⋈df join then silently drops them, and a
    blind retry double-appends the batch. Recovery: re-run the df
    merge + stats rewrite from the postings table (both are pure
    functions of it), or rebuild. The snapshot layer's
    ``CommitProtocol`` (sources/snapshots.py) is the documented
    upgrade path for making multi-table index commits atomic."""
    from exceldatatransform_py_spark.sources.bucketing import write_bucketed
    from exceldatatransform_py_spark.sources.maintenance import table_layout

    tf_b = (
        tokenize(new_docs, id_col, text_col)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    tf_b.write.mode("append").insertInto(f"{table_prefix}_postings")
    doclen_b = tf_b.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    doclen_b.write.mode("append").insertInto(f"{table_prefix}_doclen")

    df_b = tf_b.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    df_tbl = f"{table_prefix}_df"
    lay = table_layout(spark, df_tbl)
    merged = (
        spark.table(df_tbl)
        .join(df_b.withColumnRenamed("df", "__bdf"), "tok", "full_outer")
        .select(
            "tok",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("__bdf"), F.lit(0))
            ).alias("df"),
        )
        .localCheckpoint(eager=True)  # must not read what it replaces
    )
    write_bucketed(
        merged, df_tbl, lay["bucket_cols"], lay["n_buckets"],
        sort_cols=lay["sort_cols"] or None, path=lay["location"],
        mode="overwrite",
    )

    # one-row stats: exact integer increments, control-plane sized
    old = spark.table(f"{table_prefix}_stats").first()
    batch = doclen_b.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    n_docs = int(old["n_docs"]) + int(batch["n"] or 0)
    sum_dl = int(old["sum_dl"]) + int(batch["s"] or 0)
    stats_lay = table_layout(spark, f"{table_prefix}_stats")
    (
        spark.createDataFrame(
            [(n_docs, sum_dl, sum_dl / n_docs)],
            "n_docs bigint, sum_dl bigint, avgdl double",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("path", stats_lay["location"])
        .saveAsTable(f"{table_prefix}_stats")
    )
    tf_b.unpersist()


def bm25_topk_from_index(
    spark: SparkSession,
    table_prefix: str,
    query_terms: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Serve top-k from a persisted index — no document text is read.
    Scores are identical to the live ``bm25_topk`` over the same
    corpus (pinned by test): the index stores exact integer tf/df/dl
    and the scoring expression is shared. The postings⋈df re-join is
    co-located (both bucketed+sorted by ``tok``).

    Tombstones (``maintenance.delete_from_index``) are respected
    EXACTLY: deleted docs' postings and lengths anti-join away, the
    per-token df subtracts the removals recorded at delete time
    (``<prefix>_deldf``), and n_docs/avgdl recompute from the
    surviving doc lengths — all exact integers, so the serve is
    bit-identical before and after ``compact_index`` purges the
    tombstones physically."""
    from exceldatatransform_py_spark.sources.maintenance import (
        index_tombstones,
    )

    postings_t = spark.table(f"{table_prefix}_postings")
    df_t = spark.table(f"{table_prefix}_df")
    doclen_t = spark.table(f"{table_prefix}_doclen")
    stats_t = spark.table(f"{table_prefix}_stats")
    tomb = index_tombstones(spark, table_prefix)
    if tomb is not None:
        tomb_d = F.broadcast(tomb.withColumnRenamed("id", "doc_id"))
        postings_t = postings_t.join(tomb_d, "doc_id", "left_anti")
        doclen_t = doclen_t.join(tomb_d, "doc_id", "left_anti")
        if spark.catalog.tableExists(f"{table_prefix}_deldf"):
            corr = (
                spark.table(f"{table_prefix}_deldf")
                .groupBy("tok")
                .agg(F.sum("dfrm").alias("__dfrm"))
            )
            df_t = (
                df_t.join(corr, "tok", "left")
                .select(
                    "tok",
                    (
                        F.col("df")
                        - F.coalesce(F.col("__dfrm"), F.lit(0))
                    ).alias("df"),
                )
                .filter(F.col("df") > 0)
            )
        stats_t = doclen_t.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").cast("bigint").alias("sum_dl"),
            (
                F.sum("dl").cast("double") / F.count(F.lit(1))
            ).alias("avgdl"),
        )
    return bm25_topk(
        query_terms,
        postings_t.join(df_t, "tok"),
        doclen_t,
        stats_t,
        k=k,
    )
