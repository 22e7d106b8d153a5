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
    ``<prefix>_postings`` bucketed+sorted by term (posting lists are
    contiguous and tok-keyed ops — df refresh, index merges — need no
    exchange), ``<prefix>_doclen`` bucketed by doc id, and the one-row
    ``<prefix>_stats``. Build is the only pass over document text;
    at 100 TB it runs once per ingest and every retrieval thereafter
    reads only index bytes.
    """
    from exceldatatransform_py_spark.sources.bucketing import write_bucketed

    staged = bm25_stage(docs, id_col=id_col, text_col=text_col)
    write_bucketed(
        staged["postings"], f"{table_prefix}_postings", ["tok"], n_buckets,
        sort_cols=["tok"], path=f"{path}/postings",
    )
    write_bucketed(
        staged["doclen"], f"{table_prefix}_doclen", ["doc_id"], n_buckets,
        path=f"{path}/doclen",
    )
    (
        staged["stats"].coalesce(1).write.mode("overwrite")
        .option("path", f"{path}/stats").saveAsTable(f"{table_prefix}_stats")
    )


def bm25_topk_from_index(
    spark: SparkSession,
    table_prefix: str,
    query_terms: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Serve top-k from a persisted index — no document text is read.
    Scores are identical to the live ``bm25_topk`` over the same
    corpus (pinned by test): the index stores exact integer tf/df/dl
    and the scoring expression is shared."""
    return bm25_topk(
        query_terms,
        spark.table(f"{table_prefix}_postings"),
        spark.table(f"{table_prefix}_doclen"),
        spark.table(f"{table_prefix}_stats"),
        k=k,
    )
