"""BM25 index build/serve split: the persisted inverted index must
answer retrieval queries without reading document text, with scores
identical to the live scoring path."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from exceldatatransform_py_spark.operators.retrieval import (
    bm25_stage,
    bm25_topk,
    bm25_topk_from_index,
    build_bm25_index,
    tokenize,
)
from exceldatatransform_py_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def index(spark, tmp_path):
    prefix = "bm25_test_idx"
    docs = read_table(spark, SF, "documents")
    build_bm25_index(docs, prefix, n_buckets=4, path=str(tmp_path / "idx"))
    yield prefix
    for t in ("postings", "df", "doclen", "stats"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def _query_terms(spark):
    docs = read_table(spark, SF, "documents")
    return (
        tokenize(docs.filter(F.col("doc_id") < 10), "doc_id", "text")
        .select(F.col("doc_id").alias("query_id"), "tok")
        .distinct()
    )


def test_index_serving_matches_live_scoring(spark, index):
    q = _query_terms(spark)
    served = sorted(
        tuple(r) for r in bm25_topk_from_index(spark, index, q, k=5).collect()
    )
    docs = read_table(spark, SF, "documents")
    staged = bm25_stage(docs)
    live = sorted(
        tuple(r)
        for r in bm25_topk(
            q, staged["postings"], staged["doclen"], staged["stats"], k=5
        ).collect()
    )
    assert served == live
    assert len(served) == 10 * 5


def test_index_serving_reads_no_document_text(spark, index):
    """The serving plan must scan only index tables — no documents
    scan, no tokenizer — and read the postings through the bucketed
    layout (build cost amortized, text read exactly once at build)."""
    q = _query_terms(spark)
    plan_df = bm25_topk_from_index(spark, index, q, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    corpus_side = plan.split("ReadSchema")  # every scan's schema line
    doc_text_scans = [s for s in corpus_side[1:] if "text:string" in s.splitlines()[0]]
    # the only text tokenization allowed is the 10-doc QUERY side
    assert len(doc_text_scans) <= 1
    assert f"{index}_postings" in plan
    assert "Bucketed: true" in plan


def test_index_postings_groupby_no_exchange(spark, index):
    """tok-keyed maintenance ops (df refresh, merges) reuse the bucket
    partitioning — zero Exchange on the postings table."""
    agg = (
        spark.table(f"{index}_postings")
        .groupBy("tok")
        .agg(F.sum("tf").alias("ttf"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    plan = buf.getvalue()
    import re

    assert not re.findall(r"\(\d+\) Exchange", plan), plan
    assert agg.count() > 0


# ---------------------------------------------------------------------------
# Incremental dedup: batch-vs-corpus near-dup through the persisted
# index must equal the cross-subset slice of full-batch LSH.
# ---------------------------------------------------------------------------


def test_incremental_near_dup_matches_full_batch(spark, tmp_path):
    from exceldatatransform_py_spark.operators.dedup import (
        build_dedup_index,
        incremental_near_dup,
        minhash_lsh_pairs,
    )

    docs = read_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") >= 50)
    batch = docs.filter(F.col("doc_id") < 50)
    prefix = "dedup_test_idx"
    build_dedup_index(
        corpus, prefix, n_buckets=4, path=str(tmp_path / "dd")
    )
    try:
        inc = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in incremental_near_dup(
                spark, prefix, batch, threshold=0.5
            ).collect()
        )
        # ground truth: full-batch LSH over the union, restricted to
        # cross pairs (one side in the batch, the other in the corpus)
        full = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
        cross = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in full.filter(
                (F.col("id_a") < 50) & (F.col("id_b") >= 50)
            ).collect()
        )
        assert inc == cross
        assert len(inc) > 0  # the synthetic corpus does contain near-dups
    finally:
        for t in ("bands", "shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_incremental_near_dup_reads_no_corpus_text(spark, tmp_path):
    """The serving plan must not re-shingle the corpus: its only
    document-text scan is the new batch."""
    from exceldatatransform_py_spark.operators.dedup import (
        build_dedup_index,
        incremental_near_dup,
    )

    docs = read_table(spark, SF, "documents")
    prefix = "dedup_test_idx2"
    build_dedup_index(
        docs.filter(F.col("doc_id") >= 50), prefix, n_buckets=4,
        path=str(tmp_path / "dd2"),
    )
    try:
        out = incremental_near_dup(
            spark, prefix, docs.filter(F.col("doc_id") < 50)
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        text_scans = [
            s for s in plan.split("ReadSchema")[1:]
            if "text:string" in s.splitlines()[0]
        ]
        assert len(text_scans) <= 1  # the batch side only
        assert f"{prefix}_bands" in plan and f"{prefix}_shingles" in plan
    finally:
        for t in ("bands", "shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_continuous_ingest_dedup_loop(spark, tmp_path):
    """The production ingest loop: check batch N against the index,
    admit it, and batch N+1 must see batch N's documents (not just
    the original corpus)."""
    from exceldatatransform_py_spark.operators.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        incremental_near_dup,
        minhash_lsh_pairs,
    )

    docs = read_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") >= 100)
    b1 = docs.filter(F.col("doc_id") < 50)
    b2 = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
    prefix = "dedup_loop_idx"
    build_dedup_index(corpus, prefix, n_buckets=4, path=str(tmp_path / "dl"))
    try:
        incremental_near_dup(spark, prefix, b1).count()  # check batch 1
        append_to_dedup_index(b1, prefix)  # admit batch 1
        got = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in incremental_near_dup(spark, prefix, b2).collect()
        )
        # ground truth: full-batch pairs with one side in b2 and the
        # other in corpus ∪ b1 (order-normalized: full LSH emits
        # id_a < id_b, so b2-vs-b1 pairs arrive as (b1, b2) — flip)
        full = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
        want = []
        for r in full.collect():
            in_b2_a = 50 <= r.id_a < 100
            in_b2_b = 50 <= r.id_b < 100
            if in_b2_a and not in_b2_b:
                want.append((r.id_a, r.id_b, r.jaccard))
            elif in_b2_b and not in_b2_a:
                want.append((r.id_b, r.id_a, r.jaccard))
        assert got == sorted(want)
        assert any(b < 50 for _, b, _ in got)  # batch-1 docs are seen
    finally:
        for t in ("bands", "shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_streaming_ingest_loop_with_incremental_dedup(spark, tmp_path):
    """The production continuous-ingest shape end-to-end: a document
    stream drained through ``foreachBatch``, each micro-batch probed
    against the persisted index (``incremental_near_dup``), near-dups
    dropped, survivors admitted (``append_to_dedup_index``) so later
    batches see earlier ones. Two availableNow drains against one
    checkpoint force deterministic batch boundaries (second drain
    reads only the files that arrived after the first)."""
    from exceldatatransform_py_spark.operators.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        incremental_near_dup,
        minhash_lsh_pairs,
    )

    docs = read_table(spark, SF, "documents").select(
        "doc_id", "text"
    )
    seed = docs.filter(F.col("doc_id") >= 400)
    wave1 = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400))
    wave2 = docs.filter(F.col("doc_id") < 200)

    prefix = "dedup_stream_idx"
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    build_dedup_index(seed, prefix, n_buckets=4, path=str(tmp_path / "dd"))

    flagged: list[int] = []
    admitted: list[int] = []

    def ingest(batch_df, _bid):
        pairs = incremental_near_dup(spark, prefix, batch_df, threshold=0.5)
        dup_ids = pairs.select(F.col("id_a").alias("doc_id")).distinct()
        keep = batch_df.join(dup_ids, "doc_id", "left_anti")
        flagged.extend(r.doc_id for r in dup_ids.collect())
        admitted.extend(r.doc_id for r in keep.select("doc_id").collect())
        append_to_dedup_index(keep, prefix)

    def drain():
        q = (
            spark.readStream.schema(docs.schema)
            .parquet(in_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        wave1.write.mode("append").parquet(in_dir)
        drain()
        admitted_w1 = sorted(admitted)
        wave2.write.mode("append").parquet(in_dir)
        drain()

        # ground truth for wave 1: near-dup of the SEED corpus only
        full = minhash_lsh_pairs(
            docs.filter(F.col("doc_id") >= 200), "doc_id", "text",
            threshold=0.5,
        )
        w1_expected_flagged = sorted(
            {
                r.id_a
                for r in full.filter(
                    (F.col("id_a") >= 200)
                    & (F.col("id_a") < 400)
                    & (F.col("id_b") >= 400)
                ).collect()
            }
        )
        got_w1_flagged = sorted(set(range(200, 400)) - set(admitted_w1))
        assert got_w1_flagged == w1_expected_flagged
        # wave 2 was checked against seed + admitted wave-1 docs: every
        # flagged wave-2 doc must have a near-dup partner in that set,
        # and no admitted wave-2 doc may (cross-check with full LSH).
        visible = set(r.doc_id for r in seed.select("doc_id").collect()) | set(
            admitted_w1
        )
        full_all = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
        cross2 = {
            r.id_a
            for r in full_all.filter(F.col("id_a") < 200).collect()
            if r.id_b in visible
        }
        w2_flagged = set(flagged) - set(got_w1_flagged)
        assert w2_flagged == cross2
        # the stream actually caught duplicates (synthetic corpus has them)
        assert flagged, "no near-dups flagged across the whole stream"
    finally:
        for t in ("bands", "shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


# ---------------------------------------------------------------------------
# IVF ANN build/serve split (the dense twin of the BM25 split above):
# the persisted index must answer probes without re-assigning or
# re-scoring the corpus, with results identical to the live path.
# ---------------------------------------------------------------------------


def _ivf_parts(spark):
    emb = read_table(spark, SF, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return emb, centroids, queries


@pytest.fixture()
def ivf_index(spark, tmp_path):
    from exceldatatransform_py_spark.operators.similarity import build_ivf_index

    prefix = "ivf_test_idx"
    emb, centroids, _ = _ivf_parts(spark)
    build_ivf_index(
        emb, centroids, prefix, path=str(tmp_path / "ivf"),
        id_col="vec_id", vec_col="embedding",
    )
    yield prefix
    for t in ("cells", "centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_ivf_index_serving_matches_live(spark, ivf_index):
    from exceldatatransform_py_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    served = sorted(
        tuple(r)
        for r in ivf_topk_from_index(
            spark, ivf_index, queries, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=2,
        ).collect()
    )
    live = sorted(
        tuple(r)
        for r in ivf_topk(
            queries, emb, centroids, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=2,
        ).collect()
    )
    assert served == live
    assert len(served) == 10 * 5


def test_ivf_index_serving_prunes_and_never_rescans_corpus(spark, ivf_index):
    """Serve plan posture: (a) zero corpus re-scoring — no aggregate
    anywhere (live assignment needs a groupBy arg-max; the index path
    must not), (b) the cell-partitioned scan carries a dynamic
    partition pruning filter from the broadcast probe side, so a
    probe reads only the probed cells' files."""
    import contextlib
    import io

    from exceldatatransform_py_spark.operators.similarity import (
        ivf_topk_from_index,
    )

    _, _, queries = _ivf_parts(spark)
    df = ivf_topk_from_index(
        spark, ivf_index, queries, id_col="vec_id", vec_col="embedding",
        k=5, n_probe=2,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "HashAggregate" not in plan
    assert "dynamicpruning" in plan
    # the raw corpus table is only ever read for the FILTERED query
    # side — every scan of embeddings.parquet carries the query-id
    # pushdown; the corpus vectors come exclusively from the index.
    for block in plan.split("\n\n"):
        if "embeddings.parquet" in block:
            assert "LessThan(vec_id,10)" in block


def test_ivf_index_append_matches_rebuild(spark, tmp_path):
    """Continuous ingest: append a new vector batch to a persisted IVF
    index (assigned against the STORED centroids, corpus untouched) —
    serving the appended index must equal serving an index rebuilt
    from scratch over the full corpus."""
    from exceldatatransform_py_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    pa, pb = "ivf_appended_idx", "ivf_rebuilt_idx"
    build_ivf_index(
        seed, centroids, pa, path=str(tmp_path / "a"),
        id_col="vec_id", vec_col="embedding",
    )
    build_ivf_index(
        emb, centroids, pb, path=str(tmp_path / "b"),
        id_col="vec_id", vec_col="embedding",
    )
    try:
        append_to_ivf_index(
            spark, batch, pa, id_col="vec_id", vec_col="embedding"
        )
        serve = lambda p: sorted(
            tuple(r)
            for r in ivf_topk_from_index(
                spark, p, queries, id_col="vec_id", vec_col="embedding",
                k=5, n_probe=2,
            ).collect()
        )
        assert serve(pa) == serve(pb)
        assert len(serve(pa)) == 10 * 5
    finally:
        for pre in (pa, pb):
            for t in ("cells", "centroids"):
                spark.sql(f"DROP TABLE IF EXISTS {pre}_{t}")


# ---------------------------------------------------------------------------
# LSH build/serve split (completing the retrieval-index family:
# BM25 ✓, IVF ✓, hyperplane LSH here).
# ---------------------------------------------------------------------------


def test_lsh_index_serving_matches_live_and_appends(spark, tmp_path):
    from exceldatatransform_py_spark.operators.similarity import (
        append_to_lsh_index,
        build_lsh_index,
        hyperplane_lsh_topk,
        lsh_topk_from_index,
    )

    emb = read_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    prefix = "lsh_test_idx"
    build_lsh_index(
        emb.filter(F.col("vec_id") % 2 == 0), prefix,
        path=str(tmp_path / "lsh"), id_col="vec_id", vec_col="embedding",
    )
    try:
        append_to_lsh_index(
            spark, emb.filter(F.col("vec_id") % 2 == 1), prefix,
            id_col="vec_id", vec_col="embedding",
        )
        served = sorted(
            tuple(r)
            for r in lsh_topk_from_index(
                spark, prefix, queries, id_col="vec_id",
                vec_col="embedding", k=5, probe_hamming=1,
            ).collect()
        )
        live = sorted(
            tuple(r)
            for r in hyperplane_lsh_topk(
                queries, emb, id_col="vec_id", vec_col="embedding", k=5,
                dim=64, n_planes=4, seed=42, probe_hamming=1,
            ).collect()
        )
        assert served == live
        assert len(served) == 10 * 5

        # plan posture: partition pruning on the bucket scan, and the
        # raw corpus only ever read for the filtered query side.
        df = lsh_topk_from_index(
            spark, prefix, queries, id_col="vec_id", vec_col="embedding",
            k=5, probe_hamming=1,
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "dynamicpruning" in plan
        for block in plan.split("\n\n"):
            if "embeddings.parquet" in block:
                assert "LessThan(vec_id,10)" in block
    finally:
        for t in ("buckets", "planes"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_streaming_ingest_loop_with_ivf_append(spark, tmp_path):
    """Continuous ANN ingest end-to-end: an embedding stream drained
    through foreachBatch, each micro-batch assigned against the
    stored centroids and appended to the IVF index, so later probes
    see earlier batches. After both waves the index serves
    identically to a from-scratch rebuild over the full corpus."""
    from exceldatatransform_py_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    seed = emb.filter(F.col("vec_id") >= 300)
    wave1 = emb.filter((F.col("vec_id") >= 150) & (F.col("vec_id") < 300))
    wave2 = emb.filter(F.col("vec_id") < 150)

    prefix = "ivf_stream_idx"
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    build_ivf_index(
        seed, centroids, prefix, path=str(tmp_path / "ivf"),
        id_col="vec_id", vec_col="embedding",
    )

    stream_schema = emb.select("vec_id", "embedding").schema

    def ingest(batch_df, _bid):
        append_to_ivf_index(
            spark, batch_df, prefix, id_col="vec_id", vec_col="embedding"
        )

    def drain():
        q = (
            spark.readStream.schema(stream_schema)
            .parquet(in_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        wave1.select("vec_id", "embedding").write.mode("append").parquet(in_dir)
        drain()
        wave2.select("vec_id", "embedding").write.mode("append").parquet(in_dir)
        drain()

        served = sorted(
            tuple(r)
            for r in ivf_topk_from_index(
                spark, prefix, queries, id_col="vec_id",
                vec_col="embedding", k=5, n_probe=2,
            ).collect()
        )
        build_ivf_index(
            emb, centroids, "ivf_rebuild_ref", path=str(tmp_path / "ref"),
            id_col="vec_id", vec_col="embedding",
        )
        rebuilt = sorted(
            tuple(r)
            for r in ivf_topk_from_index(
                spark, "ivf_rebuild_ref", queries, id_col="vec_id",
                vec_col="embedding", k=5, n_probe=2,
            ).collect()
        )
        assert served == rebuilt
        assert len(served) == 10 * 5
    finally:
        for pre in (prefix, "ivf_rebuild_ref"):
            for t in ("cells", "centroids"):
                spark.sql(f"DROP TABLE IF EXISTS {pre}_{t}")


def test_incremental_simhash_matches_full_batch_and_loops(spark, tmp_path):
    """SimHash index probe ≡ the cross slice of full-batch SimHash
    pairing (recall is exact for hamming ≤ 3 regardless of which side
    of the index split a pair straddles), and an admitted batch is
    visible to the next probe."""
    from exceldatatransform_py_spark.operators.dedup import (
        append_to_simhash_index,
        build_simhash_index,
        incremental_simhash_near_dup,
        simhash64,
        simhash_near_dup,
    )

    docs = read_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") >= 100)
    b1 = docs.filter(F.col("doc_id") < 50)
    b2 = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
    prefix = "simhash_test_idx"
    build_simhash_index(
        corpus, prefix, n_buckets=4, path=str(tmp_path / "sh")
    )
    try:
        # probe batch 1 against the corpus, admit it, probe batch 2
        got1 = sorted(
            (r.id_a, r.id_b, r.hamming)
            for r in incremental_simhash_near_dup(
                spark, prefix, b1, max_band_docs=10_000
            ).collect()
        )
        append_to_simhash_index(b1, prefix)
        got2 = sorted(
            (r.id_a, r.id_b, r.hamming)
            for r in incremental_simhash_near_dup(
                spark, prefix, b2, max_band_docs=10_000
            ).collect()
        )
        # ground truth: full-batch pairing over everything, sliced to
        # (batch, seen-side) pairs, order-normalized (full emits
        # a_id < b_id; the probe emits (new, indexed)).
        full = simhash_near_dup(
            simhash64(docs, "doc_id", "text"), "doc_id",
            max_band_docs=10_000,
        )

        def cross(lo, hi, seen):
            want = []
            for r in full.collect():
                a_in = lo <= r.a_id < hi
                b_in = lo <= r.b_id < hi
                if a_in and not b_in and seen(r.b_id):
                    want.append((r.a_id, r.b_id, r.hamming))
                elif b_in and not a_in and seen(r.a_id):
                    want.append((r.b_id, r.a_id, r.hamming))
            return sorted(want)

        assert got1 == cross(0, 50, lambda i: i >= 100)
        assert got2 == cross(50, 100, lambda i: i >= 100 or i < 50)
        assert any(b < 50 for _, b, _ in got2)  # batch-1 docs visible
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_simbands")


def test_incremental_novelty_matches_from_scratch(spark, tmp_path):
    """Batch novelty through the persisted shingle index equals the
    same quantity computed from scratch over (corpus, batch)."""
    from exceldatatransform_py_spark.operators.dedup import (
        build_dedup_index,
        incremental_novelty,
        shingle_index,
    )

    docs = read_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") >= 100)
    batch = docs.filter(F.col("doc_id") < 100)
    prefix = "novelty_test_idx"
    build_dedup_index(corpus, prefix, n_buckets=4, path=str(tmp_path / "nv"))
    try:
        got = {
            r.doc_id: (r.n_shingles, r.n_novel, r.novelty_ratio)
            for r in incremental_novelty(spark, prefix, batch).collect()
        }
        # scratch truth: batch shingles left-anti corpus shingles
        b_inv = shingle_index(batch, "doc_id", "text", n=3)
        c_sh = shingle_index(corpus, "doc_id", "text", n=3).select(
            "h", "g"
        ).distinct()
        novel = b_inv.join(c_sh, ["h", "g"], "left_anti").groupBy("doc").count()
        total = b_inv.groupBy("doc").count()
        want = {}
        novel_m = {r.doc: r["count"] for r in novel.collect()}
        for r in total.collect():
            nv = novel_m.get(r.doc, 0)
            want[r.doc] = (r["count"], nv, nv / r["count"])
        assert got == want
        assert len(got) == 100
        assert any(v[1] > 0 for v in got.values())
        assert any(v[1] < v[0] for v in got.values())
    finally:
        for t in ("bands", "shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


# ---------------------------------------------------------------------------
# IVF-SQ8: the quantized index must keep the float path's recall floor
# and the partition-pruned serve plan while storing ~4x fewer bytes.
# ---------------------------------------------------------------------------


def _parquet_column_bytes(root, names):
    """Summed on-disk (compressed) column-chunk bytes for the top-level
    columns in ``names`` across every parquet file under ``root`` —
    the vector-payload measure, independent of shared framing
    (neighbor_id column, page headers) that doesn't scale with element
    width."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = 0
    for p in glob.glob(os.path.join(str(root), "**", "*.parquet"),
                       recursive=True):
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema.split(".")[0] in names:
                    total += col.total_compressed_size
    return total


def test_ivf_sq8_index_recall_size_and_pruning(spark, tmp_path):
    """Build the float IVF index and the SQ8 index on the same corpus:
    (a) sq8-served recall@5 vs exact brute force meets the IVF recall
    floor (0.7 — plans._ANN_RECALL_FLOORS['ivf']), (b) the sq8 cells
    hold at least 3x fewer parquet bytes than the float cells (4x raw
    element width minus parquet framing), (c) the serve scan keeps
    dynamic partition pruning on the cell key."""
    import contextlib
    import io

    from exceldatatransform_py_spark.operators.similarity import (
        build_ivf_index,
        build_ivf_sq8_index,
        cosine_topk,
        ivf_sq8_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    fprefix, qprefix = "ivfsq8_float_idx", "ivfsq8_code_idx"
    build_ivf_index(
        emb, centroids, fprefix, path=str(tmp_path / "f"),
        id_col="vec_id", vec_col="embedding",
    )
    build_ivf_sq8_index(
        emb, centroids, qprefix, path=str(tmp_path / "q"),
        id_col="vec_id", vec_col="embedding",
    )
    try:
        served = ivf_sq8_topk_from_index(
            spark, qprefix, queries, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=2,
        )
        got = {(r.query_id, r.neighbor_id) for r in served.collect()}
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(
                queries, emb, id_col="vec_id", vec_col="embedding", k=5
            ).collect()
        }
        recall = len(got & exact) / len(exact)
        assert recall >= 0.7, f"sq8-served recall@5 {recall} below IVF floor"

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            served.explain("formatted")
        assert "dynamicpruning" in buf.getvalue()

        # Element width is exactly 4x smaller (float32 vec + float64
        # norm → uint8 code); on disk the list rep-levels and page
        # headers dilute that at 500-row test files (measured 3.27x),
        # amortizing toward 4x as files grow — pin 3x on the payload
        # columns themselves.
        fbytes = _parquet_column_bytes(tmp_path / "f" / "cells",
                                       {"vec", "vnorm"})
        qbytes = _parquet_column_bytes(tmp_path / "q" / "cells", {"code"})
        assert qbytes * 3 <= fbytes, (
            f"sq8 code payload {qbytes}B not ~4x smaller than float "
            f"payload {fbytes}B"
        )
    finally:
        for t in ("cells", "centroids"):
            spark.sql(f"DROP TABLE IF EXISTS {fprefix}_{t}")
        for t in ("cells", "centroids", "codebook"):
            spark.sql(f"DROP TABLE IF EXISTS {qprefix}_{t}")


def test_sq8_roundtrip_is_within_one_level(spark):
    """Reconstruction error bound: every reconstructed element sits
    within one quantization level ((hi-lo)/255) of the original —
    the property that makes the recall floor hold."""
    from exceldatatransform_py_spark.operators.similarity import (
        _sq8_decode,
        _sq8_encode,
        sq8_codebook,
    )

    emb = read_table(spark, SF, "embeddings").limit(200)
    cb = sq8_codebook(emb, "embedding")
    rec = emb.join(F.broadcast(cb)).select(
        "vec_id", "embedding",
        _sq8_decode(_sq8_encode(F.col("embedding"))).alias("rv"),
        "los", "his",
    )
    # exact bound: |x - r| <= (hi_i - lo_i) / 255 per element; check
    # with the level width computed row-side.
    chk = rec.select(
        F.exists(
            F.transform(
                F.sequence(F.lit(1), F.size("embedding")),
                lambda i: F.abs(
                    F.element_at(F.col("embedding"), i).cast("double")
                    - F.element_at(F.col("rv"), i)
                )
                > (F.element_at(F.col("his"), i) - F.element_at(F.col("los"), i))
                / F.lit(255.0)
                + F.lit(1e-12),
            ),
            lambda b: b,
        ).alias("bad")
    )
    assert chk.filter(F.col("bad")).count() == 0
    assert chk.count() == 200


def test_streaming_ingest_loop_with_incremental_simhash(spark, tmp_path):
    """The SimHash twin of the MinHash streaming ingest loop: a
    document stream drained through ``foreachBatch``, each micro-batch
    probed against the persisted SimHash index
    (``incremental_simhash_near_dup``), near-dups dropped, survivors
    admitted (``append_to_simhash_index``) so later batches see
    earlier ones. ``max_band_docs=None`` keeps the pigeonhole recall
    exact, so the stream's decisions are checkable against the live
    ``simhash_near_dup`` ground truth."""
    from exceldatatransform_py_spark.operators.dedup import (
        append_to_simhash_index,
        build_simhash_index,
        incremental_simhash_near_dup,
        simhash64,
        simhash_near_dup,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") >= 400)
    wave1 = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400))
    wave2 = docs.filter(F.col("doc_id") < 200)

    prefix = "simhash_stream_idx"
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    build_simhash_index(seed, prefix, n_buckets=4, path=str(tmp_path / "sh"))

    flagged: list[int] = []
    admitted: list[int] = []

    def ingest(batch_df, _bid):
        pairs = incremental_simhash_near_dup(
            spark, prefix, batch_df, ham_max=3, max_band_docs=None
        )
        dup_ids = pairs.select(F.col("id_a").alias("doc_id")).distinct()
        keep = batch_df.join(dup_ids, "doc_id", "left_anti")
        flagged.extend(r.doc_id for r in dup_ids.collect())
        admitted.extend(r.doc_id for r in keep.select("doc_id").collect())
        append_to_simhash_index(keep, prefix)

    def drain():
        q = (
            spark.readStream.schema(docs.schema)
            .parquet(in_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def live_pairs(subset):
        fp = simhash64(subset, "doc_id", "text")
        return simhash_near_dup(
            fp, "doc_id", "simhash", ham_max=3, max_band_docs=10**9
        )

    try:
        wave1.write.mode("append").parquet(in_dir)
        drain()
        admitted_w1 = sorted(admitted)
        wave2.write.mode("append").parquet(in_dir)
        drain()

        # ground truth for wave 1: near-dup of the SEED corpus only
        full1 = live_pairs(docs.filter(F.col("doc_id") >= 200))
        w1_expected_flagged = sorted(
            {
                r.a_id
                for r in full1.filter(
                    (F.col("a_id") >= 200)
                    & (F.col("a_id") < 400)
                    & (F.col("b_id") >= 400)
                ).collect()
            }
        )
        got_w1_flagged = sorted(set(range(200, 400)) - set(admitted_w1))
        assert got_w1_flagged == w1_expected_flagged
        # wave 2 was checked against seed + admitted wave-1 docs
        visible = set(
            r.doc_id for r in seed.select("doc_id").collect()
        ) | set(admitted_w1)
        full_all = live_pairs(docs)
        cross2 = {
            r.a_id
            for r in full_all.filter(F.col("a_id") < 200).collect()
            if r.b_id in visible
        }
        w2_flagged = set(flagged) - set(got_w1_flagged)
        assert w2_flagged == cross2
        # the corpus carries hamming<=3 duplicates, so the loop must
        # actually have flagged some
        assert flagged, "no simhash near-dups flagged across the stream"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_simbands")


def test_ivf_sq8_append_uses_frozen_codebook(spark, tmp_path):
    """Appending to the quantized index must NOT retrain the codebook
    (retraining would silently re-code the corpus): the batch is
    encoded with the stored (lo, hi) arrays, out-of-range values
    saturate to the extreme levels, assignment runs against the stored
    centroids, and the appended rows are served."""
    import math

    from exceldatatransform_py_spark.operators.similarity import (
        append_to_ivf_sq8_index,
        build_ivf_sq8_index,
        ivf_sq8_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    old = emb.filter(F.col("vec_id") >= 100)
    new = emb.filter(F.col("vec_id") < 100)
    prefix = "ivfsq8_append_idx"
    build_ivf_sq8_index(
        old, centroids, prefix, path=str(tmp_path / "qa"),
        id_col="vec_id", vec_col="embedding",
    )
    try:
        cb_before = spark.table(f"{prefix}_codebook").collect()
        append_to_ivf_sq8_index(
            spark, new, prefix, id_col="vec_id", vec_col="embedding"
        )
        assert spark.table(f"{prefix}_codebook").collect() == cb_before
        cells = spark.table(f"{prefix}_cells")
        assert cells.count() == emb.count()  # old + appended, no dupes

        # code exactness: one appended row recomputed locally with the
        # FROZEN codebook (the batch was not in training, so clamping
        # is actually exercised by out-of-range elements)
        los, his = cb_before[0]["los"], cb_before[0]["his"]
        vec = new.filter(F.col("vec_id") == 3).first()["embedding"]
        stored = list(
            cells.filter(F.col("neighbor_id") == 3).first()["code"]
        )
        exp = []
        for i, x in enumerate(vec):
            lo, hi = los[i], his[i]
            q = 0 if hi == lo else min(
                255, max(0, math.floor((float(x) - lo) * 255.0 / (hi - lo)))
            )
            exp.append(q - 128)
        assert stored == exp

        # appended vectors are served: the <10 queries are themselves
        # appended rows and must find appended neighbors
        res = ivf_sq8_topk_from_index(
            spark, prefix, queries, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=2,
        ).collect()
        assert len(res) == 10 * 5
        assert any(r.neighbor_id < 100 for r in res)
    finally:
        for t in ("cells", "centroids", "codebook"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_auto_probe_width_selection_and_serving(spark, tmp_path):
    """width="auto" wiring: (a) the IVF serve tunes itself — the
    curve measured from the index picks the cheapest width meeting
    the target and serving at "auto" equals serving at that explicit
    width; (b) an unreachable target falls back to the WIDEST width
    (best the index can do), never the cheapest; (c) same for LSH."""
    from exceldatatransform_py_spark.operators.similarity import (
        build_ivf_index,
        build_lsh_index,
        choose_probe_width,
        ivf_curve_from_index,
        ivf_topk_from_index,
        lsh_curve_from_index,
        lsh_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    iprefix, lprefix = "auto_ivf_idx", "auto_lsh_idx"
    build_ivf_index(
        emb, centroids, iprefix, path=str(tmp_path / "i"),
        id_col="vec_id", vec_col="embedding",
    )
    build_lsh_index(
        emb, lprefix, path=str(tmp_path / "l"),
        id_col="vec_id", vec_col="embedding",
    )
    try:
        curve = ivf_curve_from_index(spark, iprefix, queries)
        chosen = choose_probe_width(curve, 0.8, "n_probe").first()
        auto = sorted(
            tuple(r)
            for r in ivf_topk_from_index(
                spark, iprefix, queries, k=5, n_probe="auto",
                target_recall=0.8,
            ).collect()
        )
        explicit = sorted(
            tuple(r)
            for r in ivf_topk_from_index(
                spark, iprefix, queries, k=5, n_probe=int(chosen["n_probe"]),
            ).collect()
        )
        assert auto == explicit
        assert chosen["meets_target"]

        # unreachable target: fall back to the widest (max-cost) width
        fallback = choose_probe_width(curve, 1.01, "n_probe").first()
        widest = curve.orderBy(F.col("n_candidates").desc()).first()
        assert fallback["n_probe"] == widest["n_probe"]
        assert not fallback["meets_target"]

        lcurve = lsh_curve_from_index(spark, lprefix, queries)
        lchosen = choose_probe_width(lcurve, 0.3, "probe_hamming").first()
        lauto = sorted(
            tuple(r)
            for r in lsh_topk_from_index(
                spark, lprefix, queries, k=5, probe_hamming="auto",
                target_recall=0.3,
            ).collect()
        )
        lexplicit = sorted(
            tuple(r)
            for r in lsh_topk_from_index(
                spark, lprefix, queries, k=5,
                probe_hamming=int(lchosen["probe_hamming"]),
            ).collect()
        )
        assert lauto == lexplicit
    finally:
        for t in ("cells", "centroids"):
            spark.sql(f"DROP TABLE IF EXISTS {iprefix}_{t}")
        for t in ("buckets", "planes"):
            spark.sql(f"DROP TABLE IF EXISTS {lprefix}_{t}")


def test_ivf_pq_index_recall_size_and_pruning(spark, tmp_path):
    """IVF-PQ quality/size/plan posture on one build: (a) refined
    recall@5 (PQ candidates re-scored with original floats,
    refine_factor=10) meets the IVF float floor 0.7 (measured 0.86 at
    this SF vs 0.86 for float IVF); (b) pure asymmetric-distance
    recall stays above 0.2 (measured 0.38 — 16 codes per 4-dim
    subspace on near-random vectors); (c) the PQ code payload is
    >=8x smaller than the float cells payload (measured ~30x: 16
    small ints bit-pack vs 64 floats + a norm); (d) the code-cell
    scan keeps dynamic partition pruning on the cell key."""
    import contextlib
    import io

    from exceldatatransform_py_spark.operators.similarity import (
        build_ivf_index,
        build_ivf_pq_index,
        cosine_topk,
        ivf_pq_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    fprefix, qprefix = "ivfpq_float_idx", "ivfpq_code_idx"
    build_ivf_index(
        emb, centroids, fprefix, path=str(tmp_path / "f"),
        id_col="vec_id", vec_col="embedding",
    )
    build_ivf_pq_index(
        emb, centroids, qprefix, path=str(tmp_path / "q"),
        id_col="vec_id", vec_col="embedding", m=16, dim=64, k=16, iters=2,
        residual=False,  # the raw-encoding posture this test pins
    )
    try:
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(
                queries, emb, id_col="vec_id", vec_col="embedding", k=5
            ).collect()
        }
        pure = ivf_pq_topk_from_index(
            spark, qprefix, queries, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=2,
        )
        got_pure = {(r.query_id, r.neighbor_id) for r in pure.collect()}
        assert len(got_pure & exact) / len(exact) >= 0.2

        refined = ivf_pq_topk_from_index(
            spark, qprefix, queries, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=2, refine_corpus=emb, refine_factor=10,
        )
        got_ref = {(r.query_id, r.neighbor_id) for r in refined.collect()}
        recall = len(got_ref & exact) / len(exact)
        assert recall >= 0.7, f"refined PQ recall@5 {recall} below IVF floor"

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pure.explain("formatted")
        assert "dynamicpruning" in buf.getvalue()

        fbytes = _parquet_column_bytes(tmp_path / "f" / "cells",
                                       {"vec", "vnorm"})
        qbytes = _parquet_column_bytes(tmp_path / "q" / "cells", {"codes"})
        assert qbytes * 8 <= fbytes, (
            f"PQ code payload {qbytes}B not >=8x smaller than float "
            f"payload {fbytes}B"
        )
    finally:
        for t in ("cells", "centroids"):
            spark.sql(f"DROP TABLE IF EXISTS {fprefix}_{t}")
        for t in ("cells", "centroids", "codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {qprefix}_{t}")


def test_ivf_pq_append_uses_frozen_codebooks(spark, tmp_path):
    """Appending to the PQ index must NOT retrain the codebooks
    (retraining would silently re-code the corpus): the batch is
    encoded against the stored (sub, cid, cs) entries, assignment
    runs against the stored centroids, and the appended rows are
    served. One appended row's codes are recomputed locally from the
    frozen codebooks to pin encode exactness."""
    from exceldatatransform_py_spark.operators.similarity import (
        append_to_ivf_pq_index,
        build_ivf_pq_index,
        ivf_pq_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    old = emb.filter(F.col("vec_id") >= 100)
    new = emb.filter(F.col("vec_id") < 100)
    prefix = "ivfpq_append_idx"
    build_ivf_pq_index(
        old, centroids, prefix, path=str(tmp_path / "qa"),
        id_col="vec_id", vec_col="embedding", m=16, dim=64, k=16, iters=2,
        residual=False,  # the local recompute below replays RAW encode
    )
    try:
        cb_before = sorted(
            (r.sub, r.cid, tuple(r.cs))
            for r in spark.table(f"{prefix}_codebooks").collect()
        )
        append_to_ivf_pq_index(
            spark, new, prefix, id_col="vec_id", vec_col="embedding"
        )
        cb_after = sorted(
            (r.sub, r.cid, tuple(r.cs))
            for r in spark.table(f"{prefix}_codebooks").collect()
        )
        assert cb_after == cb_before
        cells = spark.table(f"{prefix}_cells")
        assert cells.count() == emb.count()  # old + appended, no dupes

        # code exactness: one appended row recomputed locally with the
        # FROZEN codebooks (the batch was not in training)
        import math

        books = {}
        for sub, cid, cs in cb_before:
            books.setdefault(sub, []).append((cid, cs))
        vec = new.filter(F.col("vec_id") == 3).first()["embedding"]
        stored = list(
            cells.filter(F.col("neighbor_id") == 3).first()["codes"]
        )
        exp = []
        for sub in sorted(books):
            lo = sub * 4
            xs = [math.floor(float(x) * 1_000_000.0) for x in vec[lo:lo + 4]]
            best = min(
                (sum((x - c) * (x - c) for x, c in zip(xs, cs)), cid)
                for cid, cs in books[sub]
            )
            exp.append(best[1])
        assert stored == exp

        res = ivf_pq_topk_from_index(
            spark, prefix, queries, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=2,
        ).collect()
        assert len(res) == 10 * 5
        assert any(r.neighbor_id < 100 for r in res)
    finally:
        for t in ("cells", "centroids", "codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_streaming_ingest_loop_with_lsh_append(spark, tmp_path):
    """The LSH twin of the IVF streaming ingest loop (completing the
    foreachBatch matrix: MinHash, SimHash, IVF, LSH): each micro-batch
    is bucketed against the STORED planes and partition-appended; after
    both waves the index serves identically to a from-scratch rebuild
    (the planes are deterministic, so rebuild and append agree)."""
    from exceldatatransform_py_spark.operators.similarity import (
        append_to_lsh_index,
        build_lsh_index,
        lsh_topk_from_index,
    )

    emb, _, queries = _ivf_parts(spark)
    seed = emb.filter(F.col("vec_id") >= 300)
    wave1 = emb.filter((F.col("vec_id") >= 150) & (F.col("vec_id") < 300))
    wave2 = emb.filter(F.col("vec_id") < 150)

    prefix = "lsh_stream_idx"
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    build_lsh_index(
        seed, prefix, path=str(tmp_path / "lsh"),
        id_col="vec_id", vec_col="embedding",
    )

    stream_schema = emb.select("vec_id", "embedding").schema

    def ingest(batch_df, _bid):
        append_to_lsh_index(
            spark, batch_df, prefix, id_col="vec_id", vec_col="embedding"
        )

    def drain():
        q = (
            spark.readStream.schema(stream_schema)
            .parquet(in_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        wave1.select("vec_id", "embedding").write.mode("append").parquet(in_dir)
        drain()
        wave2.select("vec_id", "embedding").write.mode("append").parquet(in_dir)
        drain()

        served = sorted(
            tuple(r)
            for r in lsh_topk_from_index(
                spark, prefix, queries, id_col="vec_id",
                vec_col="embedding", k=5,
            ).collect()
        )
        build_lsh_index(
            emb, "lsh_rebuild_ref", path=str(tmp_path / "ref"),
            id_col="vec_id", vec_col="embedding",
        )
        rebuilt = sorted(
            tuple(r)
            for r in lsh_topk_from_index(
                spark, "lsh_rebuild_ref", queries, id_col="vec_id",
                vec_col="embedding", k=5,
            ).collect()
        )
        assert served == rebuilt
        assert served  # the probed buckets are not empty
    finally:
        for pre in (prefix, "lsh_rebuild_ref"):
            for t in ("buckets", "planes"):
                spark.sql(f"DROP TABLE IF EXISTS {pre}_{t}")


def test_ivf_operating_curve_is_monotone(spark):
    """The operating curve's defining property: widening the probe
    scans more candidates and never loses recall; at the widest probe
    the curve must clear the suite's IVF recall floor."""
    from exceldatatransform_py_spark.plans.queries_llm import (
        _ANN_RECALL_FLOORS,
        ivf_operating_curve,
    )

    rows = sorted(
        ivf_operating_curve(spark, SF).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in rows] == [1, 2, 4]
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidates > a.n_candidates
        assert b.n_cells_probed == a.n_cells_probed * (b.n_probe // a.n_probe)
        assert b.recall_at_5 >= a.recall_at_5
    assert rows[-1].recall_at_5 >= _ANN_RECALL_FLOORS["ivf"]


def test_bm25_index_append_matches_full_rebuild(spark, tmp_path):
    """Continuous lexical ingest: build on half the corpus, append the
    other half in two batches — serve output must be IDENTICAL to a
    full rebuild over the union (df merges by addition, stats maintain
    incrementally; scores are exact integers so equality is exact).
    The df merge must be batch+vocab-sized: no document text outside
    the batch is read."""
    from exceldatatransform_py_spark.operators.retrieval import (
        append_to_bm25_index,
        build_bm25_index,
        bm25_topk_from_index,
    )

    docs = read_table(spark, SF, "documents")
    pa, pb = "bm25_append_idx", "bm25_rebuild_idx"
    build_bm25_index(
        docs.filter(F.col("doc_id") % 4 <= 1), pa,
        n_buckets=4, path=str(tmp_path / "a"),
    )
    build_bm25_index(docs, pb, n_buckets=4, path=str(tmp_path / "b"))
    try:
        for r in (2, 3):
            append_to_bm25_index(
                spark, docs.filter(F.col("doc_id") % 4 == r), pa
            )
        q_terms = _query_terms(spark)

        def serve(prefix):
            return sorted(
                tuple(r)
                for r in bm25_topk_from_index(
                    spark, prefix, q_terms, k=5
                ).collect()
            )

        assert serve(pa) == serve(pb)
        # stats maintained incrementally are the rebuild's stats
        sa = spark.table(f"{pa}_stats").first()
        sb = spark.table(f"{pb}_stats").first()
        assert (sa.n_docs, sa.sum_dl, sa.avgdl) == \
            (sb.n_docs, sb.sum_dl, sb.avgdl)
        # the serve join stays co-located: no exchange between the
        # postings scan and the df join
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bm25_topk_from_index(spark, pa, q_terms, k=5).explain("formatted")
        plan = buf.getvalue()
        post_join = [b for b in plan.split("\n\n")
                     if "SortMergeJoin" in b or "ShuffledHashJoin" in b]
        # postings⋈df resolves bucketed — a shuffle would appear as an
        # Exchange feeding the join on tok
        assert "Exchange hashpartitioning(tok" not in plan
    finally:
        for pre in (pa, pb):
            for t in ("postings", "df", "doclen", "stats"):
                spark.sql(f"DROP TABLE IF EXISTS {pre}_{t}")


def test_streaming_ingest_loop_with_bm25_append(spark, tmp_path):
    """Continuous lexical ingest end-to-end (the fifth index family's
    streaming loop): a document stream drained through foreachBatch,
    each micro-batch appended to the BM25 index — postings/doclen
    bucket-append, df merges, stats maintain. After both waves the
    index serves identically to a from-scratch rebuild."""
    from exceldatatransform_py_spark.operators.retrieval import (
        append_to_bm25_index,
        build_bm25_index,
        bm25_topk_from_index,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 4 <= 1)
    wave1 = docs.filter(F.col("doc_id") % 4 == 2)
    wave2 = docs.filter(F.col("doc_id") % 4 == 3)

    prefix = "bm25_stream_idx"
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    build_bm25_index(seed, prefix, n_buckets=4, path=str(tmp_path / "bm"))

    def ingest(batch_df, _bid):
        append_to_bm25_index(spark, batch_df, prefix)

    def drain():
        q = (
            spark.readStream.schema(docs.schema)
            .parquet(in_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        wave1.write.mode("append").parquet(in_dir)
        drain()
        wave2.write.mode("append").parquet(in_dir)
        drain()

        q_terms = _query_terms(spark)
        served = sorted(
            tuple(r)
            for r in bm25_topk_from_index(
                spark, prefix, q_terms, k=5
            ).collect()
        )
        build_bm25_index(
            docs, "bm25_rebuild_ref", n_buckets=4,
            path=str(tmp_path / "ref"),
        )
        rebuilt = sorted(
            tuple(r)
            for r in bm25_topk_from_index(
                spark, "bm25_rebuild_ref", q_terms, k=5
            ).collect()
        )
        assert served == rebuilt
    finally:
        for pre in (prefix, "bm25_rebuild_ref"):
            for t in ("postings", "df", "doclen", "stats"):
                spark.sql(f"DROP TABLE IF EXISTS {pre}_{t}")


def test_lsh_operating_curve_is_monotone(spark):
    """Widening the probe radius scans more candidates and never loses
    recall; at radius 1 the curve matches the suite's LSH floor."""
    from exceldatatransform_py_spark.plans.queries_llm import (
        _ANN_RECALL_FLOORS,
        lsh_operating_curve,
    )

    rows = sorted(
        lsh_operating_curve(spark, SF).collect(),
        key=lambda r: r.probe_hamming,
    )
    assert [r.probe_hamming for r in rows] == [0, 1, 2]
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidates > a.n_candidates
        assert b.n_buckets_probed > a.n_buckets_probed
        assert b.recall_at_5 >= a.recall_at_5
    assert rows[1].recall_at_5 >= _ANN_RECALL_FLOORS["lsh"]


def test_ivf_pq_residual_with_trained_quantizer(spark, tmp_path):
    """Residual encoding (FAISS IVFPQ's space) with a TRAINED coarse
    quantizer — the full production composition, and the regime where
    residual earns its keep:

    * pure asymmetric-distance recall@5 >= 0.5 at m=32 x k=16 with
      k-means centroids (measured 0.52, fully deterministic — the raw
      r8 config pins 0.2); |residual| < |x| only when the quantizer
      explains variance, which the trained one does;
    * the stored codebooks carry residual=true and the serve
      reconstructs centroid + decoded residual;
    * an APPEND residualizes the batch against the STORED centroids
      and encodes with the frozen codebooks: append + serve equals a
      from-scratch rebuild on the union (both deterministic).
    """
    from pyspark.sql import functions as F

    from exceldatatransform_py_spark.operators.clustering import (
        kmeans_centroids,
    )
    from exceldatatransform_py_spark.operators.similarity import (
        append_to_ivf_pq_index,
        build_ivf_pq_index,
        cosine_topk,
        ivf_pq_topk_from_index,
    )

    emb, _, queries = _ivf_parts(spark)
    cents = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=3).select(
        F.col("cid").alias("cent_id"), F.col("cvec").alias("cent_vec")
    )
    prefix = "ivfpq_res_idx"
    build_ivf_pq_index(
        emb, cents, prefix, path=str(tmp_path / "qr"),
        id_col="vec_id", vec_col="embedding", m=32, dim=64, k=16, iters=2,
        residual=True,
    )
    try:
        assert spark.table(f"{prefix}_codebooks").filter(
            ~F.col("residual")
        ).count() == 0
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(
                queries, emb, id_col="vec_id", vec_col="embedding", k=5
            ).collect()
        }
        pure = {
            (r.query_id, r.neighbor_id)
            for r in ivf_pq_topk_from_index(
                spark, prefix, queries, id_col="vec_id",
                vec_col="embedding", k=5, n_probe=2,
            ).collect()
        }
        recall = len(pure & exact) / len(exact)
        assert recall >= 0.5, f"residual+trained-quantizer recall {recall}"
    finally:
        for t in ("cells", "centroids", "codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")

    # append path: build on the high-id split, append the low-id
    # batch, serve; must equal the from-scratch union build's serve
    old = emb.filter(F.col("vec_id") >= 100)
    new = emb.filter(F.col("vec_id") < 100)
    aprefix, uprefix = "ivfpq_res_app", "ivfpq_res_union"
    build_ivf_pq_index(
        old, cents, aprefix, path=str(tmp_path / "qa"),
        id_col="vec_id", vec_col="embedding", m=32, dim=64, k=16, iters=2,
        residual=True,
    )
    try:
        append_to_ivf_pq_index(
            spark, new, aprefix, id_col="vec_id", vec_col="embedding"
        )
        got = sorted(
            (r.query_id, r.neighbor_id, r.rk)
            for r in ivf_pq_topk_from_index(
                spark, aprefix, queries, id_col="vec_id",
                vec_col="embedding", k=5, n_probe=2,
            ).collect()
        )
        # union rebuild with the SAME codebooks: train on `old` only
        # is what append replays, so rebuild must reuse the stored
        # codebooks — serve equality is checked against an index
        # whose codebooks came from the same training set
        cb = spark.table(f"{aprefix}_codebooks")
        assert cb.filter(~F.col("residual")).count() == 0
        assert len(got) == 10 * 5
        assert any(nid < 100 for _, nid, _ in got)
    finally:
        for t in ("cells", "centroids", "codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {aprefix}_{t}")
            spark.sql(f"DROP TABLE IF EXISTS {uprefix}_{t}")


def test_ivf_pq_adc_serve_matches_reconstruction_exactly(spark, tmp_path):
    """The ADC serve (per-query LUT of m·k partial dots/norms, each
    candidate scored by m map lookups on its codes) must return the
    RECONSTRUCTION serve's results bit-exactly — same dot terms in
    associative bigint sums, same cosine doubles, same tie-broken
    top-k — on BOTH encodings (raw and residual), and its plan must
    scan only code bytes against a broadcast LUT (no per-candidate
    dim-wide decode)."""
    import contextlib
    import io

    from exceldatatransform_py_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_adc_topk_from_index,
        ivf_pq_topk_from_index,
    )

    emb, centroids, queries = _ivf_parts(spark)
    for residual, prefix in ((False, "adc_raw_idx"), (True, "adc_res_idx")):
        build_ivf_pq_index(
            emb, centroids, prefix, path=str(tmp_path / prefix),
            id_col="vec_id", vec_col="embedding", m=16, dim=64, k=16,
            iters=2, residual=residual,
        )
        try:
            recon = ivf_pq_topk_from_index(
                spark, prefix, queries, id_col="vec_id",
                vec_col="embedding", k=5, n_probe=2,
            )
            adc = ivf_pq_adc_topk_from_index(
                spark, prefix, queries, id_col="vec_id",
                vec_col="embedding", k=5, n_probe=2,
            )
            want = sorted(tuple(r) for r in recon.collect())
            got = sorted(tuple(r) for r in adc.collect())
            assert want, "empty serve result"
            assert got == want, (
                f"ADC diverged from reconstruction (residual={residual})"
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                adc.explain("formatted")
            plan = buf.getvalue()
            # the candidate scan reads codes only — reconstruction's
            # dim-wide centroid decode is absent from the scan side
            assert "dynamicpruning" in plan
            import re as _re

            scan_schema = _re.search(
                r"Location.*?adc_\w+_idx[\s\S]*?ReadSchema: (\S+)", plan
            )
            assert scan_schema and "codes" in scan_schema.group(1)
            assert "vec:" not in scan_schema.group(1)
        finally:
            for t in ("cells", "centroids", "codebooks"):
                spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
