"""Deduplication operators over document corpora (north-star mandate).

The reference has no dedup (SURVEY.md §0); these are the
training-data-pipeline operators a 100 TB corpus needs. Design rules:

* Exact dedup groups on a 128-bit digest of normalized text, never on
  the text itself — the shuffle then moves 32-byte keys instead of
  document bodies.
* Near-dup candidate generation never goes O(n²): both the n-gram
  Jaccard and the MinHash-LSH paths build an inverted index (explode →
  self-join on a short key) so only colliding pairs meet, and both
  drop "stop shingles"/over-hot buckets to bound skew.
* All hashing is md5-derived (``functions.text.md5_hash32``) so every
  stage has a bit-identical DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exceldatatransform_py_spark.sources.maintenance import (
    minus_tombstones as _minus_tombstones,
)

from exceldatatransform_py_spark.functions.text import (
    hashed_shingles,
    md5_hash32,
    normalize_text,
    token_hashes,
    ws_tokens,
)


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, keep: str = "min"
) -> DataFrame:
    """Collapse exact duplicates (after whitespace/case normalization).

    Returns one row per distinct normalized text:
    ``(id_col = <keep> id of the group, n_copies)``. Groups on
    ``md5(normalized)`` so the shuffle key is 32 bytes regardless of
    document size; md5 collisions are negligible below ~2^64 docs.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("__digest"))
        .groupBy("__digest")
        .agg(agg.alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_docs: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted index.

    Plan shape: tokenize → distinct *hashed* n-gram shingles (two
    polynomial folds over per-token md5 hashes — no shingle strings
    ever materialize) → explode → self-join on the 98-bit ``(h, g)``
    pair (only docs sharing a shingle ever meet — the classic
    inverted-index join, not a cross join) → count common shingles per
    pair → Jaccard = |∩| / (|A|+|B|-|∩|) ≥ threshold. Output:
    ``(id_a, id_b, jaccard)`` with ``id_a < id_b``.

    ``max_shingle_docs`` drops shingles that occur in more than that
    many documents before the self-join — the skew guard at scale
    (boilerplate shingles otherwise create quadratic hot keys). Left
    None, nothing is dropped and the result is exact over the hashed
    shingle sets (Broder-style hashed shingling; (h, g) collisions are
    negligible below ~2^49 distinct shingles).

    Jaccard determinism: integer counts divided as doubles with a fixed
    expression shape — bit-identical to the DuckDB twin.
    """
    inv = shingle_index(df, id_col, text_col, n=n)

    if max_shingle_docs is not None:
        hot = (
            inv.groupBy("h", "g")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_shingle_docs)
            .select("h", "g")
        )
        inv = inv.join(F.broadcast(hot), ["h", "g"], "left_anti")

    a = inv.select(
        F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"), "h", "g"
    )
    b = inv.select(
        F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"), "h", "g"
    )
    pairs = (
        a.join(b, ["h", "g"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common").cast("double") / (
        (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_index(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """The shared inverted index all near-dup paths build on:
    one row per (doc, distinct hashed shingle) with the shingle's two
    independent polynomial-fold hash values (``functions.text.
    hashed_shingles`` — md5 per token, BIGINT folds per window; no
    shingle strings are ever built or shuffled).

    Output: ``(doc, n_sh, h bigint, g bigint)``, **persisted**
    (memory-and-disk): signatures, banding, and exact verification all
    reuse it, and Spark's exchange reuse does not dedupe self-join
    subtrees reliably — without the persist every branch re-runs the
    tokenize→hash→explode pipeline (measured 145s → ~17s on the sf0.1
    MinHash query back when shingles were md5 strings; the hashed
    index is another ~2x on top). k-wise MinHash families derive
    from (h, g) arithmetically (Kirsch-Mitzenmacher double hashing).

    The per-token hash arrays are persisted BEFORE the window folds:
    the fold lambdas re-evaluate captured outer expressions per
    element, so they must read the arrays as materialized attributes
    (see ``hashed_shingles``'s eval-once contract — inlining the
    token-hash transform into the fold is a 10-50x blowup).

    An exploded reformulation (posexplode + codegen'd per-token md5 +
    lead-window folds + groupBy distinct) was tried and REVERTED: its
    isolated build is ~1.5x faster, but persisting a window-terminated
    shuffle plan made every cache consumer (banding self-join, exact
    verification, signature aggregates) 4-15x slower end-to-end in
    fresh-JVM benchmarks. Keep the map-side HOF pipeline; it persists
    cheap and scans cheap.
    """
    toks = ws_tokens(text_col)
    staged = df.select(
        F.col(id_col).alias("doc"),
        token_hashes(toks, seed=0).alias("th0"),
        token_hashes(toks, seed=1).alias("th1"),
    ).persist()
    base = staged.select(
        "doc", hashed_shingles(F.col("th0"), F.col("th1"), n=n).alias("shingles")
    )
    inv = base.select(
        "doc", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("s")
    ).select("doc", "n_sh", F.col("s.h").alias("h"), F.col("s.g").alias("g"))
    return inv.persist()


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 16
) -> DataFrame:
    """Per-doc MinHash signature columns ``s0..s{k-1}``:
    ``s_i = min over shingles of (h0 + i*h1)`` — the double-hashing
    construction (Kirsch-Mitzenmacher): k hash functions derived from
    the shingle's two fold values with plain BIGINT arithmetic
    (``h0 = h % 2^32``, ``h1 = g % 2^32``, so every value < 2^36 — no
    overflow, no modulus, and the exact same expression is writable in
    any SQL dialect for the oracle).

    Output: ``(id_col, s0..s{k-1} bigint)`` — a fixed-size sketch
    (k * 8 bytes) regardless of document length; this is what ships
    through the LSH shuffle, never the text.
    """
    inv = shingle_index(df, id_col, text_col, n=n)
    return inv.groupBy(F.col("doc").alias(id_col)).agg(*_sig_aggs(k))


_H32_MOD = 4294967296  # 2^32


def _sig_aggs(k: int) -> list[Column]:
    h0 = F.col("h") % _H32_MOD
    h1 = F.col("g") % _H32_MOD
    return [F.min(h0 + F.lit(i) * h1).alias(f"s{i}") for i in range(k)]


def _band_rows(inv: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc, band, bucket) LSH banding rows from a shingle inverted
    index: MinHash signature per doc, each band's slice md5-folded to
    one bucket id. Deterministic function of document content — the
    property incremental dedup relies on (today's batch lands in the
    same buckets yesterday's corpus did)."""
    r = k // bands
    sigs = inv.groupBy("doc").agg(*_sig_aggs(k))
    return sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"s{bi * r + j}").cast("string")
                                    for j in range(r)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _verify_pairs(
    cand: DataFrame,
    inv_a: DataFrame,
    inv_b: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification driven BY the candidate set:
    cand ⋈ A-shingles on id_a, then ⋈ B-shingles on (id_b, h, g) —
    work is O(candidate pairs × shingles/doc), never a full shingle
    self-join. Inputs are shingle_index-shaped frames."""
    a = inv_a.select(
        F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"), "h", "g"
    )
    b = inv_b.select(
        F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"), "h", "g"
    )
    common = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "h", "g"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common").cast("double") / (
        (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double")
    )
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_docs: int | None = None,
) -> DataFrame:
    """Asymmetric shingle-containment pairs: C(A→B) = |A∩B| / |A|.

    Jaccard under-scores a small document embedded verbatim inside a
    much larger one (boilerplate-wrapped articles, quoted posts,
    concatenated crawls) — the overlap is all of A but a sliver of
    A∪B. Containment is the sub-document-duplication signal real
    corpus pipelines filter on (Broder's original resemblance *and
    containment* pairing).

    Candidate generation is the exact inverted-index join (same plan
    shape and skew guard as ``ngram_jaccard_pairs`` — only docs
    sharing a hashed shingle ever meet), NOT MinHash banding:
    a whole-doc MinHash signature is dominated by the large side, so
    banded LSH systematically misses exactly the asymmetric pairs
    this operator exists to find. At corpus scale the
    ``max_shingle_docs`` hot-shingle drop is the knob that keeps the
    collision join linear-ish, same as the Jaccard path.

    Output: one row per unordered pair ``(id_a < id_b)`` with BOTH
    directions — ``cont_a_in_b = common/n_a``, ``cont_b_in_a =
    common/n_b`` — kept when either direction ≥ ``threshold``.
    Integer counts, one double division per output cell (the
    repo-wide cross-engine determinism idiom).
    """
    inv = shingle_index(df, id_col, text_col, n=n)

    if max_shingle_docs is not None:
        hot = (
            inv.groupBy("h", "g")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_shingle_docs)
            .select("h", "g")
        )
        inv = inv.join(F.broadcast(hot), ["h", "g"], "left_anti")

    a = inv.select(
        F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"), "h", "g"
    )
    b = inv.select(
        F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"), "h", "g"
    )
    pairs = (
        a.join(b, ["h", "g"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    c_ab = F.col("common").cast("double") / F.col("n_a").cast("double")
    c_ba = F.col("common").cast("double") / F.col("n_b").cast("double")
    return (
        pairs.withColumn("cont_a_in_b", c_ab)
        .withColumn("cont_b_in_a", c_ba)
        .filter(
            (F.col("cont_a_in_b") >= threshold)
            | (F.col("cont_b_in_a") >= threshold)
        )
        .select("id_a", "id_b", "common", "cont_a_in_b", "cont_b_in_a")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_docs: int | None = None,
) -> DataFrame:
    """MinHash + LSH near-dup: banding generates candidates, exact
    n-gram Jaccard verifies them.

    ``k`` hashes split into ``bands`` bands of ``r = k/bands`` rows;
    docs colliding on any full band become candidates (prob. of a pair
    with Jaccard s colliding = 1-(1-s^r)^b — the standard S-curve).
    Candidates are verified with exact Jaccard on shingle digests, so
    the output has no false positives: it is the *subset* of
    ``ngram_jaccard_pairs`` whose pairs also collide in ≥1 band.

    ``max_bucket_docs`` skips over-hot LSH buckets (all-identical
    boilerplate at corpus scale would otherwise make one bucket
    quadratic); None = exact banding.

    Output: ``(id_a, id_b, jaccard)`` with ``id_a < id_b``.
    """
    if k % bands:
        raise ValueError("minhash_lsh_pairs: bands must divide k")

    inv = shingle_index(df, id_col, text_col, n=n)
    band_rows = _band_rows(inv, k, bands)

    if max_bucket_docs is not None:
        hot = (
            band_rows.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_bucket_docs)
            .select("band", "bucket")
        )
        band_rows = band_rows.join(F.broadcast(hot), ["band", "bucket"], "left_anti")

    cand = (
        band_rows.alias("x")
        .join(band_rows.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
        .distinct()
    )

    # Exact verification reuses the SAME persisted inverted index the
    # signatures came from; the join is DRIVEN BY the candidate pairs
    # (see _verify_pairs) — never the full shingle self-join (that
    # would re-do the exact-Jaccard O(all collisions) work LSH exists
    # to avoid).
    return _verify_pairs(cand, inv, inv, threshold)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    nodes: DataFrame | None = None,
    node_col: str | None = None,
) -> DataFrame:
    """Connected components of an undirected pair graph: every node's
    label converges to the minimum node id in its component. Returns
    ``(v, cluster_id)`` for every node that appears in an edge; pass
    ``nodes`` (the full vertex universe, e.g. the documents table) to
    also attach singletons — nodes absent from every edge come back
    labeled with their own id, which is exactly the left-join +
    coalesce every dedup caller was re-implementing. ``node_col``
    names the id column in ``nodes`` (defaults to ``src``).

    This is THE dedup-clustering step: near-dup *pairs* (MinHash output)
    become dedup *groups* whose canonical representative is the min id.

    Each round alternates two steps, both plain joins+aggs:

    1. **neighbor-min propagation** — for each edge (s, d), offer
       ``lbl[s]`` to d; every node takes the min of its own label and
       all offers.
    2. **pointer-doubling shortcut** — ``lbl[v] <- lbl[lbl[v]]``.
       Labels are node ids of the same component (invariant: a label
       always names a component member, and ``lbl[v] <= v``), so the
       shortcut is a self-join of the label table that halves
       label-chain length every round.

    Propagation alone needs O(component diameter) rounds — a
    chain-shaped duplicate cluster (doc A≈B≈C≈…, common in crawl data
    with drifting boilerplate) of 1000 docs would need ~1000 rounds
    and silently truncate at ``max_iter``. With the shortcut the round
    count is O(log n) on ANY graph shape (a 1000-node chain converges
    in ~10 rounds; property-tested in ``tests/test_properties.py``).
    At fixpoint labels are constant per component and equal the
    component min, so results are identical to pure propagation.

    ``localCheckpoint(eager)`` after every round truncates lineage
    (otherwise plans grow exponentially) and makes the convergence
    check one cheap count. At 100 TB: edges are hash-partitioned by
    node, every round is a bounded set of co-partitioned shuffles over
    O(E) + O(V) rows, and nothing but the changed-row count ever
    reaches the driver.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).filter(
        F.col("s") != F.col("d")
    )
    # Materialize the edge set ONCE: the caller's `edges` is typically
    # an expensive subtree (MinHash band join + Jaccard verify), and
    # every propagation round joins against it — without this barrier
    # each iteration re-runs the whole pair pipeline from the persisted
    # shingle index. The symmetric edge list is O(pairs), tiny next to
    # what produces it.
    sym = e.union(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).localCheckpoint(eager=True)
    # Size each round to the materialized edge count: near-dup edge
    # sets are tiny next to the corpus (often a few thousand rows),
    # and every propagation round is 2-3 shuffles — paying wide
    # scheduling overhead per round on a few-KB frame dominates the
    # loop's wall clock. ~100k edges per partition keeps a partition
    # comfortably in memory at any scale, with no parallelism cap: at
    # 100 TB (billions of edges) this yields tens of thousands of
    # partitions. Partitioned on `s`, the propagation join's key, so
    # the seed aggregate and every round's join reuse the exchange.
    n_edges = sym.count()
    parts = max(1, -(-n_edges // 100_000))
    sym = sym.repartition(parts, "s")
    # Seed labels with min(v, min direct neighbor) — the first
    # propagation round folded into initialization (one groupBy on the
    # already-partitioned edges instead of a join+groupBy+checkpoint
    # round). Dense near-dup clusters then typically converge in ONE
    # loop iteration plus the no-change confirmation.
    # Deliberately NOT checkpointed: the seed is one cheap groupBy
    # over the materialized edges, and only round 1 reads it (twice —
    # that double evaluation is cheaper than an eager materialization
    # job; later rounds read the checkpointed round outputs).
    labels = (
        sym.groupBy(F.col("s").alias("v"))
        .agg(F.min("d").alias("__nmin"))
        .select("v", F.least(F.col("v"), F.col("__nmin")).alias("lbl"))
    )
    for _ in range(max_iter):
        # (1) propagation — keyed on s, the edge partitioning key.
        neigh = (
            sym.join(labels, sym.s == labels.v)
            .groupBy(F.col("d").alias("pv"))
            .agg(F.min("lbl").alias("nl"))
        )
        prop = (
            labels.join(neigh, labels.v == neigh.pv, "left")
            .select(
                "v", "lbl", F.least("lbl", F.coalesce("nl", "lbl")).alias("plbl")
            )
            .localCheckpoint(eager=True)
        )
        # Convergence check BEFORE the shortcut: a propagation fixpoint
        # means labels are constant across every edge, i.e. already the
        # component minima — the hop would be the identity. Near-dup
        # graphs (mostly 2-3 node clusters) converge at the seed, so
        # the common path pays one propagation round and no shortcut
        # join; the count is a single cheap job over the checkpointed
        # frame, and loop wall-clock is job latency, not data.
        changed = prop.filter(F.col("plbl") < F.col("lbl")).count()
        labels = prop.select("v", F.col("plbl").alias("lbl"))
        if changed == 0:
            break
        # (2) shortcut — chase one label hop: plbl is a node id, so a
        # left self-join resolves lbl[lbl[v]] (a component min M has
        # lbl[M] = M, so the hop is the identity at the root).
        hop = prop.select(F.col("v").alias("hv"), F.col("plbl").alias("hlbl"))
        labels = (
            prop.join(hop, prop.plbl == hop.hv, "left")
            .select(
                "v", F.least("plbl", F.coalesce("hlbl", "plbl")).alias("lbl")
            )
            .localCheckpoint(eager=True)
        )
    out = labels.select("v", F.col("lbl").alias("cluster_id"))
    if nodes is None:
        return out
    universe = nodes.select(F.col(node_col or src).alias("v"))
    return universe.join(out, "v", "left").select(
        "v", F.coalesce("cluster_id", "v").alias("cluster_id")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash fingerprint per document.

    Each token hashes to a 32-bit value twice (seeds 0/1 → 63 usable
    bits); bit b of the fingerprint is 1 iff the count of tokens with
    bit b set exceeds half the token count (majority vote — the
    standard SimHash construction with ±1 weights). Near-dup docs
    differ in few bits (compare with ``bit_count(a XOR b)``).

    Uses 63 bits to stay in signed-BIGINT range in both engines.
    Plan shape: explode tokens → project the two 32-bit hashes ONCE →
    per-bit conditional counts in ONE hash-aggregate pass → weighted
    bit sum. No shuffle beyond the per-doc aggregate.
    """
    # Stage h0/h1 as real columns: aggregate expressions are not
    # common-subexpression-eliminated across each other, so inlining
    # md5_hash32 into the 63 bit-sums would md5 every token 63 times.
    # Repartition by doc BEFORE exploding (one shuffled row per doc,
    # not per token) so the per-doc aggregate needs no further
    # exchange — and no ENSURE_REQUIREMENTS shuffle exists for AQE to
    # coalesce into a single-task aggregate stage.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    toks = df.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col), F.explode(ws_tokens(text_col)).alias("tok")
    ).select(
        id_col,
        md5_hash32("tok", seed=0).alias("__h0"),
        md5_hash32("tok", seed=1).alias("__h1"),
    )
    h0, h1 = F.col("__h0"), F.col("__h1")
    bit_sums = [
        F.sum(
            (F.shiftright(h0 if b < 32 else h1, b if b < 32 else b - 32) % 2).cast(
                "long"
            )
        ).alias(f"b{b}")
        for b in range(63)
    ]
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"), *bit_sums
    )
    fp = None
    for b in range(63):
        bit = (F.col(f"b{b}") * 2 > F.col("n_tok")).cast("bigint") * F.lit(2**b).cast(
            "bigint"
        )
        fp = bit if fp is None else fp + bit
    return per_doc.select(F.col(id_col), fp.alias("simhash"))


# ---------------------------------------------------------------------------
# Incremental dedup: today's batch vs the already-ingested corpus.
# ---------------------------------------------------------------------------


def build_dedup_index(
    docs: DataFrame,
    table_prefix: str,
    n_buckets: int,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> None:
    """Persist the corpus's near-dup state as bucketed catalog tables:
    ``<prefix>_bands`` (doc, band, bucket) bucketed by bucket — the
    LSH candidate-probe side — and ``<prefix>_shingles``
    (doc, n_sh, h, g) bucketed by doc — the exact-verification side.

    This is the build half of PRODUCTION dedup: a 100 TB corpus is
    shingled once at ingest; each daily batch then probes these
    tables (``incremental_near_dup``) instead of re-processing the
    corpus. The banding is a deterministic function of content
    (``_band_rows``), so new documents land in exactly the buckets
    their near-duplicates occupied when they were indexed.
    """
    if k % bands:
        raise ValueError("build_dedup_index: bands must divide k")
    from exceldatatransform_py_spark.sources.bucketing import write_bucketed

    inv = shingle_index(docs, id_col, text_col, n=n)
    write_bucketed(
        _band_rows(inv, k, bands), f"{table_prefix}_bands", ["bucket"],
        n_buckets, path=f"{path}/bands",
    )
    write_bucketed(
        inv, f"{table_prefix}_shingles", ["doc"], n_buckets,
        path=f"{path}/shingles",
    )


def incremental_near_dup(
    spark: SparkSession,
    table_prefix: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_docs: int | None = None,
) -> DataFrame:
    """Near-duplicates of ``new_docs`` AGAINST the indexed corpus:
    ``(id_a=new doc, id_b=corpus doc, jaccard)``. The corpus is never
    re-shingled — candidates come from joining the new batch's band
    buckets against the persisted ``<prefix>_bands`` (bucketed on the
    join key, so only matching buckets move), and verification joins
    the persisted shingle table driven by the candidate set.

    Work scales with the BATCH (plus matched posting sizes), not the
    corpus — the property that makes continuous-ingest dedup viable
    at 100 TB. Duplicates WITHIN the new batch are a separate
    ``minhash_lsh_pairs(new_docs)`` call (standard two-step: intra-
    batch first, then batch-vs-corpus); after admission, append the
    batch's band/shingle rows to the index tables.

    ``k``/``bands``/``n`` must match the values the index was built
    with — the banding is content-deterministic only under identical
    parameters.
    """
    if k % bands:
        raise ValueError("incremental_near_dup: bands must divide k")
    new_inv = shingle_index(new_docs, id_col, text_col, n=n)
    new_bands = _band_rows(new_inv, k, bands)
    corpus_bands = _minus_tombstones(
        spark, table_prefix, spark.table(f"{table_prefix}_bands"), "doc"
    )

    if max_bucket_docs is not None:
        hot = (
            corpus_bands.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_bucket_docs)
            .select("band", "bucket")
        )
        corpus_bands = corpus_bands.join(
            F.broadcast(hot), ["band", "bucket"], "left_anti"
        )

    cand = (
        new_bands.select(
            F.col("doc").alias("id_a"), "band", "bucket"
        )
        .join(
            corpus_bands.select(
                F.col("doc").alias("id_b"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    corpus_inv = spark.table(f"{table_prefix}_shingles")
    return _verify_pairs(cand, new_inv, corpus_inv, threshold)


def append_to_dedup_index(
    docs: DataFrame,
    table_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> None:
    """Admit a batch into the index: append its band rows and shingle
    rows to the persisted tables (``insertInto`` preserves the bucket
    spec — appended rows land in the correct buckets). The standard
    ingest loop is: ``incremental_near_dup`` → drop/flag the near-dups
    → ``append_to_dedup_index(admitted)`` → next batch sees this one.
    Parameters must match the build; the banding is content-
    deterministic only under identical (n, k, bands).
    """
    if k % bands:
        raise ValueError("append_to_dedup_index: bands must divide k")
    inv = shingle_index(docs, id_col, text_col, n=n)
    (
        _band_rows(inv, k, bands)
        .write.mode("append")
        .insertInto(f"{table_prefix}_bands")
    )
    inv.write.mode("append").insertInto(f"{table_prefix}_shingles")


# ---------------------------------------------------------------------------
# SimHash near-dup pairing (banded hamming blocking).
# ---------------------------------------------------------------------------

#: (shift, width) band layout over the 63-bit fingerprint. Four bands
#: give exact recall for hamming distance <= 3 by pigeonhole: 3 bit
#: flips can dirty at most 3 of the 4 bands, so every qualifying pair
#: still agrees on at least one full band.
SIMHASH_BANDS: tuple[tuple[int, int], ...] = ((0, 16), (16, 16), (32, 16), (48, 15))


def _simhash_band_rows(fp: DataFrame, id_col: str, fp_col: str) -> DataFrame:
    """Band slices of each fingerprint: ``(id, fp, band, bv)`` — one
    row per (doc, band). The deterministic content→bucket function
    shared by the live pairing and the persisted index, so new
    documents land in exactly the buckets their near-duplicates
    occupied when indexed."""
    slices = [
        fp.select(
            F.col(id_col),
            F.col(fp_col),
            F.lit(i).alias("band"),
            F.shiftright(F.col(fp_col), shift)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bv"),
        )
        for i, (shift, width) in enumerate(SIMHASH_BANDS)
    ]
    banded = slices[0]
    for s in slices[1:]:
        banded = banded.unionByName(s)
    return banded


def simhash_near_dup(
    fp: DataFrame,
    id_col: str,
    fp_col: str = "simhash",
    ham_max: int = 3,
    max_band_docs: int = 200,
) -> DataFrame:
    """Near-duplicate pairs from SimHash fingerprints.

    Completes the SimHash dedup path (``simhash64`` builds the
    fingerprints; this extracts the pairs): slice each 63-bit
    fingerprint into ``SIMHASH_BANDS``, self-join docs that share a
    (band, value) bucket — never O(n²) — and keep pairs whose full
    hamming distance (``bit_count(a XOR b)``) is <= ``ham_max``.
    Recall is exact for ``ham_max`` <= len(bands) - 1.

    Scale: the join key is a <= 16-bit band value, so bucket sizes are
    ~N/2^16 per band under uniform fingerprints. SimHash bits are NOT
    uniform (majority votes correlate across same-boilerplate docs),
    so buckets above ``max_band_docs`` are dropped entirely — the same
    hot-bucket guard the MinHash path uses; at 100 TB, widen the bands
    (and raise len(bands) to keep the recall guarantee) instead of
    raising the cap.

    Returns ``(a_id, b_id, hamming)`` with ``a_id < b_id``.
    """
    # Persist the fingerprint frame: the 4-way band union would
    # otherwise re-run the upstream subtree (for simhash64 input,
    # the 63-bit-sum aggregate) once per band — Catalyst does not
    # dedupe repeated subtrees (repo rule; see shingle_index).
    fp = fp.persist()
    banded = _simhash_band_rows(fp, id_col, fp_col)
    from pyspark.sql import Window

    # NOT persisted: the a/b join sides re-derive band+window from the
    # cached fp scan (cheap), and persisting the window-terminated
    # frame measurably slowed the join (the cache-scan poisoning
    # NOTES.md documents for shingle_index: 6.9s vs 3.9s at sf0.1).
    banded = banded.withColumn(
        "bn", F.count(F.lit(1)).over(Window.partitionBy("band", "bv"))
    ).filter(F.col("bn") <= max_band_docs)
    a = banded.select(
        F.col(id_col).alias("a_id"), F.col(fp_col).alias("a_fp"), "band", "bv"
    )
    b = banded.select(
        F.col(id_col).alias("b_id"), F.col(fp_col).alias("b_fp"), "band", "bv"
    )
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_fp", "b_fp")
        .distinct()
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("a_fp").bitwiseXOR(F.col("b_fp")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= ham_max)
    )


def positioned_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """``(id, pos, gram_digest)`` — one row per word n-gram occurrence,
    1-based token position, md5 digest of the gram text.

    Docs shorter than ``n`` tokens contribute no rows (span detection
    has nothing to find there — unlike ``word_shingles``, which pads
    short docs so Jaccard stays defined). Grams leave the scan as
    32-byte md5 digests, so downstream shuffles never carry gram text.
    All JVM built-ins; the explode is map-side (no shuffle before the
    digest groupBy).
    """
    toks = ws_tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.posexplode(grams).alias("pos0", "gram")).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.md5(F.col("gram")).alias("gram_digest"),
    )


def duplicate_ngram_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """ExactSubstr-style duplicated-span profile per document.

    A token position is *duplicated* when the word n-gram starting
    there also occurs in at least one OTHER document. Consecutive
    duplicated positions merge into spans (gaps-and-islands), the
    canonical signal for verbatim cross-document duplication —
    boilerplate, licenses, syndicated text — that set-based shingle
    Jaccard (``ngram_jaccard_pairs``) deliberately ignores: Jaccard
    sees *which* grams repeat, spans see *how much contiguous text*.

    Returns one row per doc that carries ≥1 duplicated n-gram:
    ``(id, n_dup_ngrams, n_dup_spans, max_dup_span_tokens)`` where
    ``max_dup_span_tokens`` counts the tokens covered by the longest
    contiguous duplicated span (island length + n - 1).

    Scale shape: positioned grams → groupBy on the 32-byte digest with
    a distinct-doc count (map-side partial agg) → semi-join back (the
    duplicated-gram set is a small fraction of the index) → per-doc
    window over positions. No pairwise doc×doc join anywhere, so cost
    is linear in corpus size; the per-doc window partitions by doc id
    (bounded state — a doc's own positions).
    """
    spans = _dup_span_islands(df, id_col, text_col, n=n)
    return (
        spans.groupBy(id_col)
        .agg(
            F.sum("island_len").cast("bigint").alias("n_dup_ngrams"),
            F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
            (F.max("island_len") + (n - 1)).cast("bigint").alias(
                "max_dup_span_tokens"
            ),
        )
    )


def _dup_span_islands(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Maximal runs of duplicated n-gram start positions per doc:
    ``(id, grp, span_start, island_len)`` — the shared core of the
    span profile and the span-removal transformation."""
    grams = positioned_ngrams(df, id_col, text_col, n=n)
    dup_grams = (
        grams.groupBy("gram_digest")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("gram_digest")
    )
    dup_pos = grams.join(dup_grams, "gram_digest").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup_pos.withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    return islands.groupBy(id_col, "grp").agg(
        F.min("pos").alias("span_start"),
        F.count(F.lit(1)).alias("island_len"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_span: int | None = None,
) -> DataFrame:
    """ExactSubstr's actual EDIT: rewrite each document with every
    duplicated span of ≥ ``min_span`` tokens removed (default: any
    duplicated span, i.e. ``min_span = n``). A span's token coverage
    is its island of duplicated gram starts extended by ``n - 1``
    trailing tokens; kept tokens are re-joined with single spaces
    (whitespace-normalized output, like the profile's tokenizer).

    Output: one row per input doc — ``(id, n_tokens, n_removed,
    clean_text)``; fully-duplicated docs come back with empty text,
    untouched docs with their normalized text.

    Scale shape: everything up to the islands is the profile's linear
    plan (digest hash-agg, no pair join); the removal itself never
    explodes tokens — the (tiny) interval set groups to one array per
    doc, joins back on the doc id, and a map-side ``filter`` with an
    ``exists`` interval test drops covered tokens in place. One
    shuffle for the interval groupBy, zero for the rewrite; nothing
    ever pairs documents with each other.
    """
    if min_span is None:
        min_span = n
    from exceldatatransform_py_spark.functions.text import ws_tokens

    spans = _dup_span_islands(df, id_col, text_col, n=n)
    intervals = (
        spans.filter(F.col("island_len") + (n - 1) >= min_span)
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("a"),
                    (F.col("span_start") + F.col("island_len") + (n - 2))
                    .alias("b"),
                )
            ).alias("__ivs")
        )
    )
    toks = ws_tokens(text_col)
    ivs = F.coalesce(F.col("__ivs"), F.array())

    def _kept_tok(t, i):
        # i is the 0-based token index; spans use 1-based positions.
        covered = F.exists(
            ivs, lambda v: (i + 1 >= v["a"]) & (i + 1 <= v["b"])
        )
        return ~covered

    kept = F.filter(toks, _kept_tok)
    return df.join(intervals, id_col, "left").select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(toks) - F.size(kept)).cast("bigint").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def build_fingerprint_index(
    fp: DataFrame,
    table_prefix: str,
    n_buckets: int,
    path: str,
    id_col: str,
    fp_col: str,
) -> None:
    """Persist banded-hamming dedup state for ANY 63-bit fingerprint
    column (SimHash text fingerprints, image pHashes, ...):
    ``<prefix>_simbands`` ``(id, fp, band, bv)`` bucketed by ``bv`` —
    the probe side. The fingerprint rides along in every band row, so
    a probe computes hamming distances without a second corpus
    table. The fingerprint column is stored under the canonical name
    ``simhash`` so probe/append are fingerprint-agnostic."""
    from exceldatatransform_py_spark.sources.bucketing import write_bucketed

    fp = fp.withColumnRenamed(fp_col, "simhash").persist()
    write_bucketed(
        _simhash_band_rows(fp, id_col, "simhash"),
        f"{table_prefix}_simbands", ["bv"], n_buckets,
        path=f"{path}/simbands",
    )


def incremental_fingerprint_near_dup(
    spark: SparkSession,
    table_prefix: str,
    new_fp: DataFrame,
    id_col: str,
    fp_col: str,
    ham_max: int = 3,
    max_band_docs: int | None = 200,
) -> DataFrame:
    """Near-dups of a new fingerprint batch AGAINST the indexed
    corpus: ``(id_a=new, id_b=corpus, hamming)``. The corpus is never
    re-fingerprinted — the batch's band rows join the persisted table
    on its bucket key; recall is exact for ``ham_max`` ≤
    ``len(SIMHASH_BANDS) - 1`` by the same pigeonhole (band agreement
    does not care which side of the index split a pair straddles) —
    but only with ``max_band_docs=None``: the cap drops every corpus
    posting in a hot (band, value) bucket, so pairs whose ONLY
    agreeing band is hot are missed, exactly as in the live
    ``simhash_near_dup``. The cap is the throughput/recall dial for
    boilerplate-heavy corpora; pass ``None`` when the exactness
    guarantee matters more than hot-bucket cost. Work scales with the
    batch plus matched posting sizes."""
    new_fp = new_fp.withColumnRenamed(fp_col, "simhash").persist()
    new_bands = _simhash_band_rows(new_fp, id_col, "simhash")
    corpus_bands = _minus_tombstones(
        spark, table_prefix, spark.table(f"{table_prefix}_simbands"), id_col
    )

    if max_band_docs is not None:
        hot = (
            corpus_bands.groupBy("band", "bv")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_band_docs)
            .select("band", "bv")
        )
        corpus_bands = corpus_bands.join(
            F.broadcast(hot), ["band", "bv"], "left_anti"
        )

    a = new_bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("a_fp"),
        "band", "bv",
    )
    b = corpus_bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("b_fp"),
        "band", "bv",
    )
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "a_fp", "b_fp")
        .distinct()
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("a_fp").bitwiseXOR(F.col("b_fp")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= ham_max)
    )


def append_to_fingerprint_index(
    fp: DataFrame,
    table_prefix: str,
    id_col: str,
    fp_col: str,
) -> None:
    """Admit a fingerprint batch: append its band rows (``insertInto``
    preserves the bucket spec). Same ingest loop as the MinHash
    index."""
    fp = fp.withColumnRenamed(fp_col, "simhash").persist()
    (
        _simhash_band_rows(fp, id_col, "simhash")
        .write.mode("append")
        .insertInto(f"{table_prefix}_simbands")
    )


def build_simhash_index(
    docs: DataFrame,
    table_prefix: str,
    n_buckets: int,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the SimHash dedup state (completing the index family:
    MinHash ✓, BM25 ✓, IVF ✓, LSH ✓): text fingerprints through the
    fingerprint-agnostic banded index."""
    build_fingerprint_index(
        simhash64(docs, id_col, text_col),
        table_prefix, n_buckets, path, id_col, "simhash",
    )


def incremental_simhash_near_dup(
    spark: SparkSession,
    table_prefix: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ham_max: int = 3,
    max_band_docs: int | None = 200,
) -> DataFrame:
    """SimHash near-dups of ``new_docs`` AGAINST the indexed corpus —
    text fingerprints through the fingerprint-agnostic probe (see
    ``incremental_fingerprint_near_dup`` for the recall/cap
    contract)."""
    return incremental_fingerprint_near_dup(
        spark, table_prefix,
        simhash64(new_docs, id_col, text_col),
        id_col, "simhash", ham_max=ham_max, max_band_docs=max_band_docs,
    )


def append_to_simhash_index(
    docs: DataFrame,
    table_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Admit a batch: text fingerprints through the
    fingerprint-agnostic append."""
    append_to_fingerprint_index(
        simhash64(docs, id_col, text_col), table_prefix, id_col, "simhash"
    )


def incremental_novelty(
    spark: SparkSession,
    table_prefix: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Batch novelty against the indexed corpus: per new doc, the
    fraction of its distinct shingles NOT present anywhere in the
    persisted ``<prefix>_shingles`` table — the streaming-ingest
    flavor of ``doc_novelty_ratio`` (there: first occurrence by doc
    order within one corpus; here: unseen-by-the-index, the quantity
    a curation loop thresholds before admitting a batch).

    The corpus is never re-shingled: the batch's shingles probe the
    bucketed table with a left anti-ish aggregate (left join + null
    count). Work scales with the batch plus matched posting sizes.

    Output: ``(id_col, n_shingles, n_novel, novelty_ratio)``.
    """
    new_inv = shingle_index(new_docs, id_col, text_col, n=n)
    corpus_sh = (
        _minus_tombstones(
            spark, table_prefix,
            spark.table(f"{table_prefix}_shingles"), "doc",
        )
        .select("h", "g")
        .distinct()
    )
    seen = corpus_sh.withColumn("__seen", F.lit(1))
    per = (
        new_inv.join(seen, ["h", "g"], "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per.select(
        F.col("doc").alias(id_col),
        "n_shingles",
        "n_novel",
        (F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"))
        .alias("novelty_ratio"),
    )
