"""Byte-pair-encoding tokenizer training — the full merge loop.

The reference has no tokenizer training (SURVEY.md §0); this is the
LLM-pipeline operator that turns a corpus into a merge table (the BPE
"model"). ``bpe_merge_candidates`` (plans/queries_llm.py) is iteration
1 of this loop; here the loop actually runs: count adjacent symbol
pairs weighted by word frequency → pick the most frequent pair
(deterministic tie-break: count DESC, pair ASC) → greedily merge every
occurrence left-to-right → repeat.

The real-BPE scale shape: the corpus is scanned ONCE to build the
distinct-word frequency table (one tokenize + one hash aggregate —
exactly how reference BPE trainers operate, on word counts, never on
running text). Every training round then works on that WORD table —
at 100 TB the corpus is petabytes but distinct words are millions of
rows, so rounds cost one tiny pair aggregate each; the winning pair
(one row — the model grows one entry per round) is collected to the
driver and re-enters the rebuild as literals, the same model-sized
driver traffic as the logistic trainer's gradient. Per round: one
pair-count job + one map-only rebuild of the symbol arrays,
lineage-truncated with localCheckpoint (per-step-checkpoint rule,
NOTES.md).

Engine-exact determinism: symbol arrays hold only token characters
(no separators), so a space-joined accumulator string is a lossless
encoding; the greedy merge is ONE left-to-right fold shared
verbatim with the DuckDB oracle (``list_reduce`` there, ``aggregate``
here): append the next symbol, or — when it equals B and the
accumulator's last symbol equals A — replace that last symbol with
the merged A||B. The fold can never double-merge (the merged symbol
A||B is strictly longer than A), which reproduces standard BPE's
non-overlapping left-to-right pass: 'aaaa' under (a,a) → ['aa','aa'].
All counts are exact BIGINTs; ordering ties break on the pair string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.text import ws_tokens


def bpe_word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → ``(w, c, s)``: distinct lowercase words with exact
    frequency and their initial character-symbol arrays. This is the
    ONLY corpus-sized pass of BPE training."""
    w = (
        docs.select(
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, F.lit(1)),
    )
    return w.select("w", "c", chars.alias("s"))


def _merge_fold(s: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b — the
    string-accumulator fold shared with the oracle: symbols carry no
    spaces, so space-joining is lossless."""
    sep_a = " " + a
    merged = a + b
    folded = F.aggregate(
        F.slice(s, F.lit(2), F.greatest(F.size(s) - 1, F.lit(0))),
        F.element_at(s, 1),
        lambda acc, x: F.when(
            (x == F.lit(b))
            & ((acc == F.lit(a)) | acc.endswith(F.lit(sep_a))),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - len(a)),
                F.lit(merged),
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )
    return F.split(folded, " ")


def bpe_train(words: DataFrame, n_merges: int) -> DataFrame:
    """Run ``n_merges`` BPE rounds over a ``(w, c, s)`` word table;
    returns the merge table ``(round int, pair string, n_occurrences
    bigint)`` — the trained tokenizer model, one row per round in
    training order. Stops early if no adjacent pair remains."""
    merges = train_merge_sequence(words, n_merges)
    return words.sparkSession.createDataFrame(
        merges, "round int, pair string, n_occurrences long"
    )


def train_merge_sequence(
    words: DataFrame, n_merges: int
) -> list[tuple[int, str, int]]:
    """The training loop itself, returning the merge sequence as
    ``[(round, pair, count), ...]`` — the model object ``bpe_apply``
    consumes."""
    return bpe_train_state(words, n_merges)[0]


def bpe_train_state(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Train AND hand back the final symbolization: ``(merges, final
    word table (w, c, s))``. Corpus encoding should read the returned
    table (each round's rebuild is already materialized there) rather
    than re-folding the merge sequence as one expression —
    ``bpe_apply``'s chained folds reference their input twice each, so
    an N-merge expression tree grows 2^N (measured: 8 chained folds
    cost ~20s of analyzer/codegen at sf0.1; the materialized state is
    free)."""
    cur = words.localCheckpoint()
    merges: list[tuple[int, str, int]] = []
    for t in range(1, n_merges + 1):
        pairs = cur.filter(F.size("s") >= 2).select(
            "c",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 1),
                    lambda i: F.concat(
                        F.element_at("s", i),
                        F.lit(" "),
                        F.element_at("s", i + 1),
                    ),
                )
            ).alias("pair"),
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("c").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:  # vocabulary fully merged
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        merges.append((t, pair, n))
        a, b = pair.split(" ")
        cur = cur.select(
            "w", "c", _merge_fold(F.col("s"), a, b).alias("s")
        ).localCheckpoint()
    return merges, cur


def bpe_apply(tokens: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode: apply a trained merge sequence (in training order) to a
    word's character symbols — map-only, usable on the full corpus."""
    s = tokens
    for a, b in merges:
        s = _merge_fold(s, a, b)
    return s
