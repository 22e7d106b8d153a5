"""Text-analysis expression library (LLM-pipeline ops, SURVEY.md §2.7).

Everything is a pure JVM-side Column expression (``pyspark.sql.
functions`` only — no Python UDFs): tokenization, token counting,
quality scoring, language-ID heuristics, shingling, and md5-derived
64-bit hashing. Each helper has an exact DuckDB-SQL twin (same md5,
same regex class, same decimal arithmetic) so the driver's value-hash
oracle can check the whole text pipeline.

The reference has no text analytics (it is an Excel timesheet ETL —
SURVEY.md §0); these operators are the north-star extension surface
for training-data pipelines at 100 TB: all of them are embarrassingly
parallel map-side expressions with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization / normalization.
# ---------------------------------------------------------------------------

#: BPE-ish token pattern: runs of word chars OR single non-word-non-space
#: chars. ASCII \w in both Java regex and DuckDB's RE2.
BPE_TOKEN_RE = r"\w+|[^\w\s]"

#: Small deterministic stopword lists for the language-ID heuristic and
#: stopword-ratio quality metric. Order matters only for readability.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "it": ("il", "la", "di", "e", "che", "un", "una", "per", "non", "sono"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "pour", "que", "dans"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse all
    whitespace runs to single spaces, trim.

    DuckDB twin: ``lower(trim(regexp_replace(x, '\\s+', ' ', 'g')))``.
    """
    return F.lower(F.trim(F.regexp_replace(_c(col).cast("string"), r"\s+", " ")))


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed string; empty input → empty
    array (Spark's split('') yields [''] — filtered here).

    DuckDB twin: ``list_filter(string_split_regex(trim(x), '\\s+'),
    t -> t != '')``.
    """
    toks = F.split(F.trim(_c(col).cast("string")), r"\s+")
    return F.filter(toks, lambda t: t != "")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count. DuckDB twin: ``len(...)`` of the above."""
    return F.size(ws_tokens(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: words + individual punctuation marks.

    DuckDB twin: ``len(regexp_extract_all(x, '\\w+|[^\\w\\s]'))``.
    """
    return F.size(F.regexp_extract_all(_c(col).cast("string"), F.lit(BPE_TOKEN_RE), 0))


# ---------------------------------------------------------------------------
# Quality metrics (length / punctuation / stopword ratios).
# ---------------------------------------------------------------------------


def punct_count(col: Column | str) -> Column:
    """Number of punctuation characters ``[.,;:!?]``.

    DuckDB twin: ``length(x) - length(regexp_replace(x, '[.,;:!?]',
    '', 'g'))``.
    """
    c = _c(col).cast("string")
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))


def stopword_hits(tokens: Column, lang: str) -> Column:
    """How many tokens (with multiplicity) are stopwords of ``lang``.

    DuckDB twin: ``len(list_filter(toks, t -> list_contains([...],
    t)))``.
    """
    stop = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stop, t)))


def quality_score(
    n_chars: Column, n_tokens: Column, n_punct: Column, n_stop: Column
) -> Column:
    """Deterministic [0,1]-ish quality score from integer counts.

    All inputs are integers, every division is double-on-integers with
    a fixed expression shape, so Spark and DuckDB produce bit-identical
    doubles. Heuristic (mirrors common LLM-corpus filters): reward
    mid-length docs, a sane mean token length, nonzero stopword density
    and some punctuation.
    """
    nt = n_tokens.cast("double")
    nc = n_chars.cast("double")
    mean_tok_len = nc / F.greatest(nt, F.lit(1.0))
    stop_ratio = n_stop.cast("double") / F.greatest(nt, F.lit(1.0))
    punct_ratio = n_punct.cast("double") / F.greatest(nc, F.lit(1.0))
    len_ok = ((n_chars >= 50) & (n_chars <= 10000)).cast("double")
    tok_ok = ((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)).cast("double")
    return (
        len_ok * F.lit(0.4)
        + tok_ok * F.lit(0.3)
        + F.least(stop_ratio * F.lit(3.0), F.lit(1.0)) * F.lit(0.2)
        + F.least(punct_ratio * F.lit(20.0), F.lit(1.0)) * F.lit(0.1)
    )


def lang_id(tokens: Column) -> Column:
    """Stopword-vote language ID over {en,it,de,fr}; 'und' when no
    list scores a hit. Ties break in fixed en>it>de>fr order (the
    first CASE branch with a max score wins — same in both engines).
    """
    scores = {lang: stopword_hits(tokens, lang) for lang in STOPWORDS}
    en, it, de, fr = scores["en"], scores["it"], scores["de"], scores["fr"]
    best = F.greatest(en, it, de, fr)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(it == best, F.lit("it"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


# ---------------------------------------------------------------------------
# Shingling + portable 64-bit-ish hashing (md5-derived).
# ---------------------------------------------------------------------------


# Hashed-shingle constants (shared with the DuckDB oracle builders in
# plans.queries_llm — import from here so the two sides cannot drift).
# Fold: acc' = (acc * B + token_hash) % M with M = 2^49 - 1: acc stays
# in 49 bits, acc*B peaks at 2^62, + a 32-bit token hash < 2^63 — no
# BIGINT overflow in either engine. B0/B1 are distinct odd multipliers
# so the two folds give (near-)independent hash values per shingle.
SHINGLE_M = 562949953421311  # 2^49 - 1
SHINGLE_B0 = 4099
SHINGLE_B1 = 8209


def token_hashes(tokens: Column, seed: int = 0) -> Column:
    """Per-token portable 32-bit hashes (``md5_hash32`` mapped over the
    token array). DuckDB twin: ``list_transform(toks, t -> H32(t))``."""
    return F.transform(tokens, lambda t: md5_hash32(t, seed=seed))


def hashed_shingles(th0: Column, th1: Column, n: int = 3) -> Column:
    """Distinct hashed word n-grams as ``array<struct<h,g>>`` — the
    shingle set for near-dup detection WITHOUT materializing shingle
    strings. ``th0``/``th1`` are per-token hash arrays built by
    ``token_hashes`` (seeds 0 and 1).

    A shingle's two values are polynomial folds of the window's token
    hashes (``(acc*B + x) % M``), so building the shingle set is pure
    BIGINT arithmetic instead of string slicing + concat + md5 per
    window — ~2x faster end-to-end on the sf0.1 MinHash query, and the
    shuffled index rows carry two BIGINTs instead of a 32-char digest.
    The (h, g) pair has ~98 usable bits, so treating hash-set Jaccard
    as shingle-set Jaccard is sound (the standard hashed-shingling
    construction from Broder's resemblance work).

    CRITICAL eval-once contract: ``th0``/``th1`` MUST be plain column
    references to a MATERIALIZED (persisted/shuffled) projection, not
    inline expression trees. Lambda bodies re-evaluate captured outer
    *expressions* on every element access — an inlined
    ``transform(toks, md5...)`` here turns O(tokens) hashing into
    O(windows x tokens) (measured 28-106s vs 2.3s on sf0.1). Catalyst's
    CollapseProject will happily inline a single-use alias straight
    into the lambda, so a bare ``select`` stage is NOT a barrier; only
    persist/exchange boundaries are. ``operators.dedup.shingle_index``
    owns that staging.

    Docs shorter than ``n`` tokens fold their full (short) window;
    empty docs yield the single shingle (0, 0) — every doc has ≥1
    shingle so self-Jaccard is 1.
    """

    def fold(arr: Column, i: Column, mult: int) -> Column:
        win = F.slice(arr, i, F.lit(n))
        return F.aggregate(
            win,
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * mult + x) % SHINGLE_M,
        )

    idx = F.sequence(F.lit(1), F.greatest(F.size(th0) - (n - 1), F.lit(1)))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            fold(th0, i, SHINGLE_B0).alias("h"), fold(th1, i, SHINGLE_B1).alias("g")
        ),
    )
    return F.array_distinct(pairs)


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces.

    Docs shorter than ``n`` tokens yield their full token string as
    the single shingle (so every doc has ≥1 shingle and self-Jaccard
    is 1). DuckDB twin uses ``range`` + list slicing.
    """
    joined = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, F.lit(n))),
        )
    )
    return joined


def md5_hash32(col: Column | str, seed: int = 0) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5('<seed>:'||x) as
    a BIGINT. Identical in DuckDB:
    ``CAST(concat('0x', substr(md5(concat('<seed>:', x)), 1, 8)) AS
    BIGINT)``.

    md5 is overkill as a hash but it is the one hash function both
    engines implement bit-identically; MinHash/SimHash need *portable*
    hashes for oracle parity, not cryptographic strength.
    """
    c = _c(col).cast("string")
    h = F.md5(F.concat(F.lit(f"{seed}:"), c))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
