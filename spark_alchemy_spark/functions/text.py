"""Text-analysis functions for large-scale corpus pipelines: tokenizing,
quality scoring, language identification, fingerprinting.

All pure Column expressions over built-ins (split/filter/transform/
aggregate) — whole-stage codegen, no Python in the hot path, no
shuffles.  Each has a deliberately simple, SQL-expressible definition so
results can be oracle-checked in any ANSI engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal stopword profiles for the language-ID heuristic.  Chosen to be
# disjoint across languages so the scoring is unambiguous.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"],
    "es": ["el", "los", "las", "es", "una", "en", "por", "con", "para", "como"],
}


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def tokens(col, delimiter: str = " ") -> Column:
    """Whitespace tokens with empties dropped (split-semantics stable
    across engines)."""
    return F.filter(F.split(_col(col), delimiter), lambda w: w != "")


def token_count(col) -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_token_count(col) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def mean_token_length(col, decimals: int = 4) -> Column:
    """Average token length; NULL for token-less text."""
    ts = tokens(col)
    total = F.aggregate(
        ts, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w).cast("long")
    )
    n = F.size(ts)
    return F.when(n > 0, F.round(total / n, decimals))


def stopword_ratio(col, stopwords: list[str] | None = None, decimals: int = 4) -> Column:
    """Fraction of tokens that are (English, by default) stopwords."""
    sw = stopwords or LANG_STOPWORDS["en"]
    ts = tokens(col)
    hits = F.size(F.filter(ts, lambda w: w.isin(*sw)))
    n = F.size(ts)
    return F.when(n > 0, F.round(hits / n, decimals))


def char_class_ratio(col, pattern: str, decimals: int = 4) -> Column:
    """Fraction of characters matching a regex class (e.g. punctuation
    ``[^a-z0-9 ]`` or digits ``[0-9]``)."""
    c = _col(col)
    n = F.length(c)
    matched = n - F.length(F.regexp_replace(c, pattern, ""))
    return F.when(n > 0, F.round(matched / n, decimals))


def quality_flags(col, min_tokens: int = 20, max_mean_token_len: float = 12.0) -> Column:
    """Boolean keep/drop flag in the style of corpus quality filters
    (length + degenerate-token heuristics)."""
    n = token_count(col)
    mtl = mean_token_length(col)
    return (n >= min_tokens) & (mtl <= max_mean_token_len)


def lang_id(col) -> Column:
    """Stopword-profile language ID over {en, de, fr, es}; 'und'
    (undetermined) when nothing matches.  Ties break in the profile
    order en > de > fr > es (deterministic)."""
    ts = tokens(col)

    def _hits(sw):
        # separate scope: a default-arg lambda would be introspected as a
        # two-parameter SQL lambda by PySpark's higher-order functions
        return F.size(F.filter(ts, lambda w: w.isin(*sw)))

    scores = {lang: _hits(sw) for lang, sw in LANG_STOPWORDS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # earlier profiles win ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def doc_fingerprint(col) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set — the classic near-identity key for shuffle-cheap exact
    dedup of reordered/duplicated-whitespace text."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def word_shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles as an array (empty when fewer than n tokens).

    Hot-path note: this tokenizes inline, and higher-order-function
    lambdas are interpreted (no subexpression elimination), so the
    regex split re-runs for every element_at reference.  Operators that
    shingle in bulk must materialize ``tokens(col)`` as a real column
    first and call :func:`shingles_from_tokens` — measured 8x faster on
    the documents table."""
    return shingles_from_tokens(tokens(col), n)


def shingles_from_tokens(tok_col, n: int = 3) -> Column:
    """Word n-gram shingles from an already-materialized token array
    column (the scale path — one tokenization pass total)."""
    ts = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    k = F.size(ts)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(-1)))
    return F.when(
        k >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(ts, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# GPT-2-style pretokenizer, restricted to the regex subset Java and
# RE2 share (no lookahead): a token is an optionally space-prefixed
# letter run, digit run, or punctuation run.  This is the "BPE-ish"
# budget estimator: counts track byte-pair-encoding vocabularies far
# better than whitespace splitting (which undercounts punctuation-
# and digit-heavy text).
BPE_SPLIT_PATTERN = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def subword_tokens(col) -> Column:
    """BPE-style pretokens (array<string>) via one regexp pass."""
    return F.regexp_extract_all(_col(col), F.lit(BPE_SPLIT_PATTERN), F.lit(0))


def subword_token_count(col) -> Column:
    """Token-budget estimate under BPE-ish pretokenization."""
    return F.size(subword_tokens(col)).cast("long")


def exploded_shingles(df, id_col: str, text_col: str, n: int = 3, keep_pos: bool = False):
    """One (id, shingle) ROW per word n-gram occurrence: ``posexplode``
    the token array and stitch each n-gram with window ``lead``s —
    whole-stage codegen end to end, measured ~5x the interpreted
    ``transform`` array builder on real corpora.  The window's hash
    partitioning on the id is inherited by any downstream per-id (or
    id-plus-key) aggregation, so per-doc distincts, n-gram counts and
    MinHash signatures add NO further exchange.

    Emits (id_col, ``__s``) — plus the 0-based start position ``__p``
    when ``keep_pos`` (the positional form shared-span detection
    needs); positions with fewer than ``n`` tokens remaining are
    dropped, matching :func:`shingles_from_tokens` (documents under
    ``n`` tokens emit nothing).  Prefer this for operators that explode
    shingles anyway; keep the array form for per-row set expressions."""
    from pyspark.sql import Window

    tk = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__p", "__w")
    )
    w = Window.partitionBy(id_col).orderBy("__p")
    parts = [F.col("__w")] + [F.lead("__w", j).over(w) for j in range(1, n)]
    cols = [F.col(id_col)] + ([F.col("__p")] if keep_pos else [])
    return (
        tk.select(
            *cols,
            F.concat_ws(" ", *parts).alias("__s"),
            F.lead("__w", n - 1).over(w).isNotNull().alias("__full"),
        )
        .filter(F.col("__full"))
        .drop("__full")
    )


def bench_gram_set(benchmark, text_col: str, n: int = 3):
    """DISTINCT word-``n``-gram set of a (small) benchmark/reference
    corpus as a 1-column frame (``__s``) — the shared build for the
    decontamination family (``prep.decontaminate``,
    ``prep.decontaminate_bloom``, ``dedup.strip_contaminated_spans``).
    The array builder is fine here: the benchmark side is the
    broadcastable one."""
    from pyspark.sql import functions as F

    return benchmark.select(
        F.explode(
            F.array_distinct(shingles_from_tokens(tokens(text_col), n))
        ).alias("__s")
    ).distinct()
