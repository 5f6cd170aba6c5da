"""Distributed BPE tokenizer training (the full merge loop).

``queries_r4.bpe_first_merges`` demonstrates ONE merge-candidate count;
this module runs the actual training loop a pipeline consumes: N rounds
of (count adjacent symbol pairs over the DISTINCT-WORD table -> pick
the best pair -> apply the merge to every word's symbol sequence),
producing the ordered merges table that defines the tokenizer.

Spark-first design, per round:

* the pair count is one narrow (pair, partial-sum) shuffle over the
  distinct-word table — at 100 TB the word table is orders of magnitude
  smaller than the token stream, and it SHRINKS as merges apply;
* the best-pair pick collects exactly ONE row to the driver (bounded by
  construction — the classic BPE recurrence is inherently sequential
  across rounds, so a driver-side argmax per round is the floor, same
  as every published distributed BPE trainer);
* the merge application is a JVM-side ``aggregate`` fold over each
  word's symbol array (leftmost non-overlapping, the standard BPE
  rule) — zero Python in the hot path, and words not containing the
  merged pair's left symbol skip the fold entirely;
* lineage is truncated with ``localCheckpoint`` every
  ``checkpoint_every`` rounds (the ``graph.pagerank`` cadence pattern)
  so the plan does not grow linearly with rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bpe_words",
    "corpus_word_stream",
    "encode_with_merges",
    "train_bpe_merges",
]


def corpus_word_stream(
    documents: DataFrame, text_col: str = "text", *carry_cols: str
) -> DataFrame:
    """The corpus word stream feeding every BPE stage: lowercased
    whitespace tokens, one row per occurrence, with any ``carry_cols``
    (doc_id, lang, ...) riding along.  ONE definition on purpose — the
    encode/pack entries inner-join this stream against the trained
    word table, so a tokenization-rule drift between trainer and
    consumer would silently drop tokens instead of failing."""
    return documents.select(
        *carry_cols,
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
        ).alias("w"),
    )


def bpe_words(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table for BPE training: lowercased
    whitespace tokens restricted to pure ``[a-z]+`` (punctuation-bearing
    tokens would need byte-level pre-tokenization, out of scope for the
    word-level trainer).  Returns (w, freq)."""
    # translate-empty check, not a regex: same [a-z]+ predicate with no
    # per-token regex-engine cost on the corpus-sized stream
    return (
        corpus_word_stream(documents, text_col)
        .filter(F.translate(F.col("w"), "abcdefghijklmnopqrstuvwxyz", "") == "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """Struct list of adjacent symbol pairs; empty for 1-symbol words
    (the explicit size guard matters: ``sequence(1, 0)`` DESCENDS)."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        )
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Leftmost non-overlapping replacement of adjacent (left, right)
    with their concatenation — the BPE merge rule — as a JVM
    ``aggregate`` fold carrying (out, skip) state.  ``skip`` consumes
    the right symbol of a just-merged pair so "a a a" under merge
    (a, a) yields [aa, a], never [aa, aa]."""
    merged = left + right
    n = F.size(syms)
    zipped = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.element_at(syms, i).alias("cur"),
            F.when(i < n, F.element_at(syms, i + 1)).alias("nxt"),
        ),
    )
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )
    folded = F.aggregate(
        zipped,
        acc0,
        lambda acc, x: F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        )
        .when(
            (x["cur"] == F.lit(left)) & x["nxt"].eqNullSafe(F.lit(right)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(x["cur"])).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda acc: acc["out"],
    )
    # words without the left symbol at all can't contain the pair:
    # skip the fold (array_position = 0 when absent)
    return F.when(F.array_position(syms, left) == 0, syms).otherwise(folded)


def train_bpe_merges(
    words: DataFrame,
    n_merges: int,
    word_col: str = "w",
    freq_col: str = "freq",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Run ``n_merges`` BPE rounds over a (word, freq) table; returns
    the merges table (step, lhs, rhs, n) — ``n`` is the pair's
    frequency-weighted count at selection time, tie-broken
    deterministically by (n desc, lhs, rhs).  Stops early if the corpus
    runs out of adjacent pairs.

    The returned DataFrame is built from the driver-side merge list
    (``n_merges`` rows, bounded by the argument)."""
    spark = words.sparkSession
    w = F.col(word_col)
    state = words.select(
        F.col(freq_col).alias("freq"),
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.substring(w, i, 1),
        ).alias("syms"),
    ).localCheckpoint()  # one corpus-pass materialization, reused 2N times

    # Size the loop's parallelism to the VOCAB, not the corpus: the
    # distinct-word table is orders of magnitude smaller than the token
    # stream (31 words on the synthetic corpus, ~10-100M on a real 100
    # TB one), and running 8 rounds of 32-task stages over a handful of
    # rows is pure scheduler overhead.  ~50k words per partition keeps
    # tasks meaty; a real vocab still fans out across the cluster.
    n_words = state.count()
    parts = max(1, min(state.rdd.getNumPartitions(), n_words // 50_000 + 1))
    if parts < state.rdd.getNumPartitions():
        state = state.repartition(parts).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            state.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .collect()  # bounded: exactly one row per round
        )
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((step, l, r, n))
        state = state.withColumn("syms", _apply_merge(F.col("syms"), l, r))
        if step % checkpoint_every == 0:
            # truncate lineage so the fold chain doesn't deepen the plan
            # linearly in rounds (pagerank's checkpoint cadence)
            state = state.localCheckpoint(eager=False)

    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, n long"
    )


def encode_with_merges(
    words: DataFrame,
    merges: list[tuple],
    word_col: str = "w",
    checkpoint_every: int = 2,
    keep_syms: bool = False,
) -> DataFrame:
    """Apply an ORDERED merges list (the ``train_bpe_merges`` artifact,
    collected — bounded by n_merges) to a word table: each word's
    character sequence folds through the merges in training order, the
    same leftmost non-overlapping rule as training.  Adds
    ``n_subtokens`` (the word's encoded length) — join this against
    the corpus word stream to tokenize at corpus scale while paying
    the merge folds only once per DISTINCT word.

    One projection per merge with a ``localCheckpoint`` plan barrier
    every ``checkpoint_every`` merges: ``_apply_merge`` references its
    input expression ~6 times, so chaining N folds into one collapsed
    projection grows the expression tree 6^N-fold — 8 unbarriered
    merges OOM'd the JVM at plan-build time (Catalyst's
    CollapseProject inlines consecutive projections, so only a
    materialization boundary actually bounds the nesting).

    ``keep_syms=True`` additionally keeps the final symbol array as
    ``syms`` (vocabulary-accounting consumers explode it)."""
    w = F.col(word_col)
    out = words.withColumn(
        "__syms",
        F.transform(
            F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
        ),
    )
    for i, m in enumerate(merges):
        # accept (step, lhs, rhs, n) rows or bare (lhs, rhs) pairs —
        # explicitly, so a 3-field tuple fails HERE with the shapes
        # named instead of as an opaque TypeError deep in the fold
        if len(m) >= 4:
            lhs, rhs = m[1], m[2]
        elif len(m) == 2:
            lhs, rhs = m[0], m[1]
        else:
            raise ValueError(
                f"merges[{i}] has {len(m)} fields; expected "
                "(step, lhs, rhs, n) rows or bare (lhs, rhs) pairs"
            )
        if not (isinstance(lhs, str) and isinstance(rhs, str)):
            raise ValueError(
                f"merges[{i}]: lhs/rhs must be strings, got "
                f"({type(lhs).__name__}, {type(rhs).__name__})"
            )
        out = out.withColumn("__syms", _apply_merge(F.col("__syms"), lhs, rhs))
        if (i + 1) % checkpoint_every == 0 and i + 1 < len(merges):
            out = out.localCheckpoint(eager=False)
    out = out.withColumn("n_subtokens", F.size("__syms"))
    if keep_syms:
        if "syms" in words.columns:
            raise ValueError(
                "keep_syms=True would shadow the input's existing "
                "'syms' column; rename it first"
            )
        return out.withColumnRenamed("__syms", "syms")
    return out.drop("__syms")
