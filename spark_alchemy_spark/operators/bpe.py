"""Distributed byte-level BPE tokenizer training (the full merge loop).

``queries_r4.bpe_first_merges`` demonstrates ONE merge-candidate count;
this module runs the actual training loop a pipeline consumes: N rounds
of (count adjacent symbol pairs over the DISTINCT-WORD table -> pick
the best pair -> apply the merge to every word's symbol sequence),
producing the ordered merges table that defines the tokenizer.

Representation (round 6, VERDICT r5 task 1): **symbols are hex byte
strings** — a word is first UTF-8 encoded and its per-byte hex pairs
(``"68" "65" "6C" ...``, uppercase) are the base symbols; a merge
concatenates hex strings.  This makes the tokenizer byte-level (any
punctuation, digit, or multi-byte UTF-8 input has a well-defined
symbol sequence; nothing silently falls out of the vocabulary) and
makes every symbol safe to embed in the oracle's delimiter-wrapped
string encoding (hex chars are ``[0-9A-F]``, so ``(`` ``)`` wrappers
can never collide with symbol content).

Pre-tokenization is GPT-2-style class splitting
(:func:`pre_tokenize`): runs of letters, runs of digits, and runs of
other non-space characters are separate words — ``"table-1.0"``
yields ``table`` ``-`` ``1`` ``.`` ``0`` — so punctuation never glues
unrelated words into one vocabulary entry.

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

Encoding has TWO implementations sharing one contract (the trained
merges applied in training order, each as one leftmost-non-overlapping
pass):

* :func:`encode_with_merges` — pure-Catalyst ``aggregate`` folds, one
  projection per merge.  Zero Python, but each fold references its
  input ~6x, so the expression tree grows 6^N per collapsed projection
  — fine at N<=8 with checkpoint barriers, structurally not a
  32k-merge encoder.
* :func:`encode_with_merge_ranks` — the vocab-scale path (VERDICT r5
  task 2): ONE Arrow-batched pandas UDF pass over the DISTINCT-word
  table holding the broadcast merge-rank dict.  Python is acceptable
  here because the input is the VOCAB, not the corpus — the
  corpus-sized token stream still pays only a hash join against the
  encoded word table.  Cost per word is O(len^2) independent of the
  merge count, so a production 32k-merge vocabulary is one flat pass.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..localframe import local_frame

__all__ = [
    "PRE_TOKEN_RE",
    "bpe_words",
    "corpus_word_stream",
    "encode_with_merge_ranks",
    "encode_with_merges",
    "pre_tokenize",
    "train_bpe_merges",
    "word_syms",
]

#: GPT-2-style pre-tokenization classes: letter runs, digit runs, and
#: runs of any other non-whitespace characters.  Whitespace is an
#: EXPLICIT ASCII class rather than ``\s`` because Java's ``\s``
#: includes vertical tab (\x0B) while RE2's does not — the one byte
#: where the engines' shorthands disagree; the explicit class keeps
#: Spark, the DuckDB oracles, and the Python replay (tests'
#: ``_ref_pretok``) bit-identical.  Both engines support the Unicode
#: ``\p{L}``/``\p{N}`` classes and ``\x0B``.
PRE_TOKEN_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N} \t\n\r\f\x0B]+"


def pre_tokenize(text: Column) -> Column:
    """Lowercase + class-split pre-tokenization: the array of
    pre-tokens (letter runs / digit runs / punctuation runs) of one
    text value.  ONE definition on purpose — trainer, encoder, packing
    and the hashing-trick embeddings all tokenize through here, so a
    rule drift between producer and consumer cannot happen silently."""
    return F.regexp_extract_all(F.lower(text), F.lit(PRE_TOKEN_RE), 0)


def corpus_word_stream(
    documents: DataFrame, text_col: str = "text", *carry_cols: str
) -> DataFrame:
    """The corpus word stream feeding every BPE stage: one row per
    pre-token occurrence (:func:`pre_tokenize` rule), with any
    ``carry_cols`` (doc_id, lang, ...) riding along."""
    return documents.select(
        *carry_cols,
        F.explode(pre_tokenize(F.col(text_col))).alias("w"),
    )


def bpe_words(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table for BPE training over the
    byte-level pre-token universe — every pre-token participates
    (punctuation and digit runs included; the byte-level symbol
    representation means nothing is outside the vocabulary).
    Returns (w, freq)."""
    return (
        corpus_word_stream(documents, text_col)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def word_syms(w: Column) -> Column:
    """A word's base symbol array: uppercase hex pairs of its UTF-8
    bytes (``'he,'`` -> ``['68','65','2C']``).  Matches the DuckDB
    oracle's ``substr(hex(w), i*2-1, 2)`` split bit-for-bit (both
    engines emit uppercase hex)."""
    h = F.hex(F.encode(w, "UTF-8"))
    # empty-word guard: sequence(1, 0) DESCENDS (same trap as
    # _adjacent_pairs), which would hand '' two empty symbols and break
    # the cross-encoder identity (merge-rank encoder returns [])
    return F.when(
        F.length(h) > 0,
        F.transform(
            F.sequence(F.lit(1), (F.length(h) / F.lit(2)).cast("int")),
            lambda i: F.substring(h, (i * 2 - 1).cast("int"), 2),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


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
    the merges table (step, lhs, rhs, n) — lhs/rhs are hex byte-string
    symbols, ``n`` is the pair's frequency-weighted count at selection
    time, tie-broken deterministically by (n desc, lhs, rhs).  Stops
    early if the corpus runs out of adjacent pairs.

    The returned DataFrame is built from the driver-side merge list
    (``n_merges`` rows, bounded by the argument)."""
    spark = words.sparkSession
    state = words.select(
        F.col(freq_col).alias("freq"),
        word_syms(F.col(word_col)).alias("syms"),
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

    return local_frame(spark, 
        merges, "step int, lhs string, rhs string, n long"
    )


def _normalize_merges(merges: list[tuple]) -> list[tuple[str, str]]:
    """Accept (step, lhs, rhs, n) rows or bare (lhs, rhs) pairs —
    explicitly, so a 3-field tuple fails HERE with the shapes named
    instead of as an opaque TypeError deep in the encoder."""
    out: list[tuple[str, str]] = []
    for i, m in enumerate(merges):
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
        out.append((lhs, rhs))
    return out


def _finish_encoded(
    words: DataFrame, out: DataFrame, keep_syms: bool
) -> DataFrame:
    out = out.withColumn("n_subtokens", F.size("__syms"))
    if keep_syms:
        if "syms" in words.columns:
            raise ValueError(
                "keep_syms=True would shadow the input's existing "
                "'syms' column; rename it first"
            )
        return out.withColumnRenamed("__syms", "syms")
    return out.drop("__syms")


def encode_with_merges(
    words: DataFrame,
    merges: list[tuple],
    word_col: str = "w",
    checkpoint_every: int = 2,
    keep_syms: bool = False,
) -> DataFrame:
    """Apply an ORDERED merges list (the ``train_bpe_merges`` artifact,
    collected — bounded by n_merges) to a word table: each word's
    byte-symbol sequence folds through the merges in training order,
    the same leftmost non-overlapping rule as training.  Adds
    ``n_subtokens`` (the word's encoded length) — join this against
    the corpus word stream to tokenize at corpus scale while paying
    the merge folds only once per DISTINCT word.

    This is the ZERO-PYTHON path, usable for small merge lists: one
    projection per merge with a ``localCheckpoint`` plan barrier every
    ``checkpoint_every`` merges (``_apply_merge`` references its input
    expression ~6 times, so chaining N folds into one collapsed
    projection grows the expression tree 6^N-fold — 8 unbarriered
    merges OOM'd the JVM at plan-build time; Catalyst's
    CollapseProject inlines consecutive projections, so only a
    materialization boundary actually bounds the nesting).  For
    production-sized vocabularies use :func:`encode_with_merge_ranks`.

    ``keep_syms=True`` additionally keeps the final symbol array as
    ``syms`` (vocabulary-accounting consumers explode it)."""
    pairs = _normalize_merges(merges)
    out = words.withColumn("__syms", word_syms(F.col(word_col)))
    for i, (lhs, rhs) in enumerate(pairs):
        out = out.withColumn("__syms", _apply_merge(F.col("__syms"), lhs, rhs))
        if (i + 1) % checkpoint_every == 0 and i + 1 < len(pairs):
            out = out.localCheckpoint(eager=False)
    return _finish_encoded(words, out, keep_syms)


def encode_with_merge_ranks(
    words: DataFrame,
    merges: list[tuple],
    word_col: str = "w",
    keep_syms: bool = False,
) -> DataFrame:
    """The vocab-scale encoder: ONE Arrow-batched pandas-UDF pass over
    the distinct-word table carrying the merge-rank dict as a Spark
    broadcast.  Output contract is IDENTICAL to
    :func:`encode_with_merges` (merges applied in training order, one
    leftmost-non-overlapping pass each) — pinned by
    ``tests/test_bpe.py``'s cross-encoder property law.

    Algorithm (monotonic-rank loop): repeatedly find the
    lowest-ranked pair currently adjacent in the word WITH rank >= the
    last applied rank, and apply its single pass.  This is exactly the
    sequential semantics: between the last applied rank and the chosen
    one no present pair exists, and a merge pass over an absent pair
    is a no-op — so skipping straight to the chosen rank replays the
    sequential loop.  The plain min-rank loop (GPT-2's encoder) is NOT
    used because two different merge paths can produce the same symbol
    string, letting a later merge re-create an adjacency whose rank
    already passed — the monotonic guard (plus per-pair rank LISTS for
    re-learned pairs) keeps the pass order bit-equal to training.
    Cost per word: O(len^2), independent of the merge count — a 32k
    merge vocabulary is the same one flat pass as 8 merges.

    Python is acceptable here because the input is the VOCAB, not the
    corpus: the corpus-sized token stream never enters this function;
    it pays only a broadcast/hash join against the encoded output.
    """
    from pyspark.sql import types as T

    pairs = _normalize_merges(merges)
    rank_lists: dict[tuple[str, str], list[int]] = {}
    for k, p in enumerate(pairs):
        rank_lists.setdefault(p, []).append(k)
    bc = words.sparkSession.sparkContext.broadcast((pairs, rank_lists))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(col: pd.Series) -> pd.Series:
        from bisect import bisect_left

        bpairs, branks = bc.value

        def one(w: str) -> list[str]:
            h = w.encode("utf-8").hex().upper()
            parts = [h[i : i + 2] for i in range(0, len(h), 2)]
            last = 0
            while len(parts) > 1:
                best = None
                for i in range(len(parts) - 1):
                    rs = branks.get((parts[i], parts[i + 1]))
                    if rs is None:
                        continue
                    j = bisect_left(rs, last)
                    if j < len(rs) and (best is None or rs[j] < best):
                        best = rs[j]
                if best is None:
                    break
                left, right = bpairs[best]
                merged = left + right
                out: list[str] = []
                i, n = 0, len(parts)
                while i < n:
                    if i + 1 < n and parts[i] == left and parts[i + 1] == right:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(parts[i])
                        i += 1
                parts = out
                last = best + 1  # this merge's single pass is done
            return parts

        return col.map(one)

    out = words.withColumn("__syms", _enc(F.col(word_col)))
    return _finish_encoded(words, out, keep_syms)
