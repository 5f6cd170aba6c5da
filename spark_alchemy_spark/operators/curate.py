"""End-to-end corpus curation: the composed pipeline a training-data
build actually runs, as one DataFrame transform chain.

    quality filter  ->  language filter  ->  exact dedup (fingerprint)
      ->  near-dedup (MinHash-LSH connected components, greedy)
      ->  token accounting

Each stage is one of this engine's primitive operators; composing them
here pins the stage *order* that matters at 100 TB: cheap row-local
filters first (quality, language — codegen, no shuffle), then the
shuffle-bearing dedups over the already-reduced survivor set, then
bookkeeping aggregates.

The near-dedup stage resolves candidate pairs to survivors with a
min-id union–find run driver-side over the (tiny) pair list — pairs
are a vanishingly small fraction of docs for real thresholds; the
massive side (documents) never leaves executors.  For adversarial
corpora where pairs themselves are huge, swap in an iterative
large-star/small-star connected-components pass (same contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, lang_id, quality_flags, token_count
from .dedup import minhash_lsh_pairs


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_mean_token_len: float = 12.0,
    keep_langs: tuple[str, ...] | None = None,
    near_dup_threshold: float | None = 0.5,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Curated survivor set with per-document bookkeeping columns
    (``lang_pred``, ``n_tokens``).  Deterministic: smallest id survives
    every dedup stage."""
    flagged = docs.select(
        F.col(id_col),
        F.col(text_col),
        lang_id(text_col).alias("lang_pred"),
        token_count(text_col).alias("n_tokens"),
        quality_flags(text_col, min_tokens, max_mean_token_len).alias("__keep"),
    ).filter(F.col("__keep"))
    if keep_langs:
        flagged = flagged.filter(F.col("lang_pred").isin(*keep_langs))

    # exact dedup on the order-insensitive fingerprint: one shuffle on a
    # 128-bit key; smallest id survives
    exact = (
        flagged.withColumn("__fp", doc_fingerprint(text_col))
        .withColumn("__min_id", F.min(id_col).over(Window.partitionBy("__fp")))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__fp", "__min_id", "__keep")
    )

    if near_dup_threshold is None:
        return exact

    pairs = minhash_lsh_pairs(
        exact, id_col, text_col, num_perm=num_perm, bands=bands,
        threshold=near_dup_threshold,
    )
    losers = _pair_losers(pairs)
    if losers:
        loser_df = exact.sparkSession.createDataFrame(
            [(i,) for i in sorted(losers)], f"{id_col} long"
        )
        exact = exact.join(F.broadcast(loser_df), on=id_col, how="left_anti")
    return exact


def _pair_losers(pairs: DataFrame) -> set[int]:
    """Min-id union–find over the near-dup pair list: every doc that is
    not its component's minimum is a loser.  Pair lists are small by
    construction (high-threshold near-dups), so this runs driver-side;
    the documents themselves are never collected."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for row in pairs.select("id_a", "id_b").collect():
        ra, rb = find(row["id_a"]), find(row["id_b"])
        if ra != rb:  # min root wins
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x for x in parent if find(x) != x}


def curation_report(
    docs: DataFrame,
    curated: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-language accounting of the curated corpus: surviving docs and
    token budget (the numbers a data-mixing step consumes)."""
    return (
        curated.groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("lang_pred")
    )
