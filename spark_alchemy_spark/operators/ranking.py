"""Corpus-level term ranking: TF-IDF and BM25.

The retrieval-scoring half of a training-data pipeline — surfacing
representative terms per document (TF-IDF) and scoring documents
against a query (BM25, the lexical-search baseline next to the
embedding ANN operators in operators/similarity.py).

Both are pure DataFrame compositions over one token explode:

* term statistics aggregate (doc, term) pairs, never documents — the
  text column is dropped before any shuffle;
* document frequencies are a second map-side-combinable aggregate of
  the (already distinct) per-document term counts;
* corpus scalars (N, avgdl) ride along as broadcast one-row joins, so
  nothing collects to the driver;
* BM25 filters the explode to the query's terms FIRST — the per-query
  work is proportional to matching postings, not corpus size.

Scores are snapped to a 1e-6 grid before ranking so top-k frontiers
are reproducible across engines (ln/div ULP differences otherwise flip
tie-adjacent ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens


def _term_freqs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — one explode + one aggregate."""
    return (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: ``tf * ln(N / df)`` with
    ``row_number`` over (score desc, term) for a stable frontier.
    Returns (id, rank, term, score) with score rounded to 4dp."""
    tf = _term_freqs(docs, id_col, text_col)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")), 6).alias(
                "__s"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__s").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", F.round("__s", 4).alias("score"))
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """BM25 ranking of documents against ``query_terms``:
    ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``.  Returns the top
    ``topk`` (id, score) rows, score rounded to 4dp, ties broken by id.

    The explode is filtered to the query's terms before aggregating, so
    per-query cost tracks posting-list size; dl/avgdl come from a
    separate full-corpus length aggregate that is shared (and cached by
    the scan reuse) across queries."""
    if not query_terms:
        raise ValueError("need at least one query term")
    # tf feeds BOTH the per-doc scores and the df broadcast, and dl
    # feeds both the length join and the corpus scalars: checkpoint
    # each once (lazy) so the explode/tokenize passes run once, not
    # 2-4 times (no exchange reuse across broadcast boundaries)
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    dl = docs.select(F.col(id_col), token_count(text_col).alias("dl")).localCheckpoint(
        eager=False
    )
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .join(F.broadcast(scalars))
        .select(
            F.col(id_col),
            (idf * F.col("tf") * (k1 + 1) / denom).alias("__s"),
        )
    )
    return (
        per_term.groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("__s6"))
        .orderBy(F.col("__s6").desc(), F.col(id_col))
        .limit(topk)
        .select(id_col, F.round("__s6", 4).alias("score"))
    )
