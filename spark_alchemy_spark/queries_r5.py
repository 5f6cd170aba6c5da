"""Battery extension, round 5: tokenizer training, semantic dedup, and
plan-level additions flagged by the round-4 review.

* ``bpe_train_merges`` — the FULL BPE training loop (not just one
  candidate count): N rounds of pair-count -> argmax -> merge-apply
  over the distinct-word table, producing the ordered merges table a
  tokenizer ships (``operators/bpe.py``).  The oracle replays the same
  N rounds non-recursively: per round, one GROUP BY picks the best
  pair and one string ``replace`` over parenthesis-wrapped symbol
  strings applies it (leftmost non-overlapping — exactly the BPE
  rule), unrolled by a Python generator the same way the
  connected-components oracle unrolls label propagation.
* ``dedup_semantic_clusters`` — SemDeDup-style semantic dedup:
  k-means/IVF clusters over embeddings (reusing the trained-centroid
  path from ``operators/similarity.py``), then WITHIN-cluster
  near-centroid pruning by exact cosine — bucketed by construction, no
  all-pairs joins anywhere.

Same determinism conventions as queries.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, query
from .queries_scale import _cc_close_sql

# ---------------------------------------------------------------------------
# BPE training loop
# ---------------------------------------------------------------------------

_BPE_N_MERGES = 8


def _bpe_oracle_sql(n_merges: int) -> str:
    """Unrolled non-recursive replay of the BPE training loop.  Word
    state per round is the parenthesis-wrapped symbol string
    ``(h)(e)(l)(l)(o)``: adjacent-pair counting splits it back to a
    symbol list, and applying merge (l, r) is one string
    ``replace('(l)(r)' -> '(lr)')`` — SQL replace scans left to right
    without overlap, which IS the BPE merge rule (the wrapping makes
    occurrences share no characters, so "(a)(a)(a)" under merge (a,a)
    correctly yields "(aa)(a)").  Symbols are [a-z]+ by construction
    (``bpe_words`` filter), so '(' ')' '|' never collide."""
    steps = []
    for k in range(1, n_merges + 1):
        steps.append(
            f"""
    m{k} AS MATERIALIZED (
      SELECT l, r, n FROM (
        SELECT string_split(pr, '|')[1] AS l, string_split(pr, '|')[2] AS r,
               CAST(sum(freq) AS BIGINT) AS n
        FROM (
          SELECT unnest([syms[i] || '|' || syms[i+1]
                         FOR i IN range(1, len(syms))]) AS pr, freq
          FROM (SELECT freq, string_split(st[2:len(st)-1], ')(') AS syms
                FROM s{k - 1})
        ) GROUP BY 1, 2
      ) ORDER BY n DESC, l, r LIMIT 1),
    s{k} AS MATERIALIZED (
      SELECT freq,
             replace(st, '(' || m.l || ')(' || m.r || ')',
                     '(' || m.l || m.r || ')') AS st
      FROM s{k - 1}, m{k} m),"""
        )
    final = "\n    UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS step, l AS lhs, r AS rhs, n FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        """
    WITH w0 AS MATERIALIZED (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS w
        FROM documents)
      WHERE regexp_full_match(w, '[a-z]+')
      GROUP BY w),
    s0 AS MATERIALIZED (
      SELECT freq,
             '(' || array_to_string([w[i:i] FOR i IN range(1, len(w) + 1)],
                                    ')(') || ')' AS st
      FROM w0),"""
        + "".join(steps)[:-1]
        + "\n    "
        + final
    )


@query(
    "plan_cms_join_choice",
    """
    SELECT 'small_dim' AS join_case,
           (SELECT count(*) FROM lineitem l JOIN supplier s
            ON l.l_suppkey = s.s_suppkey) AS n_rows,
           TRUE AS plan_ok
    UNION ALL
    SELECT 'big_fact',
           (SELECT count(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey),
           TRUE
    """,
)
def plan_cms_join_choice(spark, sf_dir):
    """Sketch-guided join planning on real tables
    (``functions/cms.py::sketch_guided_join``): the physical strategy
    is chosen from the two key COUNT-MIN sketches alone — no shuffle of
    either input before the choice.  The supplier dimension fits the
    broadcast budget -> BroadcastHashJoin; the orders side exceeds a
    1k-row budget -> sort-merge.  ``plan_ok`` asserts the PLANNED
    strategy read from each join's physical plan (the planner decision
    the sketch drives; AQE may later convert at runtime, which is its
    job), so the plan assertion rides the oracle entry (VERDICT r4
    task 8); join row counts are the oracle-checked values."""
    from .functions.cms import sketch_guided_join

    lineitem, orders, supplier = _t(
        spark, sf_dir, "lineitem", "orders", "supplier"
    )
    j1, _ = sketch_guided_join(
        lineitem.select(F.col("l_suppkey").alias("k")),
        supplier.select(F.col("s_suppkey").alias("k")),
        "k",
        broadcast_rows=10_000_000,
    )
    p1 = j1._jdf.queryExecution().executedPlan().toString()
    n1 = j1.count()
    j2, _ = sketch_guided_join(
        lineitem.select(F.col("l_orderkey").alias("k")),
        orders.select(F.col("o_orderkey").alias("k")),
        "k",
        broadcast_rows=1_000,
    )
    p2 = j2._jdf.queryExecution().executedPlan().toString()
    n2 = j2.count()
    return spark.createDataFrame(
        [
            ("small_dim", n1, "BroadcastHashJoin" in p1),
            ("big_fact", n2, "SortMergeJoin" in p2
             and "BroadcastHashJoin" not in p2),
        ],
        "join_case string, n_rows long, plan_ok boolean",
    )


@query(
    "dedup_semantic_clusters",
    """
    WITH
    v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45),"""
    + _cc_close_sql()
    + """
    SELECT comp, count(*) AS n_members, min(node) AS min_id,
           max(node) AS max_id, count(*) - 1 AS n_dropped
    FROM comp GROUP BY comp
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM bad WHERE n > 0
    """,
)
def dedup_semantic_clusters(spark, sf_dir):
    """SemDeDup-style semantic dedup end to end
    (``operators/dedup.py::semantic_dedup_components``): seeded
    k-means clusters -> within-cluster candidate pairs -> exact-cosine
    verify -> transitive collapse -> canonical survivors.  Run at
    ``nprobe = n_centroids`` so the cluster-bucketed machine reduces
    EXACTLY to brute force and the full train/assign/bucket/verify/
    collapse pipeline is held to the exact all-pairs + unrolled-CC
    oracle — the same probe-all contract as ``ann_ivf_topk``
    (selective-nprobe recall on planted duplicates is pinned in
    tests/test_semantic_dedup.py)."""
    from .operators.dedup import semantic_dedup_components

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_components(
        embeddings, "vec_id", "embedding", threshold=0.45,
        n_centroids=16, nprobe=16, seed=42,
    )


@query("bpe_train_merges", _bpe_oracle_sql(_BPE_N_MERGES))
def bpe_train_merges(spark, sf_dir):
    """Full BPE tokenizer training over the corpus word table
    (``operators/bpe.py::train_bpe_merges``): 8 merge rounds, each one
    narrow pair-count shuffle over DISTINCT words plus a driver argmax
    of exactly one row, merge application as a JVM ``aggregate`` fold.
    Output: the ordered merges table (step, lhs, rhs, n) — the actual
    artifact a training pipeline consumes."""
    from .operators.bpe import bpe_words, train_bpe_merges

    (documents,) = _t(spark, sf_dir, "documents")
    return train_bpe_merges(bpe_words(documents), n_merges=_BPE_N_MERGES)
