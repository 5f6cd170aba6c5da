"""Battery extension: the beyond-HLL sketch families (Theta set
algebra, KLL re-aggregatable quantiles) from ``functions/sketches.py``.

Oracle exactness contract (same spirit as the HLL entries): every
sketch in these queries provably stays in its exact mode at the
correctness gate's sf0.01 —

* theta with lgNomEntries=16 retains up to 65536 hashes; the largest
  distinct count sketched here is a few thousand customers/users;
* KLL(k=65535) is an exact order statistic until more than k values
  are retained; sf0.01 lineitem is ~60k rows total, and the merge
  query's combined count stays below k.  Spark's inclusive-rank
  ``kll_sketch_get_quantile`` equals DuckDB ``quantile_disc`` (both
  return the smallest value whose cumulative rank >= p*n; verified
  empirically in tests/test_sketches.py).

At bench scale (sf0.1+) the same queries degrade gracefully to
approximate answers — the whole point of the sketch design at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions import sketches as S
from .queries import _t, query

_LG_K = 16  # 2^16 nominal entries: exact for every distinct count at sf0.01
_KLL_K = 65535  # max k: exact order statistics below 65535 retained values


@query(
    "theta_reaggregate_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS theta_users
    FROM events GROUP BY event_type
    """,
)
def theta_reaggregate_users(spark, sf_dir):
    """The reference's headline precompute-then-reaggregate pipeline
    (hll/PostgresInteropTest.scala:73-98) in the theta family:
    fine-grained (event_type x day) sketches, unioned later."""
    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(S.theta_init_agg("user_id", _LG_K).alias("users_theta"))
    return daily.groupBy("event_type").agg(
        S.theta_cardinality(S.theta_merge("users_theta", _LG_K)).alias(
            "theta_users"
        )
    )


@query(
    "theta_set_algebra_segments",
    """
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '1-URGENT'),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_totalprice > 450000)
    SELECT
      (SELECT count(*) FROM a) AS urgent_custs,
      (SELECT count(*) FROM b) AS highval_custs,
      (SELECT count(*) FROM a
        WHERE o_custkey IN (SELECT o_custkey FROM b)) AS both_custs,
      (SELECT count(*) FROM a
        WHERE o_custkey NOT IN (SELECT o_custkey FROM b)) AS urgent_only_custs,
      (SELECT count(*) FROM
        (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b) u)
        AS either_custs
    """,
)
def theta_set_algebra_segments(spark, sf_dir):
    """Full sketch set algebra — |A|, |B|, |A∩B|, |A\\B|, |A∪B| — on two
    customer segments, one scan, no joins.  The reference can only
    approximate the intersection by inclusion-exclusion over HLL
    (hll/HLLFunctions.scala:573-618); theta sketches answer all five
    from two binary columns."""
    (orders,) = _t(spark, sf_dir, "orders")
    sk = orders.agg(
        S.theta_init_agg(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_custkey")),
            _LG_K,
        ).alias("a"),
        S.theta_init_agg(
            F.when(F.col("o_totalprice") > 450000, F.col("o_custkey")), _LG_K
        ).alias("b"),
    )
    return sk.select(
        S.theta_cardinality("a").alias("urgent_custs"),
        S.theta_cardinality("b").alias("highval_custs"),
        S.theta_cardinality(S.theta_intersection_row("a", "b")).alias(
            "both_custs"
        ),
        S.theta_cardinality(S.theta_difference_row("a", "b")).alias(
            "urgent_only_custs"
        ),
        S.theta_cardinality(S.theta_union_row("a", "b", _LG_K)).alias(
            "either_custs"
        ),
    )


@query(
    "kll_quantiles_quantity",
    """
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.25) AS q25,
           quantile_disc(l_quantity, 0.50) AS q50,
           quantile_disc(l_quantity, 0.90) AS q90,
           count(l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def kll_quantiles_quantity(spark, sf_dir):
    """Grouped quantiles from KLL sketches — one pass, mergeable state,
    vs. the exact sort-based oracle."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    sk = lineitem.groupBy("l_returnflag").agg(
        S.kll_init_agg("l_quantity", _KLL_K).alias("sk")
    )
    return sk.select(
        "l_returnflag",
        S.kll_quantile("sk", 0.25).alias("q25"),
        S.kll_quantile("sk", 0.50).alias("q50"),
        S.kll_quantile("sk", 0.90).alias("q90"),
        S.kll_count("sk").alias("n"),
    )


@query(
    "kll_merge_periods",
    """
    SELECT quantile_disc(l_quantity, 0.50) AS q50,
           quantile_disc(l_quantity, 0.90) AS q90,
           count(l_quantity) AS n
    FROM lineitem
    """,
)
def kll_merge_periods(spark, sf_dir):
    """Quantile reaggregation: independent sketches for two shipping
    eras, merged scalar-wise (kll_row_merge) into the all-time
    distribution — the persist-partial-sketches design from
    hll/PostgresInteropTest.scala:73-98 applied to percentiles."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-06-01").cast("timestamp")
    sk = lineitem.agg(
        S.kll_init_agg(
            F.when(F.col("l_shipdate") < cutoff, F.col("l_quantity")), _KLL_K
        ).alias("early"),
        S.kll_init_agg(
            F.when(F.col("l_shipdate") >= cutoff, F.col("l_quantity")), _KLL_K
        ).alias("late"),
    ).select(S.kll_row_merge("early", "late").alias("sk"))
    return sk.select(
        S.kll_quantile("sk", 0.50).alias("q50"),
        S.kll_quantile("sk", 0.90).alias("q90"),
        S.kll_count("sk").alias("n"),
    )


# Scale-layout sources + analytical query shapes register themselves
# into the same QUERIES/ORACLES dicts on import.
from . import queries_scale  # noqa: E402,F401  (registration side effect)


@query(
    "cms_user_frequencies",
    """
    SELECT user_id, count(*) AS n, count(*) AS est_n
    FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
    """,
)
def cms_user_frequencies(spark, sf_dir):
    """Count-min sketch point queries: one mergeable CMS over all
    events (JVM aggregate), then per-item frequency lookups through the
    pure-Python decoder (functions/cms.py) — Arrow-batched, sketch in
    the task closure.  eps sizes the width far above the distinct-user
    count, so gate-scale estimates equal exact counts."""
    from .functions import cms

    (events,) = _t(spark, sf_dir, "events")
    sketch = events.agg(
        cms.count_min_sketch_agg("user_id", eps=0.0001).alias("s")
    ).collect()[0]["s"]
    top = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("user_id"))
        .limit(10)
    )
    return top.withColumn("est_n", cms.cms_estimate_udf(sketch)(F.col("user_id")))
