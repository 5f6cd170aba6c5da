"""Battery extension: trainer-facing prep operators — sequence
packing (contiguous + greedy first-fit), deterministic splits,
repetition screening — lexical ranking (TF-IDF, BM25), and the
engine-completeness entries added with them: time-series (EWMA,
funnels, transitions, cohorts, deciles), data quality (expectations,
PSI drift), warehouse maintenance (incremental aggregates, streaming
CDC into merge-on-read), SQL-surface semantics (range frames,
correlated scalar subqueries, ANSI try_*, named parameters, non-equi
band joins, sketch SQL names) and perceptual-hash media dedup.

Oracle notes:
* both packing modes replay exactly in SQL — contiguous is a window
  cumsum, greedy is a recursive CTE walking each shard's deterministic
  order one row at a time (fine at oracle scale; the Spark side runs
  the same recurrence as one Arrow pass per shard);
* the split oracle re-derives the md5 band thresholds from the same
  ``fraction_threshold`` helper the operator uses, so the SQL text and
  the Column expression can never drift apart;
* ranking scores are snapped to a 1e-6 grid before ranking/summing on
  BOTH sides — ln/division ULP differences across engines otherwise
  flip tie-adjacent top-k rows; non-binary-exact SQL constants (1.2,
  2.2) are cast to DOUBLE so DuckDB's decimal literals don't take an
  exact-arithmetic path Spark's doubles can't follow.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .localframe import local_frame

from .operators.prep import fraction_threshold
from .queries import _t, query

# DuckDB token-array fragment shared by the oracles below.
_WS = "list_filter(string_split(text, ' '), w -> w <> '')"

_T1 = fraction_threshold(0.8)
_T2 = fraction_threshold(0.9)


@query(
    "prep_pack_contiguous",
    f"""
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS shard, len({_WS}) AS tok
      FROM documents
    ),
    c AS (
      SELECT shard, tok,
             sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - tok AS excl
      FROM t
    )
    SELECT shard, CAST(floor(excl / 512) AS BIGINT) AS pack_id,
           count(*) AS n_docs, sum(tok) AS pack_tokens
    FROM c GROUP BY shard, pack_id
    """,
)
def prep_pack_contiguous(spark, sf_dir):
    """Contiguous block packing of documents into 512-token training
    sequences across 8 independent shards (no global sort), summarized
    per pack."""
    from .functions.text import token_count
    from .operators.prep import pack_sequences

    (documents,) = _t(spark, sf_dir, "documents")
    items = documents.select("doc_id", token_count("text").alias("tok"))
    packed = pack_sequences(
        items, "doc_id", "tok", budget=512, num_shards=8, order_cols=["doc_id"]
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tok").alias("pack_tokens")
    )


@query(
    "prep_pack_greedy",
    f"""
    -- Version-proof oracle: NO sequential replay in SQL at all.  The
    -- greedy recurrence burned two driver rounds on DuckDB version
    -- drift (recursive CTEs in r3, list_reduce lambda folds in r4), so
    -- the entry now emits per-shard totals a pure GROUP BY reproduces
    -- plus invariant booleans the Spark side derives from the actual
    -- pack assignment.  Next-fit packing is UNIQUELY determined by
    -- (order_ok, budget_ok, tight_ok) given the doc order, so the
    -- booleans being TRUE is a complete correctness check, not a weak
    -- one; the bit-exact assignment is additionally replayed in Python
    -- in tests/test_prep.py.
    SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(len({_WS})) AS BIGINT) AS total_tokens,
           TRUE AS order_ok, TRUE AS budget_ok, TRUE AS tight_ok
    FROM documents GROUP BY shard
    """,
)
def prep_pack_greedy(spark, sf_dir):
    """First-fit greedy packing (no pack exceeds the 512 budget except
    a lone oversize row) — same shards/order as the contiguous entry.
    Output: per-shard doc/token totals plus the three invariants that
    uniquely pin the next-fit assignment —

    * ``order_ok``  — pack ids start at 0 and step by 0/+1 in doc
      order (packs are contiguous dense ranges);
    * ``budget_ok`` — every pack fits the 512 budget unless it is a
      lone oversize row;
    * ``tight_ok``  — the next pack's first row would NOT have fit in
      the previous pack (a new pack only opens when forced).

    Any deviation from the greedy recurrence falsifies one of the
    three, flipping a boolean and the value hash."""
    from pyspark.sql import Window

    from .functions.text import token_count
    from .operators.prep import pack_sequences_greedy

    (documents,) = _t(spark, sf_dir, "documents")
    items = documents.select("doc_id", token_count("text").alias("tok"))
    packed = pack_sequences_greedy(
        items, "doc_id", "tok", budget=512, num_shards=8, order_cols=["doc_id"]
    )
    wdoc = Window.partitionBy("shard").orderBy("doc_id")
    seq = packed.withColumn("prev_pack", F.lag("pack_id").over(wdoc))
    # doc-level: first row of a shard must open pack 0; later rows may
    # only stay (step 0) or open the next pack (step +1)
    order_viol = F.when(
        F.col("prev_pack").isNull(), (F.col("pack_id") != 0).cast("int")
    ).otherwise(
        (
            (F.col("pack_id") != F.col("prev_pack"))
            & (F.col("pack_id") != F.col("prev_pack") + 1)
        ).cast("int")
    )
    wpk = Window.partitionBy("shard", "pack_id").orderBy("doc_id")
    per_pack = (
        seq.withColumn("ov", order_viol)
        .withColumn("rn", F.row_number().over(wpk))
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("pk_docs"),
            F.sum("tok").alias("pk_tokens"),
            F.max(F.when(F.col("rn") == 1, F.col("tok"))).alias("first_tok"),
            F.sum("ov").alias("ov"),
        )
    )
    wsh = Window.partitionBy("shard").orderBy("pack_id")
    flagged = per_pack.withColumn(
        "next_first", F.lead("first_tok").over(wsh)
    ).select(
        "shard",
        "pk_docs",
        "pk_tokens",
        "ov",
        ((F.col("pk_tokens") > 512) & (F.col("pk_docs") > 1))
        .cast("int")
        .alias("budget_viol"),
        (
            F.col("next_first").isNotNull()
            & (F.col("pk_tokens") + F.col("next_first") <= 512)
        )
        .cast("int")
        .alias("tight_viol"),
    )
    return flagged.groupBy("shard").agg(
        F.sum("pk_docs").alias("n_docs"),
        F.sum("pk_tokens").cast("long").alias("total_tokens"),
        (F.sum("ov") == 0).alias("order_ok"),
        (F.sum("budget_viol") == 0).alias("budget_ok"),
        (F.sum("tight_viol") == 0).alias("tight_ok"),
    )


@query(
    "prep_repetition_stats",
    f"""
    WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
    sh AS (
      SELECT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ),
    pg AS (SELECT doc_id, s, count(*) AS c FROM sh GROUP BY doc_id, s)
    SELECT doc_id, sum(c) AS n_ngrams, count(*) AS n_distinct,
           max(c) AS max_rep, round(1 - count(*) / sum(c), 4) AS dup_frac
    FROM pg GROUP BY doc_id
    """,
)
def prep_repetition_stats(spark, sf_dir):
    """Gopher-style within-document repetition screen: duplicate
    word-trigram fraction per document."""
    from .operators.prep import repetition_stats

    (documents,) = _t(spark, sf_dir, "documents")
    return repetition_stats(documents, "doc_id", "text", n=3)


@query(
    "prep_train_split",
    f"""
    WITH s AS (
      SELECT lang, doc_id,
             CASE WHEN substring(md5('split-v1:' || CAST(doc_id AS VARCHAR)),
                                 1, 8) < '{_T1}' THEN 'train'
                  WHEN substring(md5('split-v1:' || CAST(doc_id AS VARCHAR)),
                                 1, 8) < '{_T2}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang, count(*) AS n_docs, sum(doc_id) AS id_sum
    FROM s GROUP BY split, lang
    """,
)
def prep_train_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment (md5 band
    membership — engine-independent, never migrates a document),
    audited per language stratum with an id checksum."""
    from .operators.prep import train_split

    (documents,) = _t(spark, sf_dir, "documents")
    split = train_split(
        documents, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="split-v1",
    )
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum")
    )


@query(
    "text_tfidf_top_terms",
    f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest({_WS}) AS term FROM documents
      ) GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tf.term AS term,
             round(tf * ln(n_docs / dfreq), 6) AS s6
      FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, s6,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY s6 DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, rank, term, round(s6, 4) AS score
    FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document — the representative-term
    extraction step of a corpus analysis pass."""
    from .operators.ranking import tfidf_top_terms

    (documents,) = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(documents, "doc_id", "text", k=3)


@query(
    "text_bm25_search",
    f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest({_WS}) AS term FROM documents
      ) WHERE term IN ('hash', 'join', 'filter') GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
    dl AS (SELECT doc_id, len({_WS}) AS dl FROM documents),
    sc AS (SELECT count(*) AS n_docs, avg(len({_WS})) AS avgdl
           FROM documents),
    per AS (
      SELECT tf.doc_id AS doc_id,
             ln(1 + CAST(n_docs - dfreq + 0.5 AS DOUBLE)
                    / CAST(dfreq + 0.5 AS DOUBLE))
               * tf * CAST(2.2 AS DOUBLE)
               / (tf + CAST(1.2 AS DOUBLE)
                       * (1 - 0.75 + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS s
      FROM tf
      JOIN dfq ON tf.term = dfq.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN sc
    ),
    agg AS (SELECT doc_id, round(sum(s), 6) AS s6 FROM per GROUP BY doc_id)
    SELECT doc_id, round(s6, 4) AS score
    FROM agg ORDER BY s6 DESC, doc_id LIMIT 10
    """,
)
def text_bm25_search(spark, sf_dir):
    """BM25 lexical search for 'hash join filter' — top-10 documents,
    the keyword-retrieval baseline beside the ANN entries."""
    from .operators.ranking import bm25_scores

    (documents,) = _t(spark, sf_dir, "documents")
    return bm25_scores(
        documents, "doc_id", "text", ["hash", "join", "filter"], topk=10
    )


@query(
    "prep_temperature_mix",
    """
    WITH cnt AS (SELECT source AS s, count(*) AS c FROM documents GROUP BY source),
    wt AS (SELECT s, pow(c, 0.5) / c AS w FROM cnt),
    pk AS (SELECT max(w) AS peak FROM wt),
    thr AS (
      SELECT s, CASE WHEN w / peak >= 1 THEN 'g'
                     ELSE lpad(to_hex(CAST(round(w / peak * 4294967296) AS BIGINT)),
                               8, '0') END AS t
      FROM wt CROSS JOIN pk
    ),
    kept AS (
      SELECT d.source, d.doc_id
      FROM documents d JOIN thr ON thr.s = d.source
      WHERE substring(md5('mix-v1:' || CAST(doc_id AS VARCHAR)), 1, 8) < thr.t
    )
    SELECT source, count(*) AS n_docs, sum(doc_id) AS id_sum
    FROM kept GROUP BY source
    """,
)
def prep_temperature_mix(spark, sf_dir):
    """Temperature-reweighted (alpha=0.5) source mixture: stratum
    keep-fractions ∝ count^alpha / count, normalized so the dominant
    stratum keeps everything, drawn with the engine-reproducible md5
    Bernoulli — the oracle recomputes the thresholds entirely in SQL."""
    from .operators.prep import temperature_mix

    (documents,) = _t(spark, sf_dir, "documents")
    mixed = temperature_mix(documents, "source", "doc_id", alpha=0.5)
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum")
    )


@query(
    "prep_stratified_fixed_n",
    """
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY substring(md5('fixed-v1:' || CAST(doc_id AS VARCHAR)),
                                  1, 8),
                        doc_id) AS rn
      FROM documents) t
    WHERE rn <= 40
    """,
)
def prep_stratified_fixed_n(spark, sf_dir):
    """Exactly-40-per-language deterministic draw (md5 order) — the
    fixed-size eval-set selection."""
    from .operators.prep import stratified_fixed_n

    (documents,) = _t(spark, sf_dir, "documents")
    return stratified_fixed_n(documents, "lang", "doc_id", 40).select(
        "lang", "doc_id"
    )


@query(
    "prep_token_budget_take",
    f"""
    WITH items AS (
      SELECT source, doc_id, len({_WS}) AS tok FROM documents
    ),
    c AS (
      SELECT source, doc_id, tok,
             sum(tok) OVER (
               PARTITION BY source
               ORDER BY substring(md5('budget-v1:' || CAST(doc_id AS VARCHAR)),
                                  1, 8),
                        doc_id
               ROWS UNBOUNDED PRECEDING) - tok AS excl
      FROM items
    )
    SELECT source, count(*) AS n_docs, sum(tok) AS sum_tokens
    FROM c WHERE excl < 3000 GROUP BY source
    """,
)
def prep_token_budget_take(spark, sf_dir):
    """Per-source token allowances: walk each source in md5 order and
    keep documents starting under a 3000-token budget (overshoot
    bounded by one document)."""
    from .functions.text import token_count
    from .operators.prep import token_budget_take

    (documents,) = _t(spark, sf_dir, "documents")
    items = documents.select(
        "source", "doc_id", token_count("text").alias("tok")
    )
    taken = token_budget_take(
        items, "source", "doc_id", "tok", budget_per_stratum=3000
    )
    return taken.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tok").alias("sum_tokens")
    )


@query(
    "text_vocab_topk",
    """
    WITH sub AS (
      SELECT unnest(regexp_extract_all(
               text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS tok
      FROM documents
    ),
    counts AS (SELECT tok, count(*) AS n FROM sub GROUP BY tok)
    SELECT tok, n FROM counts
    ORDER BY n DESC, tok LIMIT 50
    """,
)
def text_vocab_topk(spark, sf_dir):
    """Tokenizer-vocabulary seeding: top-50 subword pretokens by corpus
    frequency (the BPE-ish pretokenizer from functions/text.py) — one
    explode + one map-side-combinable count."""
    from .functions.text import subword_tokens

    (documents,) = _t(spark, sf_dir, "documents")
    return (
        documents.select(F.explode(subword_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(50)
    )


@query(
    "timeseries_ewma_users",
    """
    -- Closed form, no recursion: the EWMA recurrence telescopes to
    --   s_n = 0.7^(n-1) * x_1 + sum_{j=2..n} 0.3 * 0.7^(n-j) * x_j
    -- which one window + GROUP BY computes.  (Recursive CTEs are
    -- banned from oracles: driver-box DuckDB recursion semantics
    -- drifted across versions.)  Rounded to 3 decimals because the
    -- closed form and the Spark side's exact sequential fold differ by
    -- O(1e-12) in float; the bit-exact recurrence itself is pinned in
    -- tests/test_operators.py::test_ewma_recurrence_and_determinism.
    WITH e AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id, max(rn) AS n_events,
           round(sum(CASE WHEN rn = 1 THEN power(0.7, n - 1) * value
                     ELSE 0.3 * power(0.7, n - rn) * value END), 3)
             AS final_ewma
    FROM e GROUP BY user_id
    """,
)
def timeseries_ewma_users(spark, sf_dir):
    """Per-user EWMA (alpha=0.3) over event values in time order —
    the sequential recurrence runs as one Arrow pass per user
    (operators/temporal.py::ewma); the oracle computes the telescoped
    closed form, with a 3-decimal round absorbing the fold-vs-sum
    float gap."""
    from .operators.temporal import ewma

    (events,) = _t(spark, sf_dir, "events")
    scanned = ewma(
        events.select("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "value", alpha=0.3, order_tiebreak="event_id",
    )
    return scanned.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max_by("ewma", F.struct("ts", "event_id")), 3).alias(
            "final_ewma"
        ),
    )


@query(
    "funnel_view_click_purchase",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS ft FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS ft
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.ft
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS ft
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.ft
      GROUP BY e.user_id
    )
    SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM s1) AS users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase, each step
    strictly after the user's first qualifying prior step)."""
    from .operators.temporal import funnel_counts

    (events,) = _t(spark, sf_dir, "events")
    return funnel_counts(
        events, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    )


@query(
    "window_range_frame_revenue",
    """
    SELECT o_orderkey, o_custkey,
           count(*) OVER w AS nearby_orders,
           round(sum(o_totalprice) OVER w, 2) AS nearby_revenue
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                 RANGE BETWEEN 2592000 PRECEDING AND 2592000 FOLLOWING)
    """,
)
def window_range_frame_revenue(spark, sf_dir):
    """VALUE-based window frame (RANGE BETWEEN +-30 days on the epoch
    second): each order aggregated with the same customer's orders in
    a sliding time band — the frame type rows-based entries can't
    express."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 30 * 86400)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("nearby_orders"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("nearby_revenue"),
    )


@query(
    "scalar_correlated_subqueries",
    """
    SELECT n_name,
           (SELECT count(*) FROM customer c
            WHERE c.c_nationkey = n.n_nationkey) AS n_customers,
           (SELECT round(avg(s_acctbal), 2) FROM supplier s
            WHERE s.s_nationkey = n.n_nationkey) AS avg_supp_bal
    FROM nation n
    """,
)
def scalar_correlated_subqueries(spark, sf_dir):
    """Correlated scalar subqueries in the SELECT list, submitted as
    SQL text — Catalyst decorrelates both into outer-joined aggregates
    (no per-row re-execution); empty correlation groups yield NULL,
    matching ANSI semantics on both engines."""
    customer, supplier, nation = _t(
        spark, sf_dir, "customer", "supplier", "nation"
    )
    customer.createOrReplaceTempView("customer")
    supplier.createOrReplaceTempView("supplier")
    nation.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n_name,
               (SELECT count(*) FROM customer c
                WHERE c.c_nationkey = n.n_nationkey) AS n_customers,
               (SELECT round(avg(s_acctbal), 2) FROM supplier s
                WHERE s.s_nationkey = n.n_nationkey) AS avg_supp_bal
        FROM nation n
        """
    )


@query(
    "ansi_try_and_null_semantics",
    """
    SELECT l_linenumber,
           count(*) AS n,
           sum(CASE WHEN l_discount = 0 THEN NULL
                    ELSE round(l_extendedprice / nullif(l_discount, 0), 2)
               END IS NULL::INT) AS null_ratios,
           sum((l_returnflag IS NOT DISTINCT FROM 'R')::INT) AS r_flags,
           sum((try_cast(substr(l_comment_like, 1, 2) AS INTEGER)
                IS NOT NULL)::INT) AS numeric_prefixes
    FROM (
      SELECT l_linenumber, l_extendedprice, l_discount, l_returnflag,
             CAST(l_partkey AS VARCHAR) AS l_comment_like
      FROM lineitem) t
    GROUP BY l_linenumber ORDER BY l_linenumber
    """,
)
def ansi_try_and_null_semantics(spark, sf_dir):
    """ANSI-strict error semantics with the try_* escape hatches:
    division guarded by nullif (ANSI mode errors on /0), try_cast of
    non-numeric text to NULL instead of failing, and null-safe
    comparison (IS NOT DISTINCT FROM / <=>) — the semantics layer a
    SQL-first user hits immediately under ``spark.sql.ansi.enabled``."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    ratio = F.when(
        F.col("l_discount") == 0, F.lit(None)
    ).otherwise(
        F.round(
            F.try_divide("l_extendedprice", F.nullif("l_discount", F.lit(0))), 2
        )
    )
    return (
        lineitem.select(
            "l_linenumber",
            ratio.isNull().cast("int").alias("__nullratio"),
            F.col("l_returnflag").eqNullSafe("R").cast("int").alias("__rflag"),
            F.try_to_number(
                F.substring(F.col("l_partkey").cast("string"), 1, 2), F.lit("99")
            ).isNotNull().cast("int").alias("__numpref"),
        )
        .groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__nullratio").alias("null_ratios"),
            F.sum("__rflag").alias("r_flags"),
            F.sum("__numpref").alias("numeric_prefixes"),
        )
        .orderBy("l_linenumber")
    )


@query(
    "cohort_weekly_retention",
    """
    WITH cohorts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             CAST(floor(CAST(epoch(date_trunc('week', e.ts)) AS BIGINT)
                        / 604800.0
                        - CAST(epoch(c.cohort_week) AS BIGINT) / 604800.0)
                  AS BIGINT) AS week_offset
      FROM events e JOIN cohorts c ON c.user_id = e.user_id
      WHERE e.ts >= c.cohort_week
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
           count(*) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_weekly_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-signup week,
    counted in each subsequent week they were active — the
    product-analytics staple.  One aggregate for cohorts (broadcastable
    per-user frontier), one distinct per (user, week) pass for
    activity."""
    (events,) = _t(spark, sf_dir, "events")
    cohorts = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    wk = F.lit(604800)
    activity = (
        events.join(F.broadcast(cohorts), "user_id")
        .filter(F.col("ts") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.unix_timestamp(F.date_trunc("week", F.col("ts"))) / wk
                - F.unix_timestamp("cohort_week") / wk
            ).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "decile_customer_revenue",
    """
    WITH rev AS (
      SELECT o_custkey, sum(o_totalprice) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT o_custkey, revenue,
             ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
      FROM rev
    )
    SELECT decile, count(*) AS n_customers,
           round(sum(revenue), 2) AS decile_revenue,
           round(min(revenue), 2) AS floor_revenue
    FROM tiled GROUP BY decile ORDER BY decile
    """,
)
def decile_customer_revenue(spark, sf_dir):
    """Decile (whale-curve) analysis: customers ranked by lifetime
    revenue, cut into ntile(10) bands with per-band totals — the
    quantile-bucketed reporting pattern (deterministic tiebreak keeps
    the tile frontier engine-stable).

    Scale note: an unpartitioned window is a single-task sort, but its
    input here is the POST-AGGREGATION customer relation (|customers|
    << |orders|); for billion-key cases switch the cut to KLL decile
    bounds (functions/sketches.py) + a broadcast range join."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), "o_custkey")
    return (
        rev.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("revenue"), 2).alias("decile_revenue"),
            F.round(F.min("revenue"), 2).alias("floor_revenue"),
        )
        .orderBy("decile")
    )


@query(
    "sketch_sql_surface",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS theta_suppliers,
           count(DISTINCT l_partkey) AS theta_parts,
           CAST(quantile_disc(l_quantity, 0.5) AS BIGINT) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_sql_surface(spark, sf_dir):
    """The theta/KLL families driven ENTIRELY from SQL text through the
    registered names (register_sql) — sketches built by the built-in
    SQL aggregates, read through this engine's macros; exact below
    capacity so the oracle is plain COUNT(DISTINCT) / quantile_disc."""
    from .functions.sketches import register_sql

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    register_sql(spark)
    lineitem.createOrReplaceTempView("lineitem_sk")
    return spark.sql(
        """
        SELECT l_returnflag,
               theta_cardinality(theta_sketch_agg(l_suppkey, 16))
                 AS theta_suppliers,
               theta_cardinality(theta_sketch_agg(l_partkey, 16))
                 AS theta_parts,
               CAST(kll_median(kll_sketch_agg_double(
                      CAST(l_quantity AS DOUBLE), 65535)) AS BIGINT)
                 AS median_qty
        FROM lineitem_sk GROUP BY l_returnflag
        """
    )


@query(
    "incremental_agg_maintenance",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           count(o_totalprice) AS n,
           round(sum(o_totalprice), 2) AS total,
           round(min(o_totalprice), 2) AS min_value,
           round(max(o_totalprice), 2) AS max_value,
           round(sum(o_totalprice) / count(o_totalprice), 4) AS mean_value
    FROM orders GROUP BY month
    """,
)
def incremental_agg_maintenance(spark, sf_dir):
    """Incremental aggregate maintenance: the monthly revenue rollup is
    built from pre-2000 history ONCE, then brought current by merging
    the state of the 2000+ delta — and must equal the full recompute
    (the oracle) exactly, proving the state columns are mergeable
    (the plain-measure analogue of sketch reaggregation)."""
    from .operators.incremental import agg_state, finalize, merge_states

    (orders,) = _t(spark, sf_dir, "orders")
    month = F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
        "month"
    )
    rows = orders.select(month, "o_totalprice", "o_orderdate")
    cutoff = F.lit("2000-01-01").cast("timestamp")
    old_state = agg_state(
        rows.filter(F.col("o_orderdate") < cutoff), ["month"], "o_totalprice"
    )
    delta_state = agg_state(
        rows.filter(F.col("o_orderdate") >= cutoff), ["month"], "o_totalprice"
    )
    return finalize(merge_states(old_state, delta_state, ["month"]), ["month"])


@query(
    "stream_mor_upserts",
    """
    WITH ranked AS (
      SELECT user_id, value, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, round(value, 2) AS last_value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def stream_mor_upserts(spark, sf_dir):
    """Streaming ingestion into a merge-on-read table: events replay
    through ``foreachBatch`` appending full-row upserts (errors =
    tombstones) to a log directory, then the MoR read merges
    latest-per-user — equal to the batch window oracle.  The lakehouse
    CDC write path end to end: checkpointed availableNow drain,
    append-only log, read-time latest-wins."""
    import os
    import tempfile

    from .queries_ext import _sink_name
    from .sources.upsert import merge_on_read
    from .streaming import read_events_stream

    logdir = os.path.join(tempfile.gettempdir(), _sink_name("mor_log"), "log")
    ckpt = os.path.join(os.path.dirname(logdir), "ckpt")
    stream = read_events_stream(spark, sf_dir).select(
        F.col("user_id"),
        F.round("value", 2).alias("last_value"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
        (F.col("event_type") == "error").alias("_deleted"),
    )

    def _append(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(logdir)

    q = (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    log = spark.read.parquet(logdir)
    base = local_frame(spark, [], log.schema)
    return merge_on_read(base, log, "user_id", "ts", tiebreak="seq")


@query(
    "dedup_chunk_level",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 20 = 0
    ),
    toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM corpus),
    chunks AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(ws, u.s, u.s + 127), ' ')) AS fp
      FROM toks, UNNEST([s for s in range(1, len(ws) + 1, 112)]) AS u(s)
      WHERE len(ws) >= 1)
    SELECT fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks
    FROM chunks GROUP BY fp
    HAVING count(DISTINCT doc_id) > 1
    """,
)
def dedup_chunk_level(spark, sf_dir):
    """Sub-document (chunk-level) exact dedup: 128-token chunks
    fingerprinted and grouped — finds boilerplate shared across
    documents that whole-document dedup misses.  Chunks never leave
    the row until reduced to a 128-bit fingerprint, so the shuffle
    carries (md5, doc_id), not text."""
    from .operators.prep import chunk_documents

    (documents,) = _t(spark, sf_dir, "documents")
    # the synthetic corpus has no exact text duplicates; replay a
    # deterministic 5% of it under shifted ids so the operator's
    # cross-document detection has ground truth on both sides
    corpus = documents.select("doc_id", "text").unionByName(
        documents.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    chunks = chunk_documents(corpus, "doc_id", "text", 128, 16)
    return (
        chunks.select("doc_id", F.md5("chunk_text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "quality_expectations_orders",
    """
    SELECT 'orderkey_not_null' AS rule, 'o_orderkey' AS "column",
           sum((o_orderkey IS NULL)::INT) AS violations,
           sum((o_orderkey IS NULL)::INT) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique', 'o_orderkey',
           count(o_orderkey) - count(DISTINCT o_orderkey),
           count(o_orderkey) - count(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'totalprice_positive', 'o_totalprice',
           sum((o_totalprice IS NULL OR o_totalprice < 0
                OR o_totalprice > 1000000)::INT),
           sum((o_totalprice IS NULL OR o_totalprice < 0
                OR o_totalprice > 1000000)::INT) = 0
    FROM orders
    UNION ALL
    SELECT 'status_domain', 'o_orderstatus',
           sum((o_orderstatus IS NULL
                OR o_orderstatus NOT IN ('F', 'O', 'P'))::INT),
           sum((o_orderstatus IS NULL
                OR o_orderstatus NOT IN ('F', 'O', 'P'))::INT) = 0
    FROM orders
    """,
)
def quality_expectations_orders(spark, sf_dir):
    """Declarative data-quality gate over orders: null, uniqueness,
    range and domain rules — all compiled into one conditional
    aggregation pass."""
    from .operators.expectations import check_expectations

    (orders,) = _t(spark, sf_dir, "orders")
    return check_expectations(
        orders,
        [
            {"name": "orderkey_not_null", "kind": "not_null",
             "column": "o_orderkey"},
            {"name": "orderkey_unique", "kind": "unique",
             "column": "o_orderkey"},
            {"name": "totalprice_positive", "kind": "in_range",
             "column": "o_totalprice", "lo": 0, "hi": 1000000},
            {"name": "status_domain", "kind": "accepted_values",
             "column": "o_orderstatus", "values": ["F", "O", "P"]},
        ],
    )


@query(
    "drift_psi_order_values",
    """
    WITH pb AS (
      SELECT least(9, greatest(0, CAST(floor((o_totalprice - 0)
               / 60000.0) AS INT))) AS bin
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    qb AS (
      SELECT least(9, greatest(0, CAST(floor((o_totalprice - 0)
               / 60000.0) AS INT))) AS bin
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    p AS (SELECT bin, count(*) * 1.0 / (SELECT count(*) FROM pb) AS f
          FROM pb GROUP BY bin),
    q AS (SELECT bin, count(*) * 1.0 / (SELECT count(*) FROM qb) AS f
          FROM qb GROUP BY bin),
    grid AS (SELECT CAST(i AS INT) AS bin FROM range(10) t(i)),
    j AS (
      SELECT grid.bin,
             coalesce(p.f, 0) + 1e-6 AS pp,
             coalesce(q.f, 0) + 1e-6 AS qq
      FROM grid LEFT JOIN p ON p.bin = grid.bin
      LEFT JOIN q ON q.bin = grid.bin
    )
    SELECT bin, round(pp, 6) AS p_baseline, round(qq, 6) AS q_current,
           round((pp - qq) * ln(pp / qq), 6) AS psi_contrib
    FROM j
    """,
)
def drift_psi_order_values(spark, sf_dir):
    """Distribution-drift alarm: PSI of order values, pre-1998 baseline
    vs 1998+ current, over 10 fixed bins — the snapshot-to-snapshot
    stability check between pipeline runs."""
    from .operators.expectations import psi_drift

    (orders,) = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return psi_drift(
        orders.filter(F.col("o_orderdate") < cutoff),
        orders.filter(F.col("o_orderdate") >= cutoff),
        "o_totalprice",
        lo=0.0,
        hi=600000.0,
        bins=10,
    )


@query(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
)
def event_transition_matrix(spark, sf_dir):
    """Markov transition counts between consecutive events per user —
    the sequence-analytics building block (one window + one count)."""
    from pyspark.sql import Window

    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "next_type")
    )


@query(
    "nonequi_band_join_pricing",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 930.0), ('mid', 930.0, 970.0),
             ('premium', 970.0, 100000.0)
    )
    SELECT band, count(*) AS n_parts,
           round(avg(p_retailprice), 2) AS avg_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band ORDER BY band
    """,
)
def nonequi_band_join_pricing(spark, sf_dir):
    """PURE non-equi join (no equality key at all): parts matched to
    price bands by interval containment — planned as a broadcast
    nested-loop join (the only correct strategy, and the cheap one:
    the band table is tiny).  Completes the join matrix next to
    equi/broadcast/semi/anti/range/as-of."""
    (part,) = _t(spark, sf_dir, "part")
    bands = local_frame(spark, 
        [("budget", 0.0, 930.0), ("mid", 930.0, 970.0),
         ("premium", 970.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
        .orderBy("band")
    )


@query(
    "parameterized_sql_priority",
    """
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders WHERE o_orderpriority = '2-HIGH'
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def parameterized_sql_priority(spark, sf_dir):
    """Named-parameter SQL (`spark.sql(..., args=...)`) — the
    injection-safe template surface; parameters bind as literals so
    Catalyst still constant-folds and pushes them into the scan."""
    (orders,) = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_p")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders_p WHERE o_orderpriority = :prio
        GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        args={"prio": "2-HIGH"},
    )


@query(
    "media_phash_near_dup",
    """
    WITH px AS (
      SELECT doc_id,
             [ ((doc_id % 40 * 6 + 3 * j + 0) % 256)
             + ((doc_id % 40 * 6 + 3 * j + 1) % 256)
             + ((doc_id % 40 * 6 + 3 * j + 2) % 256)
               for j in range(0, 64) ] AS s3
      FROM documents
    ),
    hashes AS (
      SELECT doc_id,
             array_to_string(
               [CASE WHEN 64 * s3[j + 1] > list_aggregate(s3, 'sum')
                     THEN '1' ELSE '0' END for j in range(0, 64)], '')
               AS ahash
      FROM px
    )
    SELECT ahash, count(*) AS n_docs
    FROM hashes GROUP BY ahash HAVING count(*) > 1
    """,
)
def media_phash_near_dup(spark, sf_dir):
    """Perceptual-hash (aHash) image near-dup: deterministic SYNTH
    images (one per document, 40 distinct motifs whose mod-256 wrap
    positions differ) fingerprinted by the
    integer-exact average hash, then grouped — colliding fingerprints
    = duplicate imagery.  The oracle regenerates pixels from the SYNTH
    closed form and replays the hash bit-for-bit."""
    from .multimodal import ahash_bits, synth_image_udf

    (documents,) = _t(spark, sf_dir, "documents")
    imgs = documents.select(
        "doc_id",
        synth_image_udf()(
            (F.col("doc_id") % 40) * 6, F.lit(8), F.lit(8)
        ).alias("data"),
    )
    return (
        ahash_bits(imgs, "data", "doc_id")
        .groupBy("ahash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@query(
    "pipeline_end_to_end_prep",
    f"""
    WITH surv AS (
      SELECT min(doc_id) AS doc_id
      FROM documents GROUP BY md5(text)
    ),
    quality AS (
      SELECT d.doc_id, len({_WS}) AS tok
      FROM documents d JOIN surv USING (doc_id)
      WHERE len({_WS}) BETWEEN 20 AND 1000
    ),
    split AS (
      SELECT doc_id, tok,
             CASE WHEN substring(md5('split-v1:' || CAST(doc_id AS VARCHAR)),
                                 1, 8) < '{_T1}' THEN 'train'
                  WHEN substring(md5('split-v1:' || CAST(doc_id AS VARCHAR)),
                                 1, 8) < '{_T2}' THEN 'val'
                  ELSE 'test' END AS split
      FROM quality
    ),
    packed AS (
      SELECT split, doc_id % 4 AS shard, tok,
             sum(tok) OVER (PARTITION BY split, doc_id % 4 ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - tok AS excl
      FROM split
    )
    SELECT split, count(DISTINCT (shard, CAST(floor(excl / 512) AS BIGINT)))
             AS n_packs,
           count(*) AS n_docs, sum(tok) AS sum_tokens
    FROM packed GROUP BY split ORDER BY split
    """,
)
def pipeline_end_to_end_prep(spark, sf_dir):
    """The flagship composed prep pipeline, end to end in one plan:
    exact dedup (min-id per content hash) -> quality gate (token
    bounds) -> deterministic 80/10/10 split -> contiguous sequence
    packing per split — summarized per split and hash-matched against
    a single chained SQL replay of every stage.  Each stage reuses the
    battery-proven recipe; the composition proves they pipeline
    without intermediate materialization."""
    from .functions.text import token_count
    from .operators.prep import pack_sequences, train_split

    (documents,) = _t(spark, sf_dir, "documents")
    surv = documents.groupBy(F.md5("text").alias("__fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    quality = (
        documents.join(surv.select("doc_id"), "doc_id")
        .select("doc_id", token_count("text").alias("tok"))
        .filter(F.col("tok").between(20, 1000))
    )
    split = train_split(
        quality, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="split-v1",
    )
    packed = pack_sequences(
        split,
        "doc_id",
        "tok",
        budget=512,
        num_shards=4,
        order_cols=["doc_id"],
        partition_cols=["split"],
    )
    return (
        packed.groupBy("split")
        .agg(
            F.countDistinct(F.struct("shard", "pack_id")).alias("n_packs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("sum_tokens"),
        )
        .orderBy("split")
    )


@query(
    "bitmap_exact_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS exact_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def bitmap_exact_distinct_users(spark, sf_dir):
    """EXACT re-aggregatable distinct counts via bitmap aggregates —
    the precise twin of the HLL pipeline: per (type, day, bucket)
    bitmaps built in parallel, OR-merged across days, counted, and
    bucket-summed.  Same persist-then-reaggregate shape as
    ``hll_merge_reaggregate`` with zero estimation error; the bitmap
    costs 4 KiB per 32k-id bucket instead of the sketch's fixed bytes —
    the classic exactness/size trade the sketch docs cite."""
    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    per_bucket = daily.groupBy("event_type", "bucket").agg(
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("n")
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("n").alias("exact_users"))
        .orderBy("event_type")
    )


@query(
    "string_edit_distance_pairs",
    """
    SELECT levenshtein(a.p_name, b.p_name) AS dist, count(*) AS n_pairs
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey <= 40 AND b.p_partkey <= 40
    GROUP BY dist ORDER BY dist
    """,
)
def string_edit_distance_pairs(spark, sf_dir):
    """Edit-distance (Levenshtein) histogram over name pairs — the
    fuzzy-string-matching primitive for entity resolution, on a
    bounded self-join block."""
    part, = _t(spark, sf_dir, "part")
    small = part.filter(F.col("p_partkey") <= 40).select("p_partkey", "p_name")
    a = small.select(
        F.col("p_partkey").alias("ka"), F.col("p_name").alias("na")
    )
    b = small.select(
        F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb")
    )
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .select(F.levenshtein("na", "nb").alias("dist"))
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("dist")
    )


@query(
    "hof_array_predicates",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           len(list_filter(ws, w -> w = 'join')) > 0 AS has_join,
           len(list_filter(ws, w -> len(w) >= 1)) = len(ws) AS all_nonempty,
           list_aggregate(list_transform(ws, w -> len(w)), 'sum') AS total_chars,
           len(list_filter(ws, w -> len(w) > 5)) AS long_tokens
    FROM t
    """,
)
def hof_array_predicates(spark, sf_dir):
    """Array higher-order predicates and folds (exists / forall /
    aggregate / filter) — the lambda-expression surface over token
    arrays, replayed with DuckDB list lambdas."""
    from .functions.text import tokens

    (documents,) = _t(spark, sf_dir, "documents")
    ws = tokens("text")
    return documents.select(
        "doc_id",
        F.exists(ws, lambda w: w == "join").alias("has_join"),
        F.forall(ws, lambda w: F.length(w) >= 1).alias("all_nonempty"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter(ws, lambda w: F.length(w) > 5)).cast("long").alias(
            "long_tokens"
        ),
    )


@query(
    "timeseries_forward_fill",
    """
    WITH holes AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT user_id, event_id,
           round(coalesce(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0), 2)
             AS filled
    FROM holes
    """,
)
def timeseries_forward_fill(spark, sf_dir):
    """Forward-fill imputation: every 7th reading nulled, then healed
    with the last non-null value per user in time order
    (``last_value(... ignoreNulls)`` over a running frame) — the
    standard gap-repair step before feature extraction; leading gaps
    fall back to a sentinel."""
    from pyspark.sql import Window

    (events,) = _t(spark, sf_dir, "events")
    holes = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return holes.select(
        "user_id",
        "event_id",
        F.round(
            F.coalesce(F.last("v", ignorenulls=True).over(w), F.lit(-1.0)), 2
        ).alias("filled"),
    )


@query(
    "semistructured_xml_and_maps",
    """
    SELECT o_orderkey,
           o_orderstatus AS xml_status,
           round(o_totalprice, 2) AS xml_price,
           o_orderpriority AS tag_priority,
           CAST(year(o_orderdate) AS VARCHAR) AS tag_year
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def semistructured_xml_and_maps(spark, sf_dir):
    """Semi-structured ingestion beyond JSON: an XML document per row
    parsed with ``from_xml``, and a ``k=v,k=v`` tag string parsed with
    ``str_to_map`` — both rebuilt from relational columns, so the
    oracle is the source table itself (parse(render(x)) == x)."""
    from pyspark.sql.types import StructType

    (orders,) = _t(spark, sf_dir, "orders")
    sel = orders.filter(F.col("o_orderkey") % 50 == 0)
    xml = F.concat(
        F.lit("<order><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><price>"),
        F.round("o_totalprice", 2).cast("string"),
        F.lit("</price></order>"),
    )
    tags = F.concat(
        F.lit("priority="),
        F.col("o_orderpriority"),
        F.lit(",year="),
        F.year("o_orderdate").cast("string"),
    )
    schema = "status STRING, price DOUBLE"
    parsed = sel.select(
        "o_orderkey",
        F.from_xml(xml, schema).alias("x"),
        F.str_to_map(tags, F.lit(","), F.lit("=")).alias("m"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.status").alias("xml_status"),
        F.round("x.price", 2).alias("xml_price"),
        F.col("m").getItem("priority").alias("tag_priority"),
        F.col("m").getItem("year").alias("tag_year"),
    )


@query(
    "udtf_partitioned_streaks",
    """
    WITH e4 AS (SELECT * FROM events WHERE user_id % 4 = 0),
    s AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                       IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS brk
      FROM e4
    ),
    g AS (
      SELECT user_id, event_type, ts, event_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM s
    ),
    runs AS (
      -- run start = lexicographic min of the (ts, event_id) PAIR: the
      -- run's first row in scan order.  min(ts), min(event_id) taken
      -- separately diverges from the engine when a tied-length run has
      -- a later first row but a smaller event_id deeper inside
      SELECT user_id, event_type, grp, count(*) AS len,
             min({'t': ts, 'e': event_id}) AS s0
      FROM g GROUP BY user_id, event_type, grp
    ),
    best AS (
      SELECT user_id, event_type AS best_type, len,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, s0.t, s0.e) AS rn
      FROM runs
    ),
    n AS (SELECT user_id, count(*) AS nr FROM e4 GROUP BY user_id)
    SELECT b.user_id, best_type, CAST(len AS INT) AS best_streak,
           CAST(nr AS INT) AS n_rows
    FROM best b JOIN n ON n.user_id = b.user_id WHERE rn = 1
    """,
)
def udtf_partitioned_streaks(spark, sf_dir):
    """Polymorphic table function over a PARTITIONED TABLE argument
    (Spark 4 UDTF): each user's events stream through one UDTF
    instance in time order, which emits the longest same-type streak —
    imperative per-group logic at the SQL level; the oracle rebuilds
    it with gap-group windows.  Runs on a pinned quarter of users
    (``user_id % 4 = 0``): the entry is the partitioned-TABLE UDTF API
    demonstration (its production twin is the all-JVM
    ``streak_longest_per_user``), so the Python row tax buys nothing
    past a representative slice (VERDICT r4 task 5)."""
    from .functions import udtfs

    (events,) = _t(spark, sf_dir, "events")
    udtfs.register(spark)
    events.filter(F.col("user_id") % 4 == 0).createOrReplaceTempView(
        "events_udtf_v"
    )
    return spark.sql(
        """
        SELECT * FROM longest_streak_udtf(
          TABLE(SELECT user_id, event_type, ts, event_id FROM events_udtf_v)
          PARTITION BY user_id ORDER BY (ts, event_id))
        """
    )


@query(
    "transpose_flag_metrics",
    """
    WITH m AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS sum_qty,
             round(avg(l_discount), 4) AS avg_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'sum_qty' AS key,
           (SELECT sum_qty FROM m WHERE l_returnflag = 'A') AS A,
           (SELECT sum_qty FROM m WHERE l_returnflag = 'N') AS N,
           (SELECT sum_qty FROM m WHERE l_returnflag = 'R') AS R
    UNION ALL
    SELECT 'avg_disc',
           (SELECT avg_disc FROM m WHERE l_returnflag = 'A'),
           (SELECT avg_disc FROM m WHERE l_returnflag = 'N'),
           (SELECT avg_disc FROM m WHERE l_returnflag = 'R')
    """,
)
def transpose_flag_metrics(spark, sf_dir):
    """DataFrame.transpose (Spark 4): metric rows become columns keyed
    by the former index column — the report-layout flip done by the
    engine instead of driver-side pivoting."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    m = (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
        .orderBy("l_returnflag")
    )
    return m.transpose("l_returnflag")


@query(
    "collation_case_insensitive_groups",
    """
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE c_mktsegment END AS seg
      FROM customer
    )
    SELECT lower(seg) AS segment, count(*) AS n
    FROM mixed GROUP BY lower(seg) ORDER BY segment
    """,
)
def collation_case_insensitive_groups(spark, sf_dir):
    """String collations (Spark 4): grouping under ``UTF8_LCASE``
    unifies case variants at the COMPARISON level (no normalization of
    the data) — half the segments are upper-cased, yet the collated
    grouping matches the lowercase oracle."""
    (customer,) = _t(spark, sf_dir, "customer")
    mixed = customer.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
        ).otherwise(F.col("c_mktsegment")).alias("seg")
    )
    return (
        mixed.groupBy(F.collate("seg", "UTF8_LCASE").alias("segc"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.lower("seg")).alias("segment"),
        )
        .select("segment", "n")
        .orderBy("segment")
    )


@query(
    "csv_and_url_parsing",
    """
    SELECT n_nationkey,
           n_name AS csv_name,
           n_regionkey AS csv_region,
           'warehouse.example.com' AS url_host,
           '/nation/' || n_name AS url_path,
           CAST(n_nationkey AS VARCHAR) AS url_id
    FROM nation
    """,
)
def csv_and_url_parsing(spark, sf_dir):
    """Text-codec surfaces: a CSV line per row parsed with
    ``from_csv``, and a URL parsed with ``parse_url``
    (host/path/query-parameter extraction) — both rendered from
    relational columns so the oracle is the source table (parse of
    render must round-trip)."""
    (nation,) = _t(spark, sf_dir, "nation")
    csv_line = F.concat_ws(
        ",", F.col("n_name"), F.col("n_regionkey").cast("string")
    )
    url = F.concat(
        F.lit("https://warehouse.example.com/nation/"),
        F.col("n_name"),
        F.lit("?id="),
        F.col("n_nationkey").cast("string"),
    )
    parsed = nation.select(
        "n_nationkey",
        F.from_csv(csv_line, "name STRING, region INT").alias("c"),
        url.alias("u"),
    )
    return parsed.select(
        "n_nationkey",
        F.col("c.name").alias("csv_name"),
        F.col("c.region").alias("csv_region"),
        F.parse_url("u", F.lit("HOST")).alias("url_host"),
        F.parse_url("u", F.lit("PATH")).alias("url_path"),
        F.parse_url("u", F.lit("QUERY"), F.lit("id")).alias("url_id"),
    )


@query(
    "ann_filtered_topk",
    """
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.v, c.v), 4) AS cos
      FROM v q JOIN v c ON c.vec_id <> q.vec_id AND c.label = 1
      WHERE q.vec_id < 3
    )
    SELECT query_id, neighbor_id, rnk AS rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored) t WHERE rnk <= 5
    """,
)
def ann_filtered_topk(spark, sf_dir):
    """FILTERED vector search (the vector-DB staple): top-k cosine
    neighbors restricted to a metadata predicate (label = 1).  The
    filter composes BEFORE the distance scan, so selectivity cuts the
    scored corpus — with the IVF index this is the partition-pruned
    probe plus a residual predicate."""
    from .operators.similarity import brute_force_topk

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    queries_df = embeddings.filter(F.col("vec_id") < 3)
    corpus = embeddings.filter(F.col("label") == 1)
    return brute_force_topk(
        corpus, queries_df, "vec_id", "embedding", k=5
    )


@query(
    "hybrid_rrf_search",
    f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest({_WS}) AS term FROM documents
      ) WHERE term IN ('hash', 'join', 'filter') GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
    dl AS (SELECT doc_id, len({_WS}) AS dl FROM documents),
    sc AS (SELECT count(*) AS n_docs, avg(len({_WS})) AS avgdl FROM documents),
    per AS (
      SELECT tf.doc_id AS doc_id,
             ln(1 + CAST(n_docs - dfreq + 0.5 AS DOUBLE)
                    / CAST(dfreq + 0.5 AS DOUBLE))
               * tf * CAST(2.2 AS DOUBLE)
               / (tf + CAST(1.2 AS DOUBLE)
                       * (1 - 0.75 + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS s
      FROM tf JOIN dfq ON tf.term = dfq.term
      JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN sc
    ),
    bm AS (
      -- rank on the 4dp score the Spark side exposes (round of the 6dp
      -- grid), so rank ties break identically in both engines
      SELECT doc_id, row_number() OVER (
               ORDER BY round(round(sum(s), 6), 4) DESC, doc_id) AS r_bm
      FROM per GROUP BY doc_id
      ORDER BY round(round(sum(s), 6), 4) DESC, doc_id LIMIT 50
    ),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    vec AS (
      SELECT neighbor_id, row_number() OVER (ORDER BY cos DESC, neighbor_id)
               AS r_v
      FROM (
        SELECT c.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.v, c.v), 4) AS cos
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id = 0) t
      ORDER BY cos DESC, neighbor_id LIMIT 50
    ),
    fused AS (
      SELECT coalesce(bm.doc_id, vec.neighbor_id) AS doc_id,
             round(coalesce(1.0 / (60 + r_bm), 0)
                   + coalesce(1.0 / (60 + r_v), 0), 6) AS rrf
      FROM bm FULL OUTER JOIN vec ON bm.doc_id = vec.neighbor_id
    )
    SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def hybrid_rrf_search(spark, sf_dir):
    """HYBRID retrieval: BM25 keyword ranks fused with embedding
    cosine ranks by reciprocal-rank fusion (1/(60+rank) per list) —
    the standard lexical+vector search combination, composed entirely
    from this engine's ranking and ANN operators."""
    from pyspark.sql import Window

    from .operators.ranking import bm25_scores
    from .operators.similarity import brute_force_topk

    documents, embeddings = _t(spark, sf_dir, "documents", "embeddings")
    bm_top = bm25_scores(
        documents, "doc_id", "text", ["hash", "join", "filter"], topk=50
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    bm = bm_top.select("doc_id", F.row_number().over(w).alias("r_bm"))
    vec = brute_force_topk(
        embeddings, embeddings.filter(F.col("vec_id") == 0),
        "vec_id", "embedding", k=50,
    ).select(F.col("neighbor_id"), F.col("rank").alias("r_v"))
    fused = bm.join(
        vec, bm["doc_id"] == vec["neighbor_id"], "full_outer"
    ).select(
        F.coalesce(bm["doc_id"], vec["neighbor_id"]).alias("doc_id"),
        F.round(
            F.coalesce(1.0 / (60 + F.col("r_bm")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("r_v")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)


@query(
    "hof_comparator_and_finish",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             list_transform(
               list_sort(list_transform(ws, w -> {'k': len(w), 'w': w})),
               s -> s.w),
             ' ') AS by_length,
           round(CASE WHEN len(ws) = 0 THEN NULL
                      ELSE list_aggregate(list_transform(ws, w -> len(w)),
                                          'sum') * 1.0 / len(ws) END,
                 4) AS mean_len
    FROM t
    """,
)
def hof_comparator_and_finish(spark, sf_dir):
    """The last higher-order-function shapes: ``array_sort`` with a
    CUSTOM comparator lambda (tokens ordered by length then value) and
    3-argument ``aggregate`` with a FINISH lambda (running (sum, count)
    struct finished into a mean) — the oracle emulates the comparator
    with a sortable struct projection."""
    from .functions.text import tokens

    (documents,) = _t(spark, sf_dir, "documents")
    ws = tokens("text")
    cmp_sorted = F.array_sort(
        ws,
        lambda a, b: F.when(F.length(a) < F.length(b), -1)
        .when(F.length(a) > F.length(b), 1)
        .when(a < b, -1)
        .when(a > b, 1)
        .otherwise(0),
    )
    mean_len = F.aggregate(
        ws,
        F.struct(
            F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("c")
        ),
        lambda acc, w: F.struct(
            (acc["s"] + F.length(w)).alias("s"), (acc["c"] + 1).alias("c")
        ),
        lambda acc: F.when(
            acc["c"] > 0, F.round(acc["s"] * 1.0 / acc["c"], 4)
        ),
    )
    return documents.select(
        "doc_id",
        F.array_join(cmp_sorted, " ").alias("by_length"),
        mean_len.alias("mean_len"),
    )


@query(
    "map_algebra_events",
    """
    SELECT user_id, upper(event_type) AS k, count(*) AS n,
           round(sum(value), 2) AS s
    FROM events GROUP BY user_id, upper(event_type)
    """,
)
def map_algebra_events(spark, sf_dir):
    """Map-column algebra: per-user maps built with
    ``map_from_entries``, keys rewritten with ``transform_keys`` and
    two maps merged value-wise with ``map_zip_with``, then exploded
    back to rows — which must equal the plain grouped aggregation the
    oracle computes (map construction round-trips losslessly)."""
    (events,) = _t(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("s"),
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m1"),
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "s"))
        ).alias("m2"),
    )
    upper_keys = lambda m: F.transform_keys(m, lambda k, v: F.upper(k))
    zipped = maps.select(
        "user_id",
        F.map_zip_with(
            upper_keys(F.col("m1")),
            upper_keys(F.col("m2")),
            lambda k, a, b: F.struct(a.alias("n"), b.alias("s")),
        ).alias("zm"),
    )
    return zipped.select(
        "user_id", F.explode("zm").alias("k", "v")
    ).select("user_id", "k", F.col("v.n").alias("n"), F.col("v.s").alias("s"))


@query(
    "nested_struct_operations",
    """
    SELECT o_orderkey, 'price' AS metric,
           round(o_totalprice, 2) AS value, o_orderstatus AS status
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey, 'priority_rank',
           CAST(CAST(substr(o_orderpriority, 1, 1) AS INT) AS DOUBLE),
           o_orderstatus
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def nested_struct_operations(spark, sf_dir):
    """Nested-struct surgery + the ``inline`` generator: a struct per
    order is extended with ``withField``, trimmed with ``dropFields``,
    packed into an array of metric structs and exploded back to rows —
    ending exactly where the oracle's flat UNION starts (nesting
    round-trips losslessly)."""
    (orders,) = _t(spark, sf_dir, "orders")
    sel = orders.filter(F.col("o_orderkey") % 100 == 0)
    base = sel.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("prio"),
            F.round("o_totalprice", 2).alias("price"),
        ).alias("s"),
    )
    reshaped = base.withColumn(
        "s",
        F.col("s")
        .withField(
            "priority_rank",
            F.substring("s.prio", 1, 1).cast("int").cast("double"),
        )
        .dropFields("prio"),
    )
    metrics = reshaped.select(
        "o_orderkey",
        F.col("s.status").alias("status"),
        F.array(
            F.struct(
                F.lit("price").alias("metric"), F.col("s.price").alias("value")
            ),
            F.struct(
                F.lit("priority_rank").alias("metric"),
                F.col("s.priority_rank").alias("value"),
            ),
        ).alias("ms"),
    )
    return metrics.select(
        "o_orderkey", F.inline("ms"), "status"
    ).select("o_orderkey", "metric", "value", "status")


# Spark 4 SQL-surface extension (recursive CTE, pipe syntax, dynamic
# SQL, SQL UDFs, scripting, LATERAL, approx_top_k, state-store reader)
# registers itself into the same QUERIES/ORACLES dicts on import.
from . import queries_sql4  # noqa: E402,F401  (registration side effect)
