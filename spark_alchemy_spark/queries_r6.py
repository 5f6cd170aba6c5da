"""Battery extension, round 6: the VERDICT-r5 task list — selective
semantic dedup under a planted-recall gate, semantic dedup AT INGEST
(streaming), the unified multimodal component collapse, and the CMS
sketch -> plan -> skew-mitigation loop.

* ``dedup_semantic_selective`` — the production SELECTIVE-nprobe path
  of ``semantic_dup_pairs`` gated by planted duplicates whose recall
  the oracle knows exactly: identical-vector plants (same centroid
  scores bit-for-bit => same clusters => recall structurally 100%) and
  scale-invariant 1.001x plants (cosine-identical direction), with the
  no-cartesian plan asserted inside the entry.
* ``stream_semantic_dedup`` — hashing-trick embedding + centroid
  assignment + within-cluster cosine against a STATIC standing index
  inside ``foreachBatch`` (stateless: zero state-store rows), held to
  an exact relational oracle at probe-all.
* ``media_dedup_components`` — image aHash near-dup pairs (banded
  Hamming over DISTINCT fingerprints) routed through the SAME guarded
  component collapse as the text/semantic families
  (``dedup.pairs_to_comp_map``): one canonical-survivor report across
  modalities.
* ``plan_cms_skew_salting`` — ``sketch_planned_join``: the left key
  sketch's max-frequency estimate (no groupBy, no key enumeration)
  flips the physical plan to the salted join when one key dominates,
  closing the sketch -> plan -> skew loop; both the decision and the
  salted shuffle key are plan-asserted.

Plus the distributed model-fitting tier (``operators/probe.py`` — the
quality-classifier loop of a curation pipeline, fit/evaluate/gate):

* ``quality_linear_probe`` — OLS via exact-integer normal equations in
  ONE aggregate pass, Cramer-solved on the driver, ppm-pinned.
* ``quality_probe_auc`` — tie-exact Mann-Whitney AUC of the probe's
  score, per-distinct-score histogram (no per-pair work).
* ``quality_probe_calibration`` — per-feature-band mean label vs mean
  prediction, integer ppm.
* ``prep_probe_gated_sample`` — deterministic md5-uniform sampling
  whose keep-rate is gated by the probe's score band (the
  quality-weighted downsampling shape of FineWeb/DCLM-style curation).

Same determinism conventions as queries.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .localframe import local_frame

from .operators.bpe import PRE_TOKEN_RE
from .queries import _t, query
from .queries_scale import _cc_close_sql

# ---------------------------------------------------------------------------
# Selective-nprobe semantic dedup under a planted-recall oracle
# ---------------------------------------------------------------------------

_PLANT_A = 10_000_000  # identical-vector plants: base_id + _PLANT_A
_PLANT_B = 20_000_000  # 1.001x-scaled plants:    base_id + _PLANT_B


@query(
    "dedup_semantic_selective",
    """
    SELECT CAST(2 * count(*) AS BIGINT) AS n_planted,
           CAST(1000000 AS BIGINT) AS exact_recall_ppm,
           TRUE AS scaled_recall_ok,
           TRUE AS plan_ok
    FROM embeddings
    WHERE vec_id % 20 = 0
      AND len(list_filter(CAST(embedding AS DOUBLE[]), x -> x <> 0)) > 0
    """,
)
def dedup_semantic_selective(spark, sf_dir):
    """The SELECTIVE cluster-pruned semantic-dedup path (nprobe <
    n_centroids — the configuration a 100 TB corpus actually runs),
    gated by planted duplicates whose recall the oracle knows exactly
    (VERDICT r5 task 4; the probe-all battery entries provably reduce
    to the exact kernel, so they never exercise this path).

    Every 20th vector is planted twice: an IDENTICAL copy (centroid
    scores equal bit-for-bit => same top-1 cluster => the candidate
    pair is generated at ANY nprobe => recall is structurally 100%,
    robust to testdata regeneration) and a 1.001x-SCALED copy
    (cosine-identical direction; float ranking slack absorbed by
    nprobe=2 and the >=99% threshold).  Found pairs are restricted to
    the planted (base, base+offset) ids, so natural duplicates —
    real but not oracle-replayable at selective nprobe — never enter
    the comparison.  ``plan_ok`` asserts the scale contract on the
    EXECUTED plan: no cartesian product, and the only nested-loop
    joins are the two centroid-broadcast scoring stages."""
    from .operators.dedup import _as_double, semantic_dup_pairs

    (emb,) = _t(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", _as_double("embedding").alias("embedding")
    )
    base = vecs.filter(
        (F.col("vec_id") % 20 == 0) & F.exists("embedding", lambda x: x != 0)
    ).localCheckpoint(eager=False)  # reused: two plants + the count
    plant_a = base.select(
        (F.col("vec_id") + F.lit(_PLANT_A)).alias("vec_id"), "embedding"
    )
    plant_b = base.select(
        (F.col("vec_id") + F.lit(_PLANT_B)).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    from .queries import _ivf_centroids_cached

    corpus = vecs.unionByName(plant_a).unionByName(plant_b)
    # session-shared centroid model (the IVF entries' cache): the
    # recall contract is centroid-agnostic — identical/scaled plants
    # share the base vector's centroid RANKING bit-for-bit under ANY
    # model, so reusing the trained model only removes re-training cost
    pairs = semantic_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.95,
        n_centroids=16, nprobe=2, seed=42,
        centroids=_ivf_centroids_cached(spark, sf_dir),
    ).localCheckpoint(eager=False)
    pairs.count()  # materialize so the audited plan is the executed one
    plan = (
        pairs._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    plan_ok = (
        "CartesianProduct" not in plan
        and plan.count("BroadcastNestedLoopJoin") <= 2
    )
    planted = pairs.filter(
        (F.col("id_a") < _PLANT_A)
        & (F.col("id_a") % 20 == 0)
        & (F.col("id_b") - F.col("id_a")).isin(_PLANT_A, _PLANT_B)
    )
    n_base = base.count()
    counts = planted.agg(
        F.sum(
            ((F.col("id_b") - F.col("id_a")) == _PLANT_A).cast("long")
        ).alias("a"),
        F.sum(
            ((F.col("id_b") - F.col("id_a")) == _PLANT_B).cast("long")
        ).alias("b"),
    ).collect()[0]
    n_a, n_b = int(counts["a"] or 0), int(counts["b"] or 0)
    return local_frame(spark, 
        [
            (
                2 * n_base,
                n_a * 1_000_000 // n_base if n_base else 0,
                (n_b * 1_000_000 // n_base if n_base else 0) >= 990_000,
                plan_ok,
            )
        ],
        "n_planted long, exact_recall_ppm long, "
        "scaled_recall_ok boolean, plan_ok boolean",
    )


# ---------------------------------------------------------------------------
# Streaming semantic dedup at ingest
# ---------------------------------------------------------------------------


@query(
    "stream_semantic_dedup",
    f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                               '{PRE_TOKEN_RE}')) AS w
      FROM documents),
    hb AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % 32 AS b,
             CASE WHEN CAST(('0x' || substr(md5(w), 5, 1)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM tok),
    agg AS MATERIALIZED (
      SELECT doc_id, b, CAST(sum(s) AS DOUBLE) AS v
      FROM hb GROUP BY doc_id, b),
    nrm AS MATERIALIZED (
      SELECT doc_id, sqrt(sum(v*v)) AS n FROM agg GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS ia, s.doc_id AS ist, sum(a.v * s.v) AS dot
      FROM agg a JOIN agg s ON a.b = s.b
      WHERE a.doc_id % 2 = 1 AND s.doc_id % 2 = 0
      GROUP BY 1, 2),
    dup AS MATERIALIZED (
      SELECT DISTINCT ia
      FROM dots JOIN nrm x ON x.doc_id = ia JOIN nrm y ON y.doc_id = ist
      WHERE x.n > 0 AND y.n > 0 AND round(dot / (x.n * y.n), 4) >= 0.95),
    arr AS (SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 1)
    SELECT lang, count(*) AS n_arrived,
           CAST(sum(CASE WHEN dup.ia IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped,
           CAST(count(*)
                - sum(CASE WHEN dup.ia IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_survived
    FROM arr LEFT JOIN dup ON dup.ia = arr.doc_id
    GROUP BY lang
    """,
)
def stream_semantic_dedup(spark, sf_dir):
    """Semantic dedup AT INGEST (VERDICT r5 task 5): odd-id documents
    stand in for today's crawl and arrive as a file stream; each
    micro-batch is embedded (hashing-trick, the model-free tier),
    centroid-assigned, candidate-joined against the STATIC even-id
    standing index on the cluster id, and verified by exact cosine —
    all inside ``foreachBatch``
    (``streaming.semantic_dedup_at_ingest``), so the query is
    STATELESS: zero state-store rows regardless of stream length
    (asserted in tests/test_streaming_multimodal.py).  Per-language
    arrival/drop totals are replay-order free.  Runs at probe-all so
    the oracle can replay the cosine RELATIONALLY (bucket equi-join
    dot product); the selective-nprobe production path is gated by
    ``dedup_semantic_selective``."""
    from .streaming import read_table_stream, semantic_dedup_at_ingest

    (documents,) = _t(spark, sf_dir, "documents")
    standing = documents.filter(F.col("doc_id") % 2 == 0)
    arrivals = read_table_stream(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 1
    )
    return semantic_dedup_at_ingest(
        arrivals, standing, dim=32, threshold=0.95, n_centroids=8, seed=42
    )


# ---------------------------------------------------------------------------
# Unified multimodal dedup: aHash pairs through the component collapse
# ---------------------------------------------------------------------------

_MOTIF_MOD = 200


def _media_bits_sql() -> str:
    """DuckDB replay of the synth image's aHash bits per distinct
    motif (the closed form of ``multimodal.synth_image_udf`` at 8x8,
    offset = (doc_id % {mod}) * 17 — same construction as the
    ``media_phash_near_dup`` oracle)."""
    return f"""
    docm AS MATERIALIZED (
      SELECT doc_id, doc_id % {_MOTIF_MOD} AS m FROM documents),
    px AS (
      SELECT m, [ ((m * 17 + 3 * j + 0) % 256)
                + ((m * 17 + 3 * j + 1) % 256)
                + ((m * 17 + 3 * j + 2) % 256) FOR j IN range(0, 64) ] AS s3
      FROM (SELECT DISTINCT m FROM docm)),
    h AS MATERIALIZED (
      SELECT m, array_to_string(
               [CASE WHEN 64 * s3[j + 1] > list_aggregate(s3, 'sum')
                     THEN '1' ELSE '0' END FOR j IN range(0, 64)], '') AS hs
      FROM px)"""


@query(
    "media_dedup_components",
    f"""
    WITH
    {_media_bits_sql()},
    dochash AS MATERIALIZED (
      SELECT d.doc_id, h.hs FROM docm d JOIN h USING (m)),
    hrep AS MATERIALIZED (
      SELECT hs, min(doc_id) AS rep FROM dochash GROUP BY hs),
    pairs AS MATERIALIZED (
      SELECT a.rep AS id_a, b.rep AS id_b
      FROM hrep a JOIN hrep b ON a.rep < b.rep
      WHERE len(list_filter([a.hs[j:j] <> b.hs[j:j] FOR j IN range(1, 65)],
                            x -> x)) <= 3),"""
    + _cc_close_sql()
    + """,
    repcomp AS (
      SELECT r.rep, coalesce(c.comp, r.rep) AS comp
      FROM hrep r LEFT JOIN comp c ON c.node = r.rep)
    SELECT comp, count(*) AS n_members, min(doc_id) AS min_id,
           max(doc_id) AS max_id, count(*) - 1 AS n_dropped
    FROM dochash JOIN hrep USING (hs) JOIN repcomp USING (rep)
    GROUP BY comp HAVING count(*) > 1
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM bad WHERE n > 0
    """,
)
def media_dedup_components(spark, sf_dir):
    """Multimodal dedup unified with the text/semantic machinery
    (VERDICT r5 task 6): deterministic SYNTH images (one per document,
    ``doc_id % 200`` motifs at stride 17 — the mod-256 pixel wrap
    collapses the 200 motifs onto ~74 distinct fingerprints whose
    Hamming-3 graph closes into a handful of multi-motif components,
    so components genuinely span id classes) are aHash-fingerprinted,
    near-dup pairs found by banded
    Hamming <= 3 (``dedup.bitstring_hamming_pairs`` — pigeonhole-
    complete at 4x16 bands) over the DISTINCT fingerprints (bounded by
    distinct imagery, never corpus-sized — the corpus only pays the
    fingerprint groupBy and the final expansion join), and the pair
    graph collapsed through the SAME guarded component machine as
    semantic/text dedup (``dedup.pairs_to_comp_map``), yielding one
    canonical-survivor report: (comp, n_members, min_id, max_id,
    n_dropped) per duplicate-image group."""
    from .multimodal import ahash_bits, synth_image_udf
    from .operators.dedup import bitstring_hamming_pairs, pairs_to_comp_map

    (documents,) = _t(spark, sf_dir, "documents")
    imgs = documents.select(
        "doc_id",
        synth_image_udf()(
            (F.col("doc_id") % _MOTIF_MOD) * 17, F.lit(8), F.lit(8)
        ).alias("data"),
    )
    hashes = ahash_bits(imgs, "data", "doc_id")
    reps = (
        hashes.groupBy("ahash")
        .agg(F.min("doc_id").alias("rep"))
        .localCheckpoint(eager=False)  # distinct imagery: motif-bounded
    )
    hp = bitstring_hamming_pairs(reps, "rep", "ahash", max_hamming=3)
    comp_map = pairs_to_comp_map(hp.select("id_a", "id_b")).withColumnRenamed(
        "node", "rep"
    )
    doc_comp = (
        hashes.join(reps, "ahash")
        .join(comp_map, "rep", "left")
        .select("doc_id", F.coalesce("comp", F.col("rep")).alias("comp"))
    )
    return (
        doc_comp.groupBy("comp")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
        )
        .filter(F.col("n_members") > 1)
    )


# ---------------------------------------------------------------------------
# CMS sketch -> plan -> skew mitigation
# ---------------------------------------------------------------------------


@query(
    "plan_cms_skew_salting",
    """
    WITH s AS (SELECT s_suppkey AS k FROM supplier)
    SELECT 'skewed_salted' AS join_case,
           (SELECT count(*) FROM (
              SELECT CASE WHEN l_suppkey % 3 = 0 THEN 1
                          ELSE l_suppkey END AS k
              FROM lineitem) l JOIN s USING (k)) AS n_rows,
           'salted' AS strategy, TRUE AS plan_ok
    UNION ALL
    SELECT 'uniform_merge',
           (SELECT count(*) FROM lineitem JOIN s ON l_suppkey = k),
           'merge', TRUE
    """,
)
def plan_cms_skew_salting(spark, sf_dir):
    """The sketch -> plan -> skew-mitigation loop closed (VERDICT r5
    task 8): ``functions/cms.py::sketch_planned_join`` reads the LEFT
    key sketch's max-frequency estimate (``cms_max_frequency`` — an
    upper bound from the sketch table alone, no groupBy, no key
    enumeration) and, when one key holds more than a fifth of the
    table, flips the merge join to the salted join the skew tier
    already implements (``operators/skew.py``).  Planted hot key:
    every ``l_suppkey % 3 = 0`` row remapped to supplier 1 (~a third
    of lineitem on one key — one reducer's worth of garbage without
    salting).  ``plan_ok`` asserts BOTH the decision and the physical
    evidence: the skewed case must sort-merge on a ``__salt``-extended
    key, the uniform control must sort-merge WITHOUT salt; join row
    counts prove the salted join is semantics-preserving."""
    from .functions.cms import sketch_planned_join

    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    n_left = lineitem.count()
    right = supplier.select(F.col("s_suppkey").alias("k"))
    skewed = lineitem.select(
        F.when(F.col("l_suppkey") % 3 == 0, 1)
        .otherwise(F.col("l_suppkey"))
        .alias("k"),
        "l_orderkey",  # salt hashes row content: must vary within a key
        "l_linenumber",
    )
    j1, p1 = sketch_planned_join(
        skewed, right, "k", broadcast_rows=1, salt_above=n_left // 5
    )
    n1 = j1.count()
    plan1 = j1._jdf.queryExecution().executedPlan().toString()
    ok1 = (
        p1["strategy"] == "salted"
        and "__salt" in plan1
        and "SortMergeJoin" in plan1
    )
    uniform = lineitem.select(
        F.col("l_suppkey").alias("k"), "l_orderkey", "l_linenumber"
    )
    j2, p2 = sketch_planned_join(
        uniform, right, "k", broadcast_rows=1, salt_above=n_left // 5
    )
    n2 = j2.count()
    plan2 = j2._jdf.queryExecution().executedPlan().toString()
    ok2 = (
        p2["strategy"] == "merge"
        and "__salt" not in plan2
        and "SortMergeJoin" in plan2
    )
    return local_frame(spark, 
        [
            ("skewed_salted", n1, p1["strategy"], ok1),
            ("uniform_merge", n2, p2["strategy"], ok2),
        ],
        "join_case string, n_rows long, strategy string, plan_ok boolean",
    )


# ---------------------------------------------------------------------------
# Distributed model fitting: linear probe -> AUC -> calibration -> gate
# ---------------------------------------------------------------------------

#: Shared oracle building blocks: integer features over documents,
#: one-pass moment sums (HUGEINT — determinant products reach ~1e31),
#: Cramer's rule with the sign factored out BEFORE the division so
#: truncation toward zero matches Spark's exact-int driver solve
#: bit-for-bit.  (sign via (a<0)<>(b<0), never a*b — the product would
#: overflow.)  ONE generator feeds the global, grouped, and
#: standing-half variants so the formulas cannot drift apart.
_PROBE_FEATS_SQL = """
    feats AS MATERIALIZED (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS x1,
             len(list_filter(string_split(text, ' '),
                             w -> len(w) >= 5)) AS x2
      FROM documents WHERE text IS NOT NULL)"""


def _probe_sums_sql(
    src: str = "feats", key: str = "", weight: str = "", name: str = "sums"
) -> str:
    """The ``sums`` CTE over ``src`` (the one-pass moment sums),
    optionally grouped by ``key``.  ``weight`` is an integer SQL
    expression over ``src`` columns for WEIGHTED least squares (every
    term picks up the weight, n becomes sum(w)) — mirroring
    ``operators/probe.py::linear_probe_sums(weight_col=...)``.
    ``name`` lets one oracle carry several sums variants (e.g. the
    weighted and unweighted systems side by side).  ``syy`` mirrors
    the engine's goodness-of-fit term (``_moment_aggs``)."""
    ks = f"{key}, " if key else ""
    kg = f" GROUP BY {key}" if key else ""
    w = f"({weight}) * " if weight else ""
    nw = f"sum({weight})" if weight else "count(*)"
    return f"""
    {name} AS MATERIALIZED (
      SELECT {ks}CAST({nw} AS HUGEINT) AS n,
             CAST(sum({w}x1) AS HUGEINT) AS s1,
             CAST(sum({w}x2) AS HUGEINT) AS s2,
             CAST(sum({w}n_chars) AS HUGEINT) AS sy,
             CAST(sum({w}CAST(n_chars AS HUGEINT) * n_chars)
                  AS HUGEINT) AS syy,
             CAST(sum({w}x1 * x1) AS HUGEINT) AS s11,
             CAST(sum({w}x1 * x2) AS HUGEINT) AS s12,
             CAST(sum({w}x2 * x2) AS HUGEINT) AS s22,
             CAST(sum({w}x1 * n_chars) AS HUGEINT) AS s1y,
             CAST(sum({w}x2 * n_chars) AS HUGEINT) AS s2y
      FROM {src}{kg})"""


def _probe_dets_sql(
    key: str = "", ridge: int = 0, name: str = "dets", src: str = "sums"
) -> str:
    """The Cramer determinant CTE over ``src`` (the formulas exist
    exactly once, here).  ``ridge`` adds an integer lambda to the two
    FEATURE diagonal entries (s11, s22) — never the intercept row —
    mirroring ``operators/probe.py::_solve_ppm``'s unpenalized-
    intercept ridge; 0 is pure OLS.  The label moments (sy, syy, s1y,
    s2y) and the lambda pass through so an R^2 select can replay
    ``operators/probe.py::r2_ppm_from_sums`` from this CTE alone."""
    ks = f"{key}, " if key else ""
    s11 = f"(s11 + {int(ridge)})" if ridge else "s11"
    s22 = f"(s22 + {int(ridge)})" if ridge else "s22"
    return f"""
    {name} AS MATERIALIZED (
      SELECT {ks}n, sy, syy, s1y, s2y, CAST({int(ridge)} AS HUGEINT) AS lam,
        n*({s11}*{s22} - s12*s12) - s1*(s1*{s22} - s12*s2)
          + s2*(s1*s12 - {s11}*s2) AS d,
        sy*({s11}*{s22} - s12*s12) - s1*(s1y*{s22} - s12*s2y)
          + s2*(s1y*s12 - {s11}*s2y) AS d0,
        n*(s1y*{s22} - s12*s2y) - sy*(s1*{s22} - s12*s2)
          + s2*(s1*s2y - s1y*s2) AS d1,
        n*({s11}*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
          + sy*(s1*s12 - {s11}*s2) AS d2
      FROM {src})"""


def _probe_cramer_sql(src: str = "feats", key: str = "") -> str:
    """``sums`` + ``dets`` CTEs over ``src``, optionally grouped by
    ``key`` (composition of the two single-definition pieces)."""
    return _probe_sums_sql(src, key) + "," + _probe_dets_sql(key)


def _probe_pin_sql(dk: str) -> str:
    """The ppm coefficient pin for determinant column ``dk``."""
    return (
        f"CAST(CASE WHEN ({dk} < 0) <> (d < 0) THEN -1 ELSE 1 END"
        f" * (abs({dk}) * 1000000 // abs(d)) AS BIGINT)"
    )


#: R^2 in ppm over a ``_probe_dets_sql`` CTE row, valid at lambda=0
#: ONLY: the OLS normal equations give SSE*det = syy*det -
#: sum(d_k*b_k), one det factor instead of the general det^2 — the
#: det^2 form (``operators/probe.py::r2_ppm_from_sums``, used for
#: ridge) overflows HUGEINT at this data scale (~1e39 > 2^127), while
#: this reduction stays under ~1e27 at sf0.01; the two are the SAME
#: rational scaled by det>0, so the trunc-toward-zero ppm pin is
#: bit-identical.
_PROBE_R2_NUM = "(n * (syy*d - (d0*sy + d1*s1y + d2*s2y)))"
_PROBE_R2_DEN = "(d * (n*syy - sy*sy))"
_PROBE_R2_SQL = (
    f"CAST(1000000 - CASE WHEN ({_PROBE_R2_NUM} < 0) <>"
    f" ({_PROBE_R2_DEN} < 0) THEN -1 ELSE 1 END"
    f" * (abs({_PROBE_R2_NUM}) * 1000000 // abs({_PROBE_R2_DEN}))"
    " AS BIGINT)"
)


_PROBE_COEF_SQL = (
    _PROBE_FEATS_SQL
    + ","
    + _probe_cramer_sql()
    + f""",
    coef AS MATERIALIZED (
      SELECT
        CAST((SELECT n FROM sums) AS BIGINT) AS n_rows,
        {_probe_pin_sql("d0")} AS b0_ppm,
        {_probe_pin_sql("d1")} AS b1_ppm,
        {_probe_pin_sql("d2")} AS b2_ppm
      FROM dets)
"""
)

_PROBE_CACHE: dict = {}


def _probe_feats(documents, extra=()):
    """The probe feature projection; ``extra`` columns ride along
    unchanged (e.g. a CDC op tag, so one grouped aggregate folds both
    sides of a change batch)."""
    words = F.split(F.col("text"), " ")
    return documents.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "lang",
        "n_chars",
        *extra,
        F.size(words).alias("x1"),
        F.size(F.filter(words, lambda w: F.length(w) >= 5)).alias("x2"),
    )


def _probe_coeffs(spark, sf_dir):
    """Session-shared fit (one aggregate pass + exact driver Cramer):
    the probe's three ppm coefficients, reused by the AUC /
    calibration / gated-sample consumers exactly like the BPE and
    IVF-centroid caches."""
    from .operators.probe import fit_linear_probe_ppm

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    (documents,) = _t(spark, sf_dir, "documents")
    res = fit_linear_probe_ppm(
        _probe_feats(documents), ["x1", "x2"], "n_chars"
    )
    _PROBE_CACHE[key] = (res["n"], res["coeffs_ppm"])
    return _PROBE_CACHE[key]


@query(
    "quality_linear_probe",
    f"""
    WITH {_PROBE_COEF_SQL}
    SELECT n_rows, b0_ppm, b1_ppm, b2_ppm FROM coef
    """,
)
def quality_linear_probe(spark, sf_dir):
    """Distributed closed-form model fitting: y = n_chars regressed on
    (word count, long-word count) via the normal equations — the
    sufficient statistics are SIX moment sums computed in ONE
    map-side-combinable aggregate over the corpus (the only
    distributed work; at 100 TB it shuffles d^2 longs per partition
    and nothing else), then Cramer's rule in EXACT Python integer
    arithmetic on the driver, coefficients pinned to integer ppm with
    the sign factored out of the truncating division so DuckDB's
    HUGEINT replay is bit-for-bit identical.  The label here is a
    deterministic derivative so the oracle can replay it; a real
    quality probe plugs annotation labels into the same machinery
    (``operators/probe.py::fit_linear_probe_ppm``)."""
    n, (b0, b1, b2) = _probe_coeffs(spark, sf_dir)
    return local_frame(spark, 
        [(n, b0, b1, b2)],
        "n_rows long, b0_ppm long, b1_ppm long, b2_ppm long",
    )


@query(
    "quality_probe_auc",
    f"""
    WITH {_PROBE_COEF_SQL},
    scored AS (
      SELECT b0_ppm + b1_ppm * f.x1 + b2_ppm * f.x2 AS s,
             CASE WHEN f.n_chars >= 250 THEN 1 ELSE 0 END AS pos
      FROM feats f CROSS JOIN coef),
    g AS MATERIALIZED (
      SELECT s, count(*) AS cnt, CAST(sum(pos) AS BIGINT) AS np
      FROM scored GROUP BY s),
    c AS (
      SELECT cnt, np,
             coalesce(sum(cnt) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM g)
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(cnt) - sum(np) AS BIGINT) AS n_neg,
           CAST((sum(np * (2 * cum + cnt + 1)) - sum(np) * (sum(np) + 1))
                * 1000000
                // (2 * sum(np) * (sum(cnt) - sum(np))) AS BIGINT) AS auc_ppm
    FROM c
    """,
)
def quality_probe_auc(spark, sf_dir):
    """The probe EVALUATED: tie-exact Mann-Whitney AUC of the fitted
    score against the binary label "long document" (n_chars >= 250).
    The scoring pass is pure codegen (three broadcast literals); the
    AUC is computed over the per-DISTINCT-SCORE histogram — one
    groupBy, one cumulative window over distinct scores, one final
    aggregate; NEVER a per-pair join (the naive formulation is
    O(n_pos * n_neg) — corpus-squared at scale).  Average-rank tie
    handling doubled into integer space keeps every intermediate
    exact (``operators/probe.py::rank_auc_ppm``)."""
    from .operators.probe import probe_score_ppm, rank_auc_ppm

    _, coeffs = _probe_coeffs(spark, sf_dir)
    (documents,) = _t(spark, sf_dir, "documents")
    scored = _probe_feats(documents).select(
        probe_score_ppm(coeffs, ["x1", "x2"]).alias("s"),
        (F.col("n_chars") >= 250).cast("int").alias("pos"),
    )
    return rank_auc_ppm(scored, "s", "pos")


@query(
    "quality_probe_calibration",
    f"""
    WITH {_PROBE_COEF_SQL}
    SELECT CAST(f.x1 // 16 AS BIGINT) AS band,
           count(*) AS n_docs,
           CAST(sum(f.n_chars) * 1000000 // count(*) AS BIGINT)
             AS mean_chars_ppm,
           CAST(CASE WHEN sum(b0_ppm + b1_ppm * f.x1 + b2_ppm * f.x2) < 0
                     THEN -((-sum(b0_ppm + b1_ppm * f.x1 + b2_ppm * f.x2))
                            // count(*))
                     ELSE sum(b0_ppm + b1_ppm * f.x1 + b2_ppm * f.x2)
                          // count(*) END AS BIGINT) AS mean_pred_ppm
    FROM feats f CROSS JOIN coef
    GROUP BY 1
    """,
)
def quality_probe_calibration(spark, sf_dir):
    """Calibration of the fitted probe: per word-count band (x1 DIV
    16), the mean observed label vs the mean prediction, both in
    integer ppm — the reliability-diagram aggregate a quality gate is
    monitored with.  One groupBy over the scored corpus; predictions
    stay in exact ppm integers end to end, so a drifting fit shows up
    as an exact, engine-replayable per-band gap."""
    _, coeffs = _probe_coeffs(spark, sf_dir)
    from .operators.probe import probe_score_ppm

    (documents,) = _t(spark, sf_dir, "documents")
    f = _probe_feats(documents).select(
        "x1", "n_chars", probe_score_ppm(coeffs, ["x1", "x2"]).alias("s")
    )
    return (
        f.groupBy(F.expr("x1 DIV 16").cast("long").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST(sum(n_chars) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("mean_chars_ppm"),
            # Spark DIV already truncates toward zero — the sign
            # factoring lives in the ORACLE only, where // floors
            F.expr("CAST(sum(s) DIV count(*) AS BIGINT)").alias(
                "mean_pred_ppm"
            ),
        )
    )


@query(
    "prep_probe_gated_sample",
    f"""
    WITH {_PROBE_COEF_SQL},
    gated AS (
      SELECT f.doc_id, f.n_chars,
             CASE WHEN b0_ppm + b1_ppm * f.x1 + b2_ppm * f.x2
                       < 200 * 1000000 THEN 'short'
                  WHEN b0_ppm + b1_ppm * f.x1 + b2_ppm * f.x2
                       < 350 * 1000000 THEN 'mid'
                  ELSE 'long' END AS band,
             CAST(('0x' || substr(md5(CAST(f.doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) % 1000000 AS u
      FROM feats f CROSS JOIN coef)
    SELECT band, count(*) AS n_docs,
           CAST(sum(CASE WHEN u < CASE band WHEN 'short' THEN 250000
                                            WHEN 'mid' THEN 500000
                                            ELSE 1000000 END
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN u < CASE band WHEN 'short' THEN 250000
                                            WHEN 'mid' THEN 500000
                                            ELSE 1000000 END
                    THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM gated GROUP BY band
    """,
)
def prep_probe_gated_sample(spark, sf_dir):
    """The probe GATING the corpus — quality-weighted downsampling
    (the FineWeb/DCLM curation shape): the fitted score bands each
    document (predicted-short docs keep 25%, mid 50%, long 100%), and
    the keep decision is a DETERMINISTIC md5-uniform draw per doc_id
    (replayable in any engine via the hex-prefix trick), so the
    sampled corpus is reproducible across runs, engines, and
    re-partitioning — no RNG state, no seed plumbing.  Map-only over
    the corpus (three broadcast literals + one hash per row), one
    groupBy for the report."""
    _, coeffs = _probe_coeffs(spark, sf_dir)
    from .operators.probe import probe_score_ppm

    (documents,) = _t(spark, sf_dir, "documents")
    s = probe_score_ppm(coeffs, ["x1", "x2"])
    band = (
        F.when(s < 200 * 1_000_000, "short")
        .when(s < 350 * 1_000_000, "mid")
        .otherwise("long")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
        ).cast("long")
        % 1_000_000
    )
    keep_ppm = (
        F.when(F.col("band") == "short", 250_000)
        .when(F.col("band") == "mid", 500_000)
        .otherwise(1_000_000)
    )
    g = _probe_feats(documents).select(
        "doc_id", "n_chars", band.alias("band"), u.alias("u")
    )
    kept = F.col("u") < keep_ppm
    return g.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
    )


@query(
    "quality_bigram_logprob",
    """
    WITH tok AS MATERIALIZED (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    bg AS (
      SELECT doc_id, unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
      FROM tok),
    dbk AS MATERIALIZED (
      SELECT doc_id, w1, w2, count(*) AS k FROM bg GROUP BY doc_id, w1, w2),
    bc AS MATERIALIZED (
      SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12 FROM dbk GROUP BY w1, w2),
    c1t AS MATERIALIZED (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
    c2t AS MATERIALIZED (
      SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM bc GROUP BY w2),
    t2 AS (SELECT CAST(sum(c12) AS BIGINT) AS nn FROM bc)
    SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
           round(-sum(k * ln((7 * CAST(c12 AS DOUBLE) * CAST(nn AS DOUBLE)
                              + 3 * CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))
                             / (10 * CAST(c1 AS DOUBLE)
                                * CAST(nn AS DOUBLE)))) / sum(k), 4) AS nll
    FROM dbk JOIN bc USING (w1, w2)
    JOIN c1t USING (w1) JOIN c2t USING (w2)
    CROSS JOIN t2
    GROUP BY doc_id
    """,
)
def quality_bigram_logprob(spark, sf_dir):
    """Corpus-trained INTERPOLATED BIGRAM LM quality score — the next
    rung above ``quality_unigram_logprob`` on the CCNet-style quality
    ladder: per-document average negative log-likelihood under
    p(w2|w1) = 0.7 * C(w1 w2)/C(w1 ·) + 0.3 * C(· w2)/N, i.e. bigram
    MLE backed off to the unigram marginal so unseen contexts never
    zero out.  The probability is assembled as ONE rational —
    (7*C12*N + 3*C1*C2) / (10*C1*N) — with the products computed in
    DOUBLE on both engines: below 2^53 (≈9e15, i.e. corpora up to
    ~1.3e9 bigrams for the 7*C12*N term) the double products are exact
    integers and both engines feed bit-identical values into the
    single ln(); beyond that precision degrades to ~1e-16 relative
    error instead of the silent int64 wrap Spark's non-ANSI long
    multiply would produce.  nll rounds at 4dp (the proven unigram
    contract).

    Scale shape: per-token rows exist only in the one (doc_id, bigram)
    count shuffle; the bigram vocabulary and its two marginals are
    re-aggregations of that much smaller table; the corpus total joins
    back as a 1-row broadcast.  No corpus re-scan, no driver scalars."""
    from .functions.text import tokens

    (documents,) = _t(spark, sf_dir, "documents")
    toks = documents.select("doc_id", tokens("text").alias("t"))
    # adjacent pairs as (w1, w2) COLUMNS — never a joined string, so a
    # token containing any would-be separator byte cannot corrupt the
    # marginals (round-6 review finding)
    prs = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") > 1,
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] AS w1, t[i] AS w2))"
                ),
            ).otherwise(
                F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)")
            )
        ).alias("pr"),
    ).select("doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    # (doc, bigram) counts feed FOUR consumers (bc, both marginals via
    # bc, the final join) — materialize once so the corpus explode runs
    # once, not per consumer; bc likewise feeds three aggregations
    dbk = (
        prs.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    bc = (
        dbk.groupBy("w1", "w2")
        .agg(F.sum("k").alias("c12"))
        .localCheckpoint(eager=False)
    )
    c1t = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2t = bc.groupBy("w2").agg(F.sum("c12").alias("c2"))
    tot = bc.agg(F.sum("c12").alias("nn"))
    j = (
        dbk.join(bc, ["w1", "w2"])
        .join(c1t, "w1")
        .join(c2t, "w2")
        .crossJoin(F.broadcast(tot))
    )
    # products ride DOUBLEs, not int64: 7*c12*nn wraps silently past
    # ~1.3e9 bigrams under Spark's non-ANSI long multiply (and errors
    # in DuckDB).  Below 2^53 the double products are exact integers,
    # so both engines still feed bit-identical values into ln(); past
    # that the result degrades gracefully to ~1e-16 relative error
    # instead of garbage (round-7 ADVICE finding).  Literals stay
    # INTEGER with explicit CASTs on the columns — a 7.0 literal is
    # DECIMAL in DuckDB but double in Spark, and the mixed-type
    # arithmetic diverges at 4dp rounding ties (measured).
    p = F.expr(
        "(7 * CAST(c12 AS DOUBLE) * CAST(nn AS DOUBLE)"
        " + 3 * CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))"
        " / (10 * CAST(c1 AS DOUBLE) * CAST(nn AS DOUBLE))"
    )
    return j.groupBy("doc_id").agg(
        F.sum("k").cast("bigint").alias("n_bigrams"),
        F.round(-F.sum(F.col("k") * F.log(p)) / F.sum("k"), 4).alias("nll"),
    )


@query(
    "ann_ivf_rebalance",
    """
    SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 2000)
                + (SELECT count(*) FROM embeddings
                   WHERE vec_id < 2000 AND vec_id % 4 = 0)
                AS BIGINT) AS n_rows,
           TRUE AS rows_conserved,
           TRUE AS split_happened,
           TRUE AS max_share_reduced,
           TRUE AS plant_refound
    """,
)
def ann_ivf_rebalance(spark, sf_dir):
    """The THIRD leg of the IVF index lifecycle (build →
    ``ann_ivf_index_append`` → REBALANCE): a hot list — here planted by
    scaled copies of one base vector, every ``vec_id % 4 == 0`` row
    contributing one plant with identical direction, so they all land
    in the base's list bit-for-bit — is split into two sublists by
    ``operators/similarity.py::rebalance_ivf_index``, which trains two
    sub-centroids on the hot list's OWN rows, keeps the parent's
    partition id for child A (dynamic partition overwrite then
    replaces exactly the parent partition — no stale rows, no cold-
    list rewrites), and updates the centroid + drift sidecars
    incrementally.

    The output row asserts the operator's contract as engine-checkable
    invariants (same style as ``dedup_semantic_selective``):
    ``rows_conserved`` — every indexed row survives the rewrite
    exactly once (count and distinct-id count both match);
    ``split_happened`` — the planted skew really tripped the 2x-mean
    threshold; ``max_share_reduced`` — the hottest list's corpus share
    strictly fell; ``plant_refound`` — a post-rebalance INDEXED query
    for the base vector at selective nprobe still returns a planted
    duplicate at cosine 1.0 (the split children are first-class
    probe targets)."""
    import os
    import tempfile

    from .operators.similarity import (
        append_ivf_index,
        ivf_topk_indexed,
        rebalance_ivf_index,
    )

    from .queries import _ivf_standing_index

    (emb,) = _t(spark, sf_dir, "embeddings")
    # parameter-bounded standing corpus (same convention as
    # ann_ivf_index_append's vec_id < 250 slice): the entry gates the
    # REBALANCE MECHANICS — split decision, partition-exact rewrite,
    # sidecar updates — not scan throughput, which build/append/query
    # entries already cover at full corpus size
    emb = emb.filter(F.col("vec_id") < 2000)
    base = emb.orderBy("vec_id").limit(1).localCheckpoint(eager=False)
    plants = (
        emb.filter(F.col("vec_id") % 4 == 0)
        .select((F.col("vec_id") + F.lit(30_000_000)).alias("vec_id"))
        .crossJoin(
            F.broadcast(base.select(F.col("embedding").alias("__b")))
        )
        .select(
            "vec_id",
            F.transform(
                "__b", lambda x: x * (1.0 + F.col("vec_id") % 97 / 100000.0)
            ).alias("embedding"),
        )
    )
    # r10: ride the session's GOLDEN standing index (the same
    # 2000-slice, 16-list, shared-centroid build the streaming
    # rebalance entry copies) and APPEND the plants as one batch,
    # instead of re-running a full build over standing + plants — the
    # index ends with the same rows (the plants all share one
    # direction, so they land in ONE list bit-for-bit under the shared
    # model and skew it past the 2x-mean threshold), and the standing
    # 2000-row assignment cost is paid once per session, not per entry.
    path = os.path.join(tempfile.gettempdir(), f"ivf_rebal_{os.getpid()}")
    _ivf_standing_index(spark, sf_dir, 2000, dest=path)
    append_ivf_index(plants, "vec_id", "embedding", path)
    # exact post-append row count from the index's own stats fold (one
    # 1-row parquet read instead of re-computing the plants union just
    # to count it); the conservation check below still re-counts the
    # persisted lists independently, so a stats-fold bug cannot
    # self-certify
    from .operators.similarity import read_index_stats

    n_corpus = read_index_stats(spark, path)[0]
    rep = rebalance_ivf_index(spark, path, "vec_id", split_ratio=2.0)
    # the conservation recount and the indexed probe are independent
    # bounded reads of the finished index — overlap them (guide §2.6)
    from .queries import _overlap

    conserve, top = _overlap(
        lambda: spark.read.parquet(path + "/lists")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("vec_id").alias("nid"),
        )
        .collect()[0],
        lambda: ivf_topk_indexed(
            spark,
            path,
            base.select("vec_id", "embedding"),
            "vec_id",
            "embedding",
            k=2,
            nprobe=2,
        )
        .filter(F.col("neighbor_id") >= 30_000_000)
        .orderBy(F.desc("cos"))
        .limit(1)
        .collect(),
    )
    n_after, n_ids = int(conserve["n"]), int(conserve["nid"])
    return local_frame(spark, 
        [
            (
                n_corpus,
                n_after == n_corpus and n_ids == n_corpus,
                rep["n_split"] >= 1,
                rep["max_share_after_ppm"] < rep["max_share_before_ppm"],
                bool(top) and float(top[0]["cos"]) >= 1.0,
            )
        ],
        "n_rows long, rows_conserved boolean, split_happened boolean, "
        "max_share_reduced boolean, plant_refound boolean",
    )


_PROBE_GROUPED_SQL = _PROBE_FEATS_SQL + "," + _probe_cramer_sql(key="lang")


@query(
    "quality_probe_by_lang",
    f"""
    WITH {_PROBE_GROUPED_SQL}
    SELECT lang, CAST(n AS BIGINT) AS n_rows,
           {_probe_pin_sql("d0")} AS b0_ppm,
           {_probe_pin_sql("d1")} AS b1_ppm,
           {_probe_pin_sql("d2")} AS b2_ppm
    FROM dets WHERE d <> 0
    """,
)
def quality_probe_by_lang(spark, sf_dir):
    """PER-GROUP model fitting in the same one-pass shape as the
    global probe: ONE groupBy aggregate computes every language's
    moment sums (map-side combinable; shuffle = n_langs x d^2 longs),
    then each tiny system is Cramer-solved in exact integers on the
    driver — how a curation pipeline fits per-language/per-source
    quality models without per-group corpus passes.  The driver
    collect is bounded by GROUP cardinality; singular groups are
    excluded identically on both sides
    (``operators/probe.py::fit_grouped_probes_ppm``)."""
    from .operators.probe import fit_grouped_probes_ppm

    (documents,) = _t(spark, sf_dir, "documents")
    fits = fit_grouped_probes_ppm(
        _probe_feats(documents), ["lang"], ["x1", "x2"], "n_chars"
    )
    rows = [
        (g["group"][0], g["n"], *g["coeffs_ppm"])
        for g in fits
        if g["coeffs_ppm"] is not None
    ]
    return local_frame(spark, 
        rows,
        "lang string, n_rows long, b0_ppm long, b1_ppm long, b2_ppm long",
    )


@query(
    "stream_probe_quality_gate",
    f"""
    WITH {_PROBE_FEATS_SQL},
    ef AS MATERIALIZED (SELECT * FROM feats WHERE doc_id % 2 = 0),
    {_probe_cramer_sql(src="ef")},
    coef AS MATERIALIZED (
      SELECT {_probe_pin_sql("d0")} AS b0_ppm,
             {_probe_pin_sql("d1")} AS b1_ppm,
             {_probe_pin_sql("d2")} AS b2_ppm
      FROM dets)
    SELECT lang,
           CASE WHEN b0_ppm + b1_ppm * x1 + b2_ppm * x2 >= 250 * 1000000
                THEN 'keep' ELSE 'drop' END AS decision,
           count(*) AS n
    FROM feats CROSS JOIN coef
    WHERE doc_id % 2 = 1
    GROUP BY 1, 2
    """,
)
def stream_probe_quality_gate(spark, sf_dir):
    """Model-scored quality gating AT INGEST: the probe is fitted on
    the STANDING corpus (even doc_ids — one aggregate pass + driver
    Cramer, exactly ``quality_linear_probe``'s machinery), its three
    ppm coefficients ship into the stream as broadcast literals, and
    every arriving document (odd doc_ids replayed as a file stream)
    is scored and gated map-side — the model-driven twin of
    ``stream_quality_at_ingest``'s heuristic gate.  The stream stays
    STATELESS except the final per-(lang, decision) count (complete
    mode); scoring adds zero state and zero Python.  A real pipeline
    swaps the label: same sums, same gate."""
    from .operators.probe import fit_linear_probe_ppm, probe_score_ppm
    from .streaming import read_table_stream, run_to_memory

    (documents,) = _t(spark, sf_dir, "documents")
    standing = _probe_feats(documents.filter(F.col("doc_id") % 2 == 0))
    res = fit_linear_probe_ppm(standing, ["x1", "x2"], "n_chars")
    coeffs = res["coeffs_ppm"]

    stream = read_table_stream(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 1
    )
    # the ONE feature definition (works on streaming DataFrames too)
    feats = _probe_feats(stream)
    gated = feats.select(
        "lang",
        F.when(
            probe_score_ppm(coeffs, ["x1", "x2"]) >= 250 * 1_000_000, "keep"
        )
        .otherwise("drop")
        .alias("decision"),
    )
    rollup = gated.groupBy("lang", "decision").agg(
        F.count(F.lit(1)).alias("n")
    )
    from .queries_ext import _sink_name

    return run_to_memory(
        rollup,
        _sink_name("probe_gate"),
        output_mode="complete",
        state_partitions=8,
        nodata_batches=False,  # complete-mode drain (see run_to_memory)
    )


@query(
    "prep_contrastive_triplets",
    f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                               '{PRE_TOKEN_RE}')) AS w
      FROM documents),
    hb AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % 32 AS b,
             CASE WHEN CAST(('0x' || substr(md5(w), 5, 1)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM tok),
    agg AS MATERIALIZED (
      SELECT doc_id, b, CAST(sum(s) AS DOUBLE) AS v
      FROM hb GROUP BY doc_id, b),
    nrm AS MATERIALIZED (
      SELECT doc_id, sqrt(sum(v*v)) AS n FROM agg GROUP BY doc_id),
    nz AS MATERIALIZED (SELECT doc_id, n FROM nrm WHERE n > 0),
    dots AS MATERIALIZED (
      SELECT a.doc_id AS ia, s.doc_id AS ib, sum(a.v * s.v) AS dot
      FROM agg a JOIN agg s ON a.b = s.b AND a.doc_id < s.doc_id
      GROUP BY 1, 2),
    cosv AS MATERIALIZED (
      SELECT ia, ib, round(dot / (x.n * y.n), 4) AS c
      FROM dots JOIN nz x ON x.doc_id = ia JOIN nz y ON y.doc_id = ib),
    pos AS (
      SELECT ia AS anchor_id, ib AS positive_id, c FROM cosv WHERE c >= 0.95
      UNION ALL
      SELECT ib, ia, c FROM cosv WHERE c >= 0.95),
    bestpos AS MATERIALIZED (
      SELECT anchor_id, positive_id, c AS pos_cos FROM (
        SELECT *, row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY c DESC, positive_id) AS r
        FROM pos) WHERE r = 1),
    gcos AS MATERIALIZED (
      -- pairs sharing NO hash bucket have dot exactly 0: synthesize
      -- them (LEFT JOIN + coalesce) so the negative argmax sees the
      -- same candidate grid the dense-vector scan sees
      SELECT bp.anchor_id, d.doc_id AS nid,
             round(coalesce(t.dot, 0) / (x.n * d.n), 4) AS c
      FROM bestpos bp
      JOIN nz x ON x.doc_id = bp.anchor_id
      CROSS JOIN nz d
      LEFT JOIN dots t ON t.ia = least(bp.anchor_id, d.doc_id)
                      AND t.ib = greatest(bp.anchor_id, d.doc_id)
      WHERE d.doc_id <> bp.anchor_id),
    bestneg AS (
      SELECT anchor_id, nid AS negative_id, c AS neg_cos FROM (
        SELECT *, row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY c DESC, nid) AS r
        FROM gcos WHERE c <= 0.5) WHERE r = 1)
    SELECT anchor_id, positive_id, negative_id, pos_cos, neg_cos
    FROM bestpos JOIN bestneg USING (anchor_id)
    """,
)
def prep_contrastive_triplets(spark, sf_dir):
    """Contrastive-training triplet mining — the training-pair factory
    of an embedding-model data pipeline: every document with a near
    duplicate becomes an ANCHOR, keeps its best POSITIVE (exact
    blocked-kernel pairs at cos >= 0.95, ties to lowest id), and is
    paired with its HARDEST NEGATIVE (highest cosine at
    round(cos,4) <= 0.5 — informative but truly negative), all over
    the model-free hashing-trick embeddings so the full triplet set
    replays relationally in any SQL engine
    (``operators/similarity.py::mine_contrastive_triplets``).

    Scale shape: positives ride the blocked BLAS kernel (probe-all =
    the oracle configuration; production swaps the selective
    ``semantic_dup_pairs`` path); the anchor set is DUPLICATE-bounded,
    so negatives cost one broadcast-anchors corpus pass (at 100 TB: an
    ANN top-k probe + the same <= neg_max filter, selection rule
    unchanged)."""
    from .operators.dedup import doc_hash_embeddings
    from .operators.similarity import mine_contrastive_triplets

    (documents,) = _t(spark, sf_dir, "documents")
    emb = doc_hash_embeddings(documents, "doc_id", "text", dim=32)
    return mine_contrastive_triplets(
        emb, "doc_id", "vec", pos_threshold=0.95, neg_max=0.5
    )


@query(
    "quality_probe_residuals",
    f"""
    WITH {_PROBE_COEF_SQL},
    scored AS (
      SELECT f.doc_id, f.lang, f.n_chars,
             b0_ppm + b1_ppm * f.x1 + b2_ppm * f.x2 AS pred_ppm
      FROM feats f CROSS JOIN coef),
    res AS (
      SELECT doc_id, lang, n_chars, pred_ppm,
             n_chars * 1000000 - pred_ppm AS residual_ppm
      FROM scored)
    SELECT doc_id, lang, n_chars, pred_ppm, residual_ppm FROM (
      SELECT *, row_number() OVER (ORDER BY abs(residual_ppm) DESC,
                                   doc_id) AS r
      FROM res) WHERE r <= 20
    """,
)
def quality_probe_residuals(spark, sf_dir):
    """Residual analysis of the fitted probe — the curation use of a
    cheap model beyond gating: the documents whose OBSERVED label most
    disagrees with the prediction are the anomalies worth auditing
    (formatting damage, mislabels, boilerplate the features do not
    see).  Residuals stay in exact integer ppm (observed*1e6 - pinned
    prediction), so the top-20 disagreement list — |residual| desc,
    doc_id tie-break — is bit-replayable in any engine.  Scoring is
    the map-only codegen pass; the top-k is one window."""
    _, coeffs = _probe_coeffs(spark, sf_dir)
    from .operators.probe import probe_score_ppm

    (documents,) = _t(spark, sf_dir, "documents")
    res = _probe_feats(documents).select(
        "doc_id",
        "lang",
        "n_chars",
        probe_score_ppm(coeffs, ["x1", "x2"]).alias("pred_ppm"),
    ).withColumn(
        "residual_ppm",
        F.col("n_chars") * F.lit(1_000_000).cast("long") - F.col("pred_ppm"),
    )
    # orderBy+limit, NOT a global window: Catalyst plans this as
    # TakeOrderedAndProject (per-partition partial top-k + one k-merge)
    # — a global row_number window would single-partition the sort
    return (
        res.orderBy(F.abs("residual_ppm").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "lang", "n_chars", "pred_ppm", "residual_ppm")
    )


from .queries_r3 import ANN_FULL_CORPUS_TOPK_ORACLE  # noqa: E402


@query("stream_ivf_append", ANN_FULL_CORPUS_TOPK_ORACLE)
def stream_ivf_append(spark, sf_dir):
    """STREAMING vector ingest into the persisted IVF index — the
    lifecycle composed end to end the way a live pipeline runs it:
    build on the standing corpus (vec_id < 250, the append entry's
    slice convention, with the session's shared trained model), then
    every arriving micro-batch (vec_id >= 250 replayed as a file
    stream) lands through ``append_ivf_index`` inside ``foreachBatch``
    — assign to the EXISTING centroids, append only the touched list
    partitions, fold the batch into the running drift baseline, and
    emit the per-batch drift report (stateless: no state store; the
    index directory IS the state).  Probing all lists afterwards must
    reduce exactly to brute force over the FULL corpus — the proof
    that stream-appended rows are immediately queryable with correct
    assignments."""
    import os
    import tempfile

    from .operators.similarity import (
        append_ivf_index,
        ivf_topk_indexed,
    )
    from .queries import _ivf_standing_index
    from .queries_ext import _sink_name
    from .streaming import read_table_stream

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    standing = embeddings.filter(F.col("vec_id") < 250)
    path = os.path.join(tempfile.gettempdir(), _sink_name("ivf_stream"))
    _ivf_standing_index(spark, sf_dir, 250, dest=path)
    arrivals = read_table_stream(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") >= 250
    )
    reports: list = []  # bounded: one dict per micro-batch

    def append_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        reports.append(
            append_ivf_index(
                batch_df, "vec_id", "embedding", path, batch_id=int(batch_id)
            )
        )

    from .streaming import _drain_foreach_batch

    # checkpointed drain + batch-id idempotence: a replayed micro-batch
    # after a mid-stream crash is a committed-id no-op, so the appends
    # are exactly-once (round-7 VERDICT task 1; proof in
    # stream_ivf_recovery / tests/test_r8_recovery.py)
    _drain_foreach_batch(
        arrivals, append_batch, state_partitions=8,
        checkpoint=path + "_chk",
    )
    assert reports and all(r["n_appended"] > 0 for r in reports)
    queries_df = embeddings.filter(F.col("vec_id") < 5)
    return ivf_topk_indexed(
        spark, path, queries_df, "vec_id", "embedding", k=10, nprobe=16
    )


@query(
    "stream_media_dedup",
    f"""
    WITH
    {_media_bits_sql()},
    em AS MATERIALIZED (
      SELECT DISTINCT doc_id % {_MOTIF_MOD} AS m FROM documents
      WHERE doc_id % 2 = 0),
    om AS MATERIALIZED (
      SELECT DISTINCT doc_id % {_MOTIF_MOD} AS m FROM documents
      WHERE doc_id % 2 = 1),
    close AS MATERIALIZED (
      SELECT DISTINCT o.m
      FROM om o JOIN h ho ON ho.m = o.m
      JOIN em e ON TRUE JOIN h he ON he.m = e.m
      WHERE len(list_filter([ho.hs[j:j] <> he.hs[j:j] FOR j IN range(1, 65)],
                            x -> x)) <= 3),
    arr AS (SELECT doc_id, lang, doc_id % {_MOTIF_MOD} AS m
            FROM documents WHERE doc_id % 2 = 1)
    SELECT lang, count(*) AS n_arrived,
           CAST(sum(CASE WHEN close.m IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped,
           CAST(count(*)
                - sum(CASE WHEN close.m IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_survived
    FROM arr LEFT JOIN close ON close.m = arr.m
    GROUP BY lang
    """,
)
def stream_media_dedup(spark, sf_dir):
    """MULTIMODAL dedup AT INGEST — the image twin of
    ``stream_semantic_dedup``: odd-id documents' (deterministic synth)
    images arrive as a stream, are aHash-fingerprinted per
    micro-batch, and checked against the STATIC even-id standing
    fingerprint index by banded Hamming <= 3 with an exact verify
    (``streaming.media_dedup_at_ingest`` — stateless foreachBatch; the
    standing index is the checkpointed DISTINCT-fingerprint band
    table, bounded by distinct imagery).  The oracle replays the aHash
    bits in closed form per motif (the ``media_*`` convention) and the
    Hamming-<=3 closure between odd and even motif fingerprints."""
    from .multimodal import synth_image_udf
    from .streaming import media_dedup_at_ingest, read_table_stream

    (documents,) = _t(spark, sf_dir, "documents")
    img = lambda df: df.select(
        "doc_id",
        "lang",
        synth_image_udf()(
            (F.col("doc_id") % _MOTIF_MOD) * 17, F.lit(8), F.lit(8)
        ).alias("data"),
    )
    standing = img(documents.filter(F.col("doc_id") % 2 == 0))
    arrivals = img(
        read_table_stream(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 2 == 1
        )
    )
    return media_dedup_at_ingest(
        arrivals, standing, "doc_id", "data", "lang", max_hamming=3
    )


from . import queries_r7  # noqa: E402,F401  (registration side effect)
