"""Battery extension, round 7: the VERDICT-r6 task list — ridge
regularization on the probe tier, the 32-merge BPE encoder under the
DuckDB gate, the drift-triggered streaming IVF rebalance, and the
√n-centroid selective semantic dedup law.

* ``quality_probe_ridge`` — the REGULARIZATION PATH of the linear
  probe from ONE corpus pass: the moment sums are lambda-independent,
  so OLS and every ridge point are just different exact-integer Cramer
  solves of the same system (``operators/probe.py::fit_ridge_path_ppm``).
  Ridge with an UNPENALIZED intercept: lambda lands on the two feature
  diagonal entries only, keeping the fit exact-integer and the DuckDB
  HUGEINT replay bit-for-bit.
* ``bpe_encode_fixed32`` — the merge-rank encoder exercised at 32
  merges under the oracle gate (the trainer entry stays at 8 merges
  because its oracle unrolls one CTE per ROUND; the encoder's oracle
  replays a FIXED literal merge table with one leftmost-replace pass
  per merge over DISTINCT words — linear oracle growth, no training
  CTEs).
* ``stream_ivf_rebalance`` — the self-maintaining index: planted
  skewed appends trip ``rebalance_ivf_index`` mid-stream from inside
  ``foreachBatch`` when the appended share of the hot list crosses a
  threshold; conservation + probe invariants are asserted the same
  way ``ann_ivf_rebalance`` asserts them.

Same determinism conventions as queries.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .localframe import local_frame

from .operators.bpe import PRE_TOKEN_RE
from .queries import _overlap, _t, query
from .queries_r6 import (
    _PROBE_COEF_SQL,
    _PROBE_FEATS_SQL,
    _probe_dets_sql,
    _probe_feats,
    _probe_pin_sql,
    _probe_sums_sql,
)

# ---------------------------------------------------------------------------
# Ridge-regularized probe (VERDICT r6 task 6)
# ---------------------------------------------------------------------------

#: the swept path: OLS, a mild lambda (~1e-1 of s11 at sf0.01), and a
#: heavy one — enough spread that the slope shrinkage is visible in ppm
_RIDGE_LAMBDAS = (0, 1_000_000, 100_000_000)


def _ridge_select_sql(lam: int, name: str) -> str:
    return f"""
    SELECT CAST({lam} AS BIGINT) AS ridge_lambda,
           CAST(n AS BIGINT) AS n_rows,
           {_probe_pin_sql("d0")} AS b0_ppm,
           {_probe_pin_sql("d1")} AS b1_ppm,
           {_probe_pin_sql("d2")} AS b2_ppm
    FROM {name}"""


@query(
    "quality_probe_ridge",
    f"""
    WITH {_PROBE_FEATS_SQL},
    {_probe_sums_sql()},
    {_probe_dets_sql(ridge=_RIDGE_LAMBDAS[0], name="dl0")},
    {_probe_dets_sql(ridge=_RIDGE_LAMBDAS[1], name="dl1")},
    {_probe_dets_sql(ridge=_RIDGE_LAMBDAS[2], name="dl2")}
    {_ridge_select_sql(_RIDGE_LAMBDAS[0], "dl0")}
    UNION ALL {_ridge_select_sql(_RIDGE_LAMBDAS[1], "dl1")}
    UNION ALL {_ridge_select_sql(_RIDGE_LAMBDAS[2], "dl2")}
    """,
)
def quality_probe_ridge(spark, sf_dir):
    """RIDGE-regularized linear probe — the regularization path from
    ONE corpus pass: the moment sums are the sufficient statistics for
    EVERY lambda, so the corpus is aggregated once and each lambda is
    an exact-integer Cramer solve with lambda added to the two feature
    diagonal entries (intercept unpenalized — standard ridge; the
    shape a 100 TB hyperparameter sweep needs, since a per-lambda
    refit would re-scan the corpus).  Near-collinear features (word
    count and long-word count are strongly correlated) make pure OLS
    fragile; a positive lambda keeps the system positive-definite.
    Everything stays exact integers, so DuckDB's HUGEINT replay of
    the same sums + the same diagonal shift matches bit-for-bit
    (``operators/probe.py::fit_ridge_path_ppm``)."""
    from .operators.probe import fit_ridge_path_ppm

    (documents,) = _t(spark, sf_dir, "documents")
    path = fit_ridge_path_ppm(
        _probe_feats(documents), ["x1", "x2"], "n_chars",
        list(_RIDGE_LAMBDAS),
    )
    return local_frame(spark, 
        [
            (r["ridge_lambda"], r["n"], *r["coeffs_ppm"])
            for r in path
        ],
        "ridge_lambda long, n_rows long, b0_ppm long, b1_ppm long,"
        " b2_ppm long",
    )


# ---------------------------------------------------------------------------
# Merge-rank encoder at 32 merges under the oracle gate (VERDICT r6 task 5)
# ---------------------------------------------------------------------------

#: A FIXED 32-merge table (hex byte symbols — common English digraphs
#: plus chained second-level merges), applied by the vocab-scale
#: merge-rank encoder.  The TRAINER entry stays at 8 merges because its
#: oracle must unroll one argmax CTE per training round; this table is
#: a literal, so the oracle replays each merge as ONE leftmost
#: non-overlapping string replace over DISTINCT words — linear oracle
#: growth in merge count, no training CTEs.  Chained entries ('7468' =
#: th exists only after merge 0; '7468'+'696E' joins two MERGED
#: symbols) exercise the encoder's rank machinery, not just byte pairs.
_FIXED_MERGES_32 = (
    ("74", "68"),    # t h  -> th
    ("69", "6E"),    # i n  -> in
    ("65", "72"),    # e r  -> er
    ("61", "6E"),    # a n  -> an
    ("72", "65"),    # r e  -> re
    ("6F", "6E"),    # o n  -> on
    ("61", "74"),    # a t  -> at
    ("65", "6E"),    # e n  -> en
    ("6F", "72"),    # o r  -> or
    ("65", "73"),    # e s  -> es
    ("7468", "65"),  # th e -> the
    ("696E", "67"),  # in g -> ing
    ("616E", "64"),  # an d -> and
    ("61", "6C"),    # a l  -> al
    ("61", "72"),    # a r  -> ar
    ("73", "74"),    # s t  -> st
    ("74", "6F"),    # t o  -> to
    ("6E", "74"),    # n t  -> nt
    ("65", "64"),    # e d  -> ed
    ("69", "74"),    # i t  -> it
    ("69", "73"),    # i s  -> is
    ("6F", "75"),    # o u  -> ou
    ("6C", "65"),    # l e  -> le
    ("6D", "65"),    # m e  -> me
    ("63", "68"),    # c h  -> ch
    ("73", "68"),    # s h  -> sh
    ("6F", "66"),    # o f  -> of
    ("6C", "6C"),    # l l  -> ll
    ("73", "65"),    # s e  -> se
    ("6F75", "74"),  # ou t -> out
    ("6572", "73"),  # er s -> ers
    ("7468", "696E"),  # th in -> thin (two MERGED symbols adjacent)
)


def _fixed32_encode_oracle() -> str:
    expr = "st"
    for l, r in _FIXED_MERGES_32:
        expr = f"replace({expr}, '({l})({r})', '({l}{r})')"
    return f"""
    WITH w0 AS MATERIALIZED (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text),
                                                '{PRE_TOKEN_RE}')) AS w
      FROM documents),
    s0 AS MATERIALIZED (
      SELECT w, '(' || array_to_string(
                         [substr(hex(w), i*2-1, 2)
                          FOR i IN range(1, len(hex(w))//2 + 1)],
                         ')(') || ')' AS st
      FROM w0),
    sN AS MATERIALIZED (SELECT w, {expr} AS st FROM s0),
    enc AS MATERIALIZED (
      SELECT w, len(string_split(st[2:len(st)-1], ')(')) AS nsub
      FROM sN),
    tok AS (
      SELECT lang, unnest(regexp_extract_all(lower(text),
                                             '{PRE_TOKEN_RE}')) AS w
      FROM documents)
    SELECT lang, count(*) AS n_words,
           CAST(sum(nsub) AS BIGINT) AS n_subtokens,
           CAST((sum(nsub) * 1000000) // count(*) AS BIGINT)
             AS subtokens_per_word_ppm
    FROM tok JOIN enc USING (w)
    GROUP BY lang
    """


@query("bpe_encode_fixed32", _fixed32_encode_oracle())
def bpe_encode_fixed32(spark, sf_dir):
    """The vocab-scale merge-rank encoder under the DuckDB gate at 32
    MERGES (4x the trainer entry's 8): a fixed literal merge table —
    including chained merges whose left symbol only exists after an
    earlier merge, and one joining two merged symbols — is applied by
    ``operators/bpe.py::encode_with_merge_ranks`` (ONE Arrow pass over
    DISTINCT words, cost flat in merge count), then encoded lengths
    join back onto the corpus word stream for per-lang subtoken
    accounting.  The oracle replays each merge as one leftmost
    non-overlapping replace over the parenthesis-wrapped hex-symbol
    state — exactly the sequential pass the encoder's monotonic-rank
    loop is proven bit-equal to (tests/test_bpe.py's cross-encoder
    law) — so oracle cost grows LINEARLY in merges, which is what
    lets this entry gate 32 of them where the trainer oracle caps at
    8 (VERDICT r6 task 5)."""
    from .operators.bpe import (
        bpe_words,
        corpus_word_stream,
        encode_with_merge_ranks,
    )

    (documents,) = _t(spark, sf_dir, "documents")
    words = bpe_words(documents)
    # checkpoint the VOCAB-bounded encoded table so the one Arrow pass
    # is paid exactly once (without the barrier, AQE re-inlines the
    # encoder subplan into every consuming stage — the audit showed
    # 4x ArrowEvalPython for one logical pass)
    enc = (
        encode_with_merge_ranks(words, list(_FIXED_MERGES_32))
        .select("w", "n_subtokens")
        .localCheckpoint(eager=False)
    )
    return (
        corpus_word_stream(documents, "text", "lang")
        .join(enc, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subtokens").cast("bigint").alias("n_subtokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_subtokens",
            F.expr("CAST((n_subtokens * 1000000) DIV n_words AS BIGINT)")
            .alias("subtokens_per_word_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Drift-triggered streaming IVF rebalance (VERDICT r6 task 2)
# ---------------------------------------------------------------------------


@query(
    "stream_ivf_rebalance",
    """
    SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 2000)
                + (SELECT count(*) FROM embeddings
                   WHERE vec_id < 2000 AND vec_id % 4 = 0)
                AS BIGINT) AS n_rows,
           CAST(3 AS BIGINT) AS n_batches,
           TRUE AS rows_conserved,
           TRUE AS rebalanced_mid_stream,
           TRUE AS max_share_reduced,
           TRUE AS plant_refound,
           TRUE AS stateless
    """,
)
def stream_ivf_rebalance(spark, sf_dir):
    """The SELF-MAINTAINING streaming index — the three IVF lifecycle
    legs composed the way a live ingest runs them (VERDICT r6 task 2):
    build on the standing corpus, append every arriving micro-batch,
    and trip the REBALANCE from inside ``foreachBatch`` the moment the
    running per-list sizes show a hot list past 2x the mean
    (``operators/similarity.py::make_streaming_ivf_maintainer``).  The
    trigger costs zero index scans: sizes are seeded once (one row per
    list) and advanced from each append report's ``list_counts``; only
    an actual split re-seeds.

    Arrivals replay as THREE mtime-ordered micro-batches: batch 0
    carries ALL the planted skew (scaled copies of one base vector —
    identical direction, so every plant lands in the base's list,
    pushing it robustly past 2x the mean and tripping the rebalance on
    the FIRST batch), batches 1-2 are own-direction duplicates that
    fatten every list in proportion and must NOT re-trip — one split,
    mid-stream, with later batches landing on the post-split layout
    and paying only the append (the steady-state cost profile a live
    ingest has; re-concentrating plants per batch made every batch pay
    a full rebalance, tripling this entry's wall cost for no extra
    coverage — VERDICT r7 task 2).  Invariants (engine-checkable, the
    ``ann_ivf_rebalance`` set plus the streaming ones):
    ``rows_conserved`` — every standing + streamed row is in the index
    exactly once after the mid-stream rewrite; ``rebalanced_mid_
    stream`` — the split fired on a non-final batch;
    ``max_share_reduced`` — the tripped rebalance strictly cut the
    hottest list's share; ``plant_refound`` — a post-stream INDEXED
    query at selective nprobe finds a planted duplicate at cosine 1.0;
    ``stateless`` — zero state-store operators (the index directory IS
    the state, same contract as ``stream_ivf_append``)."""
    import glob
    import os
    import tempfile

    from .operators.similarity import (
        ivf_topk_indexed,
        make_streaming_ivf_maintainer,
    )
    from .queries import _ivf_standing_index
    from .queries_ext import _sink_name
    from .streaming import _drain_foreach_batch

    (emb,) = _t(spark, sf_dir, "embeddings")
    standing = emb.filter(F.col("vec_id") < 2000).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = standing.orderBy("vec_id").limit(1).localCheckpoint(eager=False)
    # ONE agg for both expected counts (was two count() jobs — VERDICT
    # r7 task 2: this entry is job-count bound, not data bound)
    cnt = (
        emb.filter(F.col("vec_id") < 2000)
        .agg(
            F.count(F.lit(1)).alias("ns"),
            F.count_if(F.col("vec_id") % 4 == 0).alias("np"),
        )
        .collect()[0]
    )
    n_expected = int(cnt["ns"]) + int(cnt["np"])
    # batch 0 (vec_id%12 in {0,4}, ~2/3 of the plants): CONCENTRATED —
    # base's direction, all land in one list, guaranteed trigger trip
    # even if base's list starts well under the standing mean (the
    # per-residue variant was data-marginal: ~167 plants trip only if
    # the target list starts near the mean).  batches 1-2: SPREAD —
    # each plant duplicates its OWN source direction, landing in the
    # source row's list, so growth is proportional and nothing re-trips
    plants = (
        emb.filter((F.col("vec_id") < 2000) & (F.col("vec_id") % 4 == 0))
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("__own"),
        )
        .crossJoin(
            F.broadcast(base.select(F.col("embedding").alias("__b")))
        )
        .select(
            (F.col("vec_id") + F.lit(30_000_000)).alias("vec_id"),
            F.transform(
                F.when(F.col("vec_id") % 12 < 8, F.col("__b")).otherwise(
                    F.col("__own")
                ),
                lambda x: x * (1.0 + F.col("vec_id") % 97 / 100000.0),
            ).alias("embedding"),
            # batch key: concentrated mass first, spread halves after
            F.when(F.col("vec_id") % 12 < 8, F.lit(0))
            .when(F.col("vec_id") % 24 == 8, F.lit(1))
            .otherwise(F.lit(2))
            .alias("r"),
        )
    )

    # three mtime-ordered arrival files => three deterministic
    # micro-batches, written by ONE partitioned job (was three
    # coalesce(1) writes; each batch key hashes to one shuffle
    # partition so each r= dir gets exactly one file — VERDICT r7
    # task 2)
    arrivals_dir = os.path.join(
        tempfile.gettempdir(), _sink_name("ivf_rebal_arrivals")
    )
    plants.repartition("r").write.mode("overwrite").partitionBy(
        "r"
    ).parquet(arrivals_dir)
    for i in range(3):
        for leaf in glob.glob(
            os.path.join(arrivals_dir, f"r={i}", "*.parquet")
        ):
            os.utime(leaf, (1_700_000_000 + i * 100,) * 2)

    idx_path = os.path.join(tempfile.gettempdir(), _sink_name("ivf_rebal_idx"))
    _ivf_standing_index(spark, sf_dir, 2000, dest=idx_path)
    # trigger 2.5 / split 2.0: the selector cleans to <=2x the OLD
    # mean, but splitting grows the list count and LOWERS the mean, so
    # survivors can sit at ~2.1x the new mean — a trigger equal to the
    # selector re-fires on that residue every batch (profiled: 3
    # rebalances per drain, ~3s each, for one list's worth of actual
    # skew).  The gap absorbs the post-split residue; only genuine new
    # concentration (batch 0's planted mass lands at >3x) trips.
    maintain, log = make_streaming_ivf_maintainer(
        spark, idx_path, trigger_ratio=2.5, split_ratio=2.0
    )
    arrivals = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_dir + "/*")
    )
    progress: list = []
    # state_partitions=8: micro-batches are a few hundred rows — a
    # 32-task shuffle per batch stage is pure scheduling overhead
    # (the established drain-scaffold lever; VERDICT r7 task 2)
    _drain_foreach_batch(
        arrivals, maintain, state_partitions=8, progress_out=progress,
        checkpoint=idx_path + "_chk",
    )

    rebal_idx = [i for i, e in enumerate(log) if e["rebalanced"]]
    first_rb = log[rebal_idx[0]]["rebalance_report"] if rebal_idx else None
    # the conservation recount and the indexed probe are independent
    # bounded reads of the finished index — overlap them (guide §2.6)
    conserve, top = _overlap(
        lambda: spark.read.parquet(idx_path + "/lists")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("vec_id").alias("nid"),
        )
        .collect()[0],
        lambda: ivf_topk_indexed(
            spark, idx_path, base, "vec_id", "embedding", k=2, nprobe=2
        )
        .filter(F.col("neighbor_id") >= 30_000_000)
        .orderBy(F.desc("cos"))
        .limit(1)
        .collect(),
    )
    return local_frame(spark, 
        [
            (
                n_expected,
                len(log),
                int(conserve["n"]) == n_expected
                and int(conserve["nid"]) == n_expected,
                bool(rebal_idx) and rebal_idx[0] < len(log) - 1,
                first_rb is not None
                and first_rb["n_split"] >= 1
                and first_rb["max_share_after_ppm"]
                < first_rb["max_share_before_ppm"],
                bool(top) and float(top[0]["cos"]) >= 1.0,
                all(p["stateOperators"] == [] for p in progress),
            )
        ],
        "n_rows long, n_batches long, rows_conserved boolean, "
        "rebalanced_mid_stream boolean, max_share_reduced boolean, "
        "plant_refound boolean, stateless boolean",
    )


# ---------------------------------------------------------------------------
# Real-container (PNG) decode through the multimodal tier (VERDICT r6 task 8)
# ---------------------------------------------------------------------------


@query(
    "media_png_decode",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_images,
           CAST(count(*) AS BIGINT) AS n_matching,
           TRUE AS png_sniffed,
           TRUE AS features_equal
    FROM documents WHERE doc_id < 300
    """,
)
def media_png_decode(spark, sf_dir):
    """REAL image bytes through the multimodal tier: the same
    deterministic pixels land once in the SYNTH container and once as
    honest-to-spec PNG (pure-stdlib encoder, scanline filter cycling
    doc_id % 5 so all five filter paths appear), and
    ``multimodal.image_features`` must produce IDENTICAL features for
    both — decode is a container concern, the featurizer contract is
    pixels (``multimodal.png_decode``, public PNG spec, zlib only; no
    codec library).  ``png_sniffed`` additionally pins the magic-byte
    sniffer on the real header.  Engine-side the equality is exact
    (both paths round to 4dp on the same values); the oracle pins the
    count and the invariants.  Parameter-bounded slice (doc_id < 300)
    — the entry gates DECODE MECHANICS; scan-throughput lives in
    ``media_image_features``, which replays the featurizer
    value-for-value in SQL."""
    from .multimodal import png_image_udf, sniff_mime, synth_image_udf

    (documents,) = _t(spark, sf_dir, "documents")
    ids = (
        documents.select("doc_id")
        .filter(F.col("doc_id") < 300)
        .repartition("doc_id")  # spread the Arrow encode/decode tasks
    )
    w = (16 + F.col("doc_id") % 17).cast("int")
    h = (8 + F.col("doc_id") % 11).cast("int")
    synth = ids.select(
        "doc_id", synth_image_udf()(F.col("doc_id"), w, h).alias("media")
    )
    png = ids.select(
        "doc_id", png_image_udf()(F.col("doc_id"), w, h).alias("media")
    )
    from .multimodal import image_features

    # checkpoint each Arrow stage's output: without the barriers AQE
    # re-inlines the encode+featurize subtree into every consumer and
    # the slice pays the Python passes ~4x (same fix as
    # bpe_encode_fixed32's vocab table)
    png = png.localCheckpoint(eager=False)
    fs = image_features(synth, "media", "doc_id", thumb=8).localCheckpoint(
        eager=False
    )
    fp = image_features(png, "media", "doc_id", thumb=8).localCheckpoint(
        eager=False
    )
    sniff_ok = png.select(
        F.min((sniff_mime("media") == "image/png").cast("int")).alias("ok")
    )
    j = fs.alias("a").join(fp.alias("b"), "doc_id")
    eq = (
        (F.col("a.width") == F.col("b.width"))
        & (F.col("a.height") == F.col("b.height"))
        & (F.col("a.channels") == F.col("b.channels"))
        & (F.col("a.channel_mean") == F.col("b.channel_mean"))
        & (F.col("a.embedding") == F.col("b.embedding"))
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(eq.cast("long")).alias("n_matching"),
    )
    return agg.crossJoin(F.broadcast(sniff_ok)).select(
        F.col("n_images").cast("bigint").alias("n_images"),
        F.col("n_matching").cast("bigint").alias("n_matching"),
        (F.col("ok") == 1).alias("png_sniffed"),
        (F.col("n_images") == F.col("n_matching")).alias("features_equal"),
    )


# ---------------------------------------------------------------------------
# Streaming incremental probe fit (moment sums are a monoid)
# ---------------------------------------------------------------------------


@query(
    "stream_probe_incremental_fit",
    f"""
    WITH {_PROBE_COEF_SQL}
    SELECT CAST(3 AS BIGINT) AS n_batches, n_rows, b0_ppm, b1_ppm, b2_ppm,
           TRUE AS matches_batch_fit
    FROM coef
    """,
)
def stream_probe_incremental_fit(spark, sf_dir):
    """The quality probe fitted INCREMENTALLY over a document stream —
    the model-maintenance twin of ``stream_ivf_rebalance``'s index
    maintenance: each micro-batch contributes ONE moment-sum row (the
    same map-side-combinable aggregate the batch fit runs, on the
    batch alone), the driver folds it into the running sums
    (``operators/probe.py::merge_moment_sums`` — the sums are a MONOID
    in exact integers), and the refreshed coefficients come from the
    same Cramer solve.  No state store, no corpus rescan, no
    approximation: because the sufficient statistics add exactly, the
    post-stream fit is BIT-IDENTICAL to a from-scratch fit over the
    full corpus — which is exactly what the oracle (the batch fit's
    own Cramer SQL) checks, and what ``matches_batch_fit`` re-asserts
    engine-side against the session's batch fit.  The fold runs
    through the RESTART-RECOVERABLE maintainer under a threaded
    checkpoint (round 9: every streaming driver-state fold in the
    battery commits per batch to an atomic JSON record —
    ``make_streaming_probe_maintainer``; the kill/restart bit-identity
    proof is ``tests/test_r9_probe_recovery.py``).  At 100 TB this is
    how a live quality gate keeps its model current: d² longs per
    micro-batch cross the wire, one d²-integer record per commit,
    nothing else."""
    import glob
    import os
    import tempfile

    from .operators.probe import (
        _solve_ppm,
        make_streaming_probe_maintainer,
    )
    from .queries_ext import _sink_name
    from .queries_r6 import _probe_coeffs
    from .streaming import _drain_foreach_batch

    (documents,) = _t(spark, sf_dir, "documents")
    arrivals_dir = os.path.join(
        tempfile.gettempdir(), _sink_name("probe_fit_arrivals")
    )
    for i in range(3):  # three mtime-ordered replay files
        sub = os.path.join(arrivals_dir, f"f{i}")
        documents.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sub)
        for leaf in glob.glob(os.path.join(sub, "*.parquet")):
            os.utime(leaf, (1_700_000_000 + i * 100,) * 2)

    txn_dir = os.path.join(
        tempfile.gettempdir(), _sink_name("probe_fit_txn")
    )
    fold, st = make_streaming_probe_maintainer(
        txn_dir, ["x1", "x2"], "n_chars", prepare=_probe_feats
    )
    arrivals = (
        spark.readStream.schema(documents.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_dir + "/*")
    )
    _drain_foreach_batch(arrivals, fold, checkpoint=txn_dir + "_chk")

    n, coeffs = _solve_ppm(st["sums"], d=2)
    if coeffs is None:  # mirror fit_linear_probe_ppm's fit-path
        # contract (round-8 ADVICE: an opaque TypeError otherwise)
        raise ZeroDivisionError("singular normal-equation system")
    b_n, b_coeffs = _probe_coeffs(spark, sf_dir)  # the batch fit (cached)
    return local_frame(spark, 
        [
            (
                len(st["log"]),
                n,
                coeffs[0],
                coeffs[1],
                coeffs[2],
                n == b_n and coeffs == list(b_coeffs),
            )
        ],
        "n_batches long, n_rows long, b0_ppm long, b1_ppm long, "
        "b2_ppm long, matches_batch_fit boolean",
    )


# ---------------------------------------------------------------------------
# Weighted least squares probe (integer confidence weights)
# ---------------------------------------------------------------------------


@query(
    "quality_probe_weighted",
    f"""
    WITH {_PROBE_FEATS_SQL},
    {_probe_sums_sql(weight="1 + doc_id % 3")},
    {_probe_dets_sql()}
    SELECT CAST(n AS BIGINT) AS total_weight,
           {_probe_pin_sql("d0")} AS b0_ppm,
           {_probe_pin_sql("d1")} AS b1_ppm,
           {_probe_pin_sql("d2")} AS b2_ppm
    FROM dets
    """,
)
def quality_probe_weighted(spark, sf_dir):
    """WEIGHTED least squares probe — integer per-document weights
    (here the deterministic confidence stand-in ``1 + doc_id % 3``; a
    real pipeline plugs annotation confidence or source multiplicity)
    flow through the SAME one-pass moment aggregate: every sum picks
    up the weight, n becomes total weight, and the Cramer solve is
    unchanged — exactly equivalent to replicating each row w times
    without materializing replicas (the pytest law), and still
    bit-replayable in DuckDB HUGEINT.  One corpus pass, d² longs per
    partition, weights never leave the executors
    (``operators/probe.py::linear_probe_sums(weight_col=...)``)."""
    from .operators.probe import fit_linear_probe_ppm

    (documents,) = _t(spark, sf_dir, "documents")
    feats = _probe_feats(documents).withColumn(
        "w", 1 + F.col("doc_id") % 3
    )
    res = fit_linear_probe_ppm(
        feats, ["x1", "x2"], "n_chars", weight_col="w"
    )
    return local_frame(spark, 
        [(res["n"], *res["coeffs_ppm"])],
        "total_weight long, b0_ppm long, b1_ppm long, b2_ppm long",
    )


from . import queries_r8  # noqa: E402,F401  (registration side effect)
