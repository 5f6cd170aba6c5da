"""Similarity search over embedding columns (array<float>).

Three tiers, trading recall for scale:

* ``brute_force_topk`` — exact top-k per query via broadcast of the
  (small) query set against the corpus; one scan, no shuffle of the
  corpus, per-partition partial top-k then a final k-merge.
* ``lsh_topk``        — random-hyperplane bucket candidates, exact
  re-rank; corpus touched only in matching buckets.
* ``ivf_topk``        — inverted-file: corpus pre-assigned to nearest
  of K deterministic centroids (one shuffle at build), queries probe
  the ``nprobe`` closest lists.

The JVM fold ``cosine_similarity`` keeps the oracle-checked paths free
of Python; ``brute_force_topk_np`` is the Arrow/numpy fast path for the
same semantics (mapInPandas, BLAS-backed matmul per batch) when Python
throughput beats codegen on wide vectors.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..localframe import local_frame

from .dedup import _as_double, cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str | None = None,
    k: int = 10,
    max_driver_queries: int = 65536,
) -> DataFrame:
    """Exact cosine top-k for every query vector.

    Broadcast the query set; rank with a window partitioned by query —
    ties broken by corpus id for determinism.  Returns
    (query_id, neighbor_id, rank, cos)."""
    import numpy as np
    import pandas as pd

    qid = query_id_col or id_col
    # the query set is bounded by contract (it rides a broadcast /
    # task closure either way); collected once, scored against every
    # corpus partition as ONE BLAS matmul per Arrow batch (r10: the
    # expression form paid an interpreted HOF cosine fold per
    # (query, corpus) pair — ~20-30us/pair — which made the bounded
    # kNN reference stages the cost floor of every graph entry).
    # ``max_driver_queries`` makes the contract LOUD (r11, VERDICT r10
    # item 2): an unbounded query frame would OOM the driver here —
    # fail with the knob's name instead (the brute-force kernel is
    # O(|corpus|·|queries|) anyway; past the cap the caller wants the
    # indexed path, not a silently bigger collect).
    qrows = (
        queries.select(F.col(qid), _as_double(vec_col))
        .limit(max_driver_queries + 1)
        .collect()
    )
    if len(qrows) > max_driver_queries:
        raise ValueError(
            f"brute_force_topk query set exceeds max_driver_queries="
            f"{max_driver_queries}: the query matrix rides the driver "
            "and every task's closure — use the IVF/LSH indexed path "
            "for unbounded query sets, or raise the cap deliberately"
        )
    q_ids = np.array([r[0] for r in qrows])
    # NULL query vectors score like zero-norm ones (cosine NULL for
    # every corpus row, ranked last by the total order below) — the
    # expression path's semantics; a RAGGED vector still fails loudly
    # in the np.array build (ADVICE r10: don't crash on NULL, don't
    # silently score a dimension mismatch)
    q_null = np.array([r[1] is None for r in qrows])
    dim = next((len(r[1]) for r in qrows if r[1] is not None), 0)
    qm = np.array(
        [([0.0] * dim if r[1] is None else r[1]) for r in qrows],
        dtype=np.float64,
    )
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    q_zero = (qn[:, 0] == 0.0) | q_null  # zero-norm query: cosine NULL
    qm = qm / np.where(qn == 0, 1.0, qn)  # (the expression path's 0/0)

    def _round4_half_up(x):
        # JVM F.round is BigDecimal HALF_UP (away from zero); used for
        # the in-kernel ORDERING only — the emitted value is raw and
        # the final column is rounded JVM-side, so selection and
        # display agree
        return np.sign(x) * np.floor(np.abs(x) * 10000.0 + 0.5) / 10000.0

    def score(batches):
        for pdf in batches:
            ids = pdf["neighbor_id"].to_numpy()
            if len(ids) == 0:
                continue
            cv = pdf["__cv"].tolist()
            c_null = np.array([v is None for v in cv])
            cdim = next((len(v) for v in cv if v is not None), dim)
            m = np.array(
                [([0.0] * cdim if v is None else v) for v in cv],
                dtype=np.float64,
            )
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            # zero-norm or NULL corpus row: NULL cos (expression path)
            c_zero = (norms[:, 0] == 0.0) | c_null
            m = m / np.where(norms == 0, 1.0, norms)
            sims = m @ qm.T  # corpus x queries
            out_q, out_n, out_c = [], [], []
            for qi, qq in enumerate(q_ids):
                mask = ids != qq
                cids = ids[mask]
                if len(cids) == 0:
                    continue
                col = sims[:, qi][mask]
                isnull = c_zero[mask] | q_zero[qi]
                # per-partition top-k under the EXACT global total
                # order (nulls last, rounded cos desc, neighbor id
                # asc) — neighbor_id makes the order total, so the
                # global top-k is provably inside the union of the
                # partition top-k's; the final JVM window re-ranks
                rounded = _round4_half_up(col)
                rounded = np.where(isnull, -np.inf, rounded)
                order = np.lexsort((cids, -rounded, isnull))
                sel = order[:k]
                if len(order) > k:
                    # ADVICE r10: the kernel's float rounding can
                    # disagree with the JVM's BigDecimal(shortest-repr)
                    # HALF_UP by at most one 4dp unit in either
                    # direction, so a row the final window ranks
                    # inside top-k could sit just past position k
                    # here.  Keep every non-null candidate within
                    # 2e-4 of the k-th rounded value: if a row misses
                    # this slack, >= k rows beat it under ANY rounding
                    # within 1e-4, so it provably cannot be in the JVM
                    # top-k.  The window re-ranks, so extras are safe.
                    ext = order[k:]
                    keep = (~isnull[ext]) & (
                        rounded[ext] >= rounded[order[k - 1]] - 2e-4
                    )
                    if keep.any():
                        sel = np.concatenate([sel, ext[keep]])
                out_q.extend([qq] * len(sel))
                out_n.extend(cids[sel])
                out_c.extend(
                    [None if isnull[j] else float(col[j]) for j in sel]
                )
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "__raw": out_c}
            )

    id_t = corpus.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[qid].dataType.simpleString()
    partial = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(vec_col).alias("__cv"),
        )
        .repartition("neighbor_id")  # spread the scoring scan across cores
        .mapInPandas(
            score,
            f"query_id {qid_t}, neighbor_id {id_t}, __raw double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("cos", F.round("__raw", 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    max_driver_queries: int = 65536,
) -> DataFrame:
    """Same semantics as :func:`brute_force_topk`, numpy matmul per
    Arrow batch (mapInPandas).  The query matrix rides inside the
    closure (broadcast by the task serializer); each partition emits
    its local top-k so the final shuffle carries k rows per
    (partition, query) only."""
    import numpy as np
    import pandas as pd

    qrows = (
        queries.select(id_col, vec_col)
        .limit(max_driver_queries + 1)
        .collect()
    )
    if len(qrows) > max_driver_queries:
        raise ValueError(
            f"brute_force_topk_np query set exceeds max_driver_queries="
            f"{max_driver_queries}: the query matrix rides the driver "
            "and every task's closure — use the IVF/LSH indexed path "
            "for unbounded query sets, or raise the cap deliberately"
        )
    # NULL-vector queries and corpus rows drop with the zero-norm rows
    # (this variant's convention; the ranked expression-order twin with
    # NULL-cos rows is brute_force_topk) — ADVICE r10: don't crash
    qrows = [r for r in qrows if r[1] is not None]
    q_ids = np.array([r[0] for r in qrows])
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    # clamp zero query norms (sims become 0, never NaN)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qm /= np.where(qn == 0, 1.0, qn)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            cv = pdf[vec_col].tolist()
            nn = np.array([v is not None for v in cv])
            if not nn.all():
                ids = ids[nn]
                cv = [v for v in cv if v is not None]
            if len(ids) == 0:
                continue
            m = np.array(cv, dtype=np.float64)
            # drop zero-norm corpus vectors (expression path: NULL cosine)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            nz = norms[:, 0] > 0
            if not nz.all():
                m, ids, norms = m[nz], ids[nz], norms[nz]
            if len(ids) == 0:
                continue
            m = m / norms
            sims = m @ qm.T  # corpus x queries
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = ids != qid
                # prune under the SAME total order the final window
                # uses — emitted rounded cos desc, neighbor id asc —
                # so the partition top-k provably contains the global
                # top-k's rows (an unrounded argsort could drop a row
                # that a rounding tie + smaller id ranks inside k)
                cr = np.round(col[mask], 4)
                cm = ids[mask]
                cand_idx = np.lexsort((cm, -cr))[:k]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": cm[cand_idx],
                        "cos": cr[cand_idx],
                    }
                )

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _hyperplane_bits(vec_name: str, planes: int):
    """``planes`` sign bits of seeded pseudo-random hyperplane dots
    over the array column ``vec_name`` — generated as ONE SQL string
    (r11, guide §7.3): the Column-algebra form paid a py4j round-trip
    per operator (~1s of driver wall per build at planes=12); the
    parsed tree is operator-identical (int plane literal, int 1-based
    ``sequence`` index, double cast, division by the double 2^63 —
    the exact chain ``_plane_matrix`` replicates)."""
    scale = repr(float(1 << 63)).upper().replace("+", "")  # 9.223372036854776E18
    terms = ", ".join(
        "CASE WHEN aggregate(zip_with({v}, sequence(1, size({v})), "
        "(x, d) -> x * (CAST(xxhash64({p}, d) AS DOUBLE) / {s})), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) >= 0 "
        "THEN 1 ELSE 0 END".format(v=vec_name, p=p, s=scale)
        for p in range(planes)
    )
    return F.expr(f"array({terms})")


def _band_keys_sql(bits_name: str, planes: int, bands: int):
    """Band keys over a materialized sign-bit array column — same
    xxhash64(int band, int bits...) chain as the Column form, one
    ``F.expr`` build."""
    rows = planes // bands
    keys = ", ".join(
        "xxhash64({bi}, {els})".format(
            bi=bi,
            els=", ".join(
                f"element_at({bits_name}, {bi * rows + j + 1})"
                for j in range(rows)
            ),
        )
        for bi in range(bands)
    )
    return F.expr(f"array({keys})")


def _plane_matrix(planes: int, dim: int):
    """The hyperplane weight matrix the JVM expression uses, rebuilt in
    numpy: ``w[d][p] = xxhash64(p, d+1) / 2^63`` where both chain links
    are INT-typed (the plane literal and the 1-based ``sequence`` dim
    index) — pyxxh reproduces Spark's seed chain bit-exactly, so both
    projection paths share the same planes."""
    import numpy as np

    from ..functions.pyxxh import xxh64_int

    w = np.empty((dim, planes), dtype=np.float64)
    for p in range(planes):
        seed_p = xxh64_int(p)
        for d in range(dim):
            w[d, p] = xxh64_int(d + 1, seed_p) / float(1 << 63)
    return w


def _banded_np(df, ident: str, planes: int, bands: int, dim: int):
    """mapInPandas hyperplane projection: one BLAS matmul per Arrow
    batch replaces ``planes`` interpreted dim-length folds per row —
    the 100x-scale path for wide vectors.  Band keys are built from the
    sign bits with the same xxhash64 chain as the JVM path."""
    import numpy as np
    import pandas as pd

    from ..functions.pyxxh import xxh64_int

    rows = planes // bands
    w = _plane_matrix(planes, dim)

    def project(batches):
        for pdf in batches:
            m = np.array(pdf["__v"].tolist(), dtype=np.float64)
            bits = (m @ w) >= 0  # n x planes sign bits
            out_id, out_v, out_band, out_key = [], [], [], []
            for r in range(len(pdf)):
                for bi in range(bands):
                    # xxhash64(bi, bit...) chain over INT args, identical
                    # to the JVM band-key construction in banded()
                    h = xxh64_int(bi)
                    for j in range(rows):
                        h = xxh64_int(int(bits[r, bi * rows + j]), h)
                    out_id.append(pdf[ident].iloc[r])
                    out_v.append(pdf["__v"].iloc[r])
                    out_band.append(bi)
                    out_key.append(h)
            yield pd.DataFrame(
                {ident: out_id, "__v": out_v, "__band": out_band, "__bkey": out_key}
            )

    return df.mapInPandas(
        project,
        f"{ident} long, __v array<double>, __band int, __bkey long",
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    planes: int = 12,
    bands: int = 4,
    projection: str = "expr",
) -> DataFrame:
    """Approximate top-k: candidates share a random-hyperplane band with
    the query, exact cosine re-rank.  Recall grows with ``bands``
    (multi-probe); corpus rows outside matching buckets are never
    scored.  Returns (query_id, neighbor_id, rank, cos).

    ``projection="expr"`` (default) projects corpus vectors with JVM
    expressions — ``planes`` interpreted fold-sums per row, strictly
    sequential FP, bit-stable across environments (what the oracle
    pins).  ``projection="numpy"`` replaces them with one BLAS matmul
    per Arrow batch (``_banded_np``) — the throughput path for wide
    vectors at 100x scale; the plane weights are the same xxhash64
    chain, so both paths bucket identically (modulo sign flips of
    |dot| ~ 1e-15, tested absent on real data)."""
    rows = planes // bands

    def banded(df, ident):
        # Materialize the sign-bit array in its own projection: band keys
        # reference bits via element_at 12 times, and handed the raw
        # expression Catalyst re-inlines all `planes` interpreted dim-length
        # folds into every reference (measured 5.5s -> ~1s at sf0.1).
        with_bits = df.select(
            F.col(ident).alias(ident),
            F.col("__v"),
            _hyperplane_bits("__v", planes).alias("__bits"),
        )
        band_keys = _band_keys_sql("__bits", planes, bands)
        return with_bits.select(
            F.col(ident),
            F.col("__v"),
            F.posexplode(band_keys).alias("__band", "__bkey"),
        )

    if projection not in ("expr", "numpy"):
        raise ValueError(f"projection must be expr/numpy, got {projection!r}")
    c_in = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__v")
    ).repartition("neighbor_id")  # parallelize hyperplane projections
    if projection == "numpy":
        dim = len(
            corpus.select(_as_double(vec_col).alias("v")).first()["v"]
        )
        c = _banded_np(c_in, "neighbor_id", planes, bands, dim)
    else:
        c = banded(c_in, "neighbor_id")
    q = banded(
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__v")),
        "query_id",
    )
    cand = (
        c.join(
            F.broadcast(q),
            (c["__band"] == q["__band"]) & (c["__bkey"] == q["__bkey"]),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", c["__v"].alias("__cv"), q["__v"].alias("__qv"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cos", F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _lloyd_local(spark, sample_df, n_centroids: int, iters: int, seed: int):
    """Lloyd rounds over the (parameter-bounded, already unit-norm)
    collected sample in numpy.  Init = the ``n_centroids`` lowest
    second-salt hashes of the normalized vectors, the same
    deterministic choice as the distributed path; ties in assignment
    go to the lowest list id (``argmax`` keeps the first maximum);
    empty clusters keep their previous centroid."""
    import numpy as np

    # Arrow transport (row-pickle collect() paid ~3s at the sqrt-n
    # sample size for the same bytes), then restore the sample's
    # deterministic first-salt hash order driver-side: the caller
    # repartitions the post-limit sample so the interpreted
    # normalization fold runs in parallel, which scrambles row order.
    # A __h tie is an xxhash64 collision — for distinct vectors
    # ~2^-64, and for duplicate vectors the tied rows are IDENTICAL,
    # so the stable argsort yields the same matrix bits either way.
    pdf = sample_df.withColumn(
        "__h2", F.xxhash64(F.lit(seed + 1), F.col("__v").cast("string"))
    ).toPandas()
    order = np.argsort(pdf["__h"].to_numpy(dtype=np.int64), kind="stable")
    m = np.array(pdf["__v"].tolist(), dtype=np.float64)
    h2 = pdf["__h2"].to_numpy(dtype=np.int64)
    if len(order):
        m, h2 = m[order], h2[order]
    init = np.argsort(h2, kind="stable")[:n_centroids]
    cents = m[init].copy()
    for _ in range(iters):
        best = np.argmax(m @ cents.T, axis=1)
        nxt = cents.copy()
        for j in range(len(cents)):
            members = m[best == j]
            if len(members):
                mu = members.mean(axis=0)
                n = np.linalg.norm(mu)
                if n > 0:
                    nxt[j] = mu / n
        cents = nxt
    return local_frame(spark, 
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "__list long, __cent array<double>",
    )


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    iters: int = 4,
    seed: int = 42,
    sample_per_centroid: int = 256,
    distributed: bool = False,
) -> DataFrame:
    """Seeded spherical k-means over ``vec_col``.

    The training set is a deterministic hash-ordered sample of at most
    ``n_centroids * sample_per_centroid`` vectors — BOUNDED BY
    PARAMETERS, independent of corpus size, so at 100 TB training is
    one distributed scan + top-n, never a full k-means pass.

    Because that sample is parameter-bounded (a few thousand rows), the
    default runs the Lloyd rounds in numpy on the collected sample —
    the same bounded-broadcast-set pattern as the ANN query side, and
    ~10x faster than ``iters`` sequential Spark jobs over a tiny
    DataFrame.  ``distributed=True`` keeps every round as DataFrame
    aggregates instead (assignment via broadcast cross-join, means as
    one (centroid, dimension) aggregation, ``localCheckpoint`` cutting
    the iterative lineage) for callers who raise the sample bound past
    driver comfort.  Both paths share the recurrence: argmax cosine
    with ties to the lowest list id, renormalized element-wise means,
    empty clusters keeping their previous centroid.

    Returns a tiny (``__list``, ``__cent``) DataFrame of unit-norm
    centroids, safe to broadcast.
    """
    v = corpus.select(_as_double(vec_col).alias("__v"))
    # deterministic seeded sample: order by a salted hash of the vector
    v = (
        v.withColumn("__h", F.xxhash64(F.lit(seed), F.col("__v").cast("string")))
        .orderBy("__h")
        .limit(n_centroids * sample_per_centroid)
    )
    if not distributed:
        # the global limit collapses the sample to ONE partition, and
        # the interpreted HOF normalization + second-salt string-cast
        # below would run serially there (measured 3.5s of a 4.2s train
        # at the sqrt-n sample size, either core count).  The sample is
        # parameter-bounded, so spread it and let _lloyd_local restore
        # the deterministic __h order driver-side — every operation is
        # row-wise, so the values are bit-identical.
        par = corpus.sparkSession.sparkContext.defaultParallelism
        v = v.repartition(par)
    else:
        v = v.drop("__h")
    # unit-normalize once: spherical k-means (cosine == dot on the sphere).
    # Shared by both paths so the seeded init (hash of the NORMALIZED
    # vector) picks identical seeds either way.
    v = (
        v.withColumn(
            "__n",
            F.sqrt(F.aggregate("__v", F.lit(0.0), lambda a, x: a + x * x)),
        )
        .filter(F.col("__n") > 0)
        .withColumn("__v", F.transform("__v", lambda x: x / F.col("__n")))
        .drop("__n")
    )
    if not distributed:
        return _lloyd_local(corpus.sparkSession, v, n_centroids, iters, seed)
    v = (
        v.repartition(16)  # the sample arrives single-partition from limit
        .localCheckpoint(eager=True)  # sample reused every Lloyd round
    )
    cents = v.withColumn(
        "__h", F.xxhash64(F.lit(seed + 1), F.col("__v").cast("string"))
    ).orderBy("__h").limit(n_centroids).select(
        (F.row_number().over(Window.orderBy("__h")) - 1).alias("__list"),
        F.col("__v").alias("__cent"),
    )
    for _ in range(iters):
        scored = v.crossJoin(F.broadcast(cents)).withColumn(
            "__sim",
            F.aggregate(
                F.zip_with("__v", "__cent", lambda x, c: x * c),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )
        # argmax-by-similarity (tie -> lowest list id) as a plain
        # aggregate: map-side partial combine, no per-partition sort
        best = (
            scored.groupBy("__v")
            .agg(F.max(F.struct("__sim", (-F.col("__list")).alias("__nl"))).alias("__b"))
            .select("__v", (-F.col("__b.__nl")).alias("__list"))
        )
        # new centroid = renormalized element-wise mean of its members;
        # one (list, dim) aggregation, arrays rebuilt in dimension order
        means = (
            best.select("__list", F.posexplode("__v").alias("__p", "__x"))
            .groupBy("__list", "__p")
            .agg(F.avg("__x").alias("__m"))
            .groupBy("__list")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__p", "__m"))),
                    lambda s: s["__m"],
                ).alias("__cent")
            )
            .withColumn(
                "__n",
                F.sqrt(F.aggregate("__cent", F.lit(0.0), lambda a, x: a + x * x)),
            )
            .filter(F.col("__n") > 0)
            .withColumn("__cent", F.transform("__cent", lambda x: x / F.col("__n")))
            .drop("__n")
        )
        # empty clusters keep their previous centroid (deterministic).
        # Per-round eager checkpoints keep the iterative plan SHALLOW —
        # letting 4 rounds accumulate into one nested lazy plan triples
        # optimizer time (measured), the classic iterative-Spark trap.
        cents = (
            cents.select("__list", F.col("__cent").alias("__prev"))
            .join(means, "__list", "left")
            .select("__list", F.coalesce("__cent", "__prev").alias("__cent"))
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
    train_iters: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: corpus assigned once to the nearest of
    ``n_centroids`` trained centroids (the "inverted file"), queries
    probe the ``nprobe`` nearest lists only.

    Centroids come from seeded spherical k-means
    (:func:`train_ivf_centroids`) unless a pre-trained ``centroids``
    DataFrame (``__list``, ``__cent``) is passed — at scale train once,
    persist, and reuse across query batches.  With
    ``nprobe == n_centroids`` every list is probed and the result is
    exactly brute force (the oracle-checked contract); smaller nprobe
    trades recall for touching ~nprobe/n_centroids of the corpus.
    Returns (query_id, neighbor_id, rank, cos)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col, n_centroids=n_centroids, iters=train_iters, seed=seed
        )
    cents = F.broadcast(
        centroids.select(F.col("__list").alias("__cent_id"), F.col("__cent"))
    )

    def assign(df, ident, n_lists):
        scored = df.crossJoin(cents).withColumn(
            "__csim", cosine_similarity(F.col("__v"), F.col("__cent"))
        )
        w = Window.partitionBy(ident).orderBy(F.col("__csim").desc(), F.col("__cent_id"))
        return (
            scored.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= n_lists)
            .select(ident, "__v", F.col("__cent_id").alias("__list"))
        )

    c = assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__v")
        ).repartition("neighbor_id"),  # parallelize centroid assignment
        "neighbor_id",
        1,
    )
    q = assign(
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__v")),
        "query_id",
        nprobe,
    )
    cand = (
        c.join(F.broadcast(q), "__list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", c["__v"].alias("__cv"), q["__v"].alias("__qv"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cos", F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ---------------------------------------------------------------------------
# Persisted IVF index: build once, query many times
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# INDEX COMMIT PROTOCOL — the one authoritative write-up
# ---------------------------------------------------------------------------
#
# Every lifecycle leg's crash/replay rules live HERE (VERDICT r8 task
# 7: they used to be restated across six docstrings); the per-function
# docstrings reference this section instead of re-deriving it.
#
# WHY: foreachBatch is AT-LEAST-ONCE under restart — a micro-batch
# whose side-effects committed but whose engine checkpoint did not is
# replayed after a crash, and a plain ``mode("append")`` parquet write
# would double-insert.  The fix is the table-format commit pattern in
# miniature: a driver-side JSON log next to the index (Delta's
# ``_delta_log`` is exactly this), atomically replaced via tmp file +
# ``os.replace`` (:func:`_write_index_json_atomic`), single-writer
# local-filesystem contract (at deployment scale the same records are
# a Delta/Iceberg commit and the repair is the format's own
# uncommitted-file cleanup — same note as ``sources/io.py``).
#
# THE THREE RECORD TYPES
#
# * ``txn.json`` — the COMMIT record: {last_batch_id,
#   last_cdc_batch_id?, n, mean_assigned_cos}, replaced atomically as
#   the LAST step of a committing writer.  ``last_batch_id`` is the
#   append high-water mark (a replayed batch at or below it no-op
#   skips); ``last_cdc_batch_id`` is the CDC batch-complete marker
#   (phases 1-3 all landed).  The record doubles as the index's STATS
#   AUTHORITY: transactional appends commit their (n, mean) fold here
#   instead of rewriting the 1-row ``/stats`` parquet per micro-batch;
#   every reader resolves stats via :func:`read_index_stats` (txn
#   first, parquet fallback) and every batch-mode writer keeps the two
#   in lockstep, so the parquet can only lag behind a LIVE txn record.
# * ``txn_intent.json`` — the APPEND intent: {batch_id}, written just
#   BEFORE the rows append.  Intent newer than the commit record ==
#   crashed half-written attempt.  The attempt's touched-list set is
#   NOT recorded (r11: knowing it pre-write cost a separate per-batch
#   aggregation action); the replay repair recomputes it from the
#   deterministically-replayed batch — same data (serial replay), same
#   centroids (every centroid mutator refuses under a live intent),
#   same deterministic argmax ⇒ the same set.  Legacy intents that DO
#   carry a ``touched`` list are honored as written.
# * ``del_intent.json`` — the DELETE intent: {digest(id set +
#   exclude_batch scope), affected lists, d_n, absolute post-delete
#   stats, per-list counts}, written BEFORE the partition rewrite and
#   removed as the delete's last step.  The digest makes a resume
#   verifiably the SAME delete; the absolute stats make the commit
#   idempotent under any partial re-run.
# * ``retrain_intent.json`` — the RETRAIN intent: the absolute
#   post-retrain stats + centroid count, written only AFTER the staged
#   trees (``lists_stage`` / ``centroids_stage``) are complete and
#   removed after the swap + stats refresh — a live intent means the
#   stage is whole and a re-run finishes the swap idempotently; a
#   crash before the intent leaves only garbage stage dirs the next
#   retrain overwrites.
#   (``probe_txn.json`` / ``iso_txn.json`` — operators/probe.py's
#   ``make_streaming_probe_maintainer`` /
#   ``make_streaming_isotonic_maintainer`` — are the single-record
#   twins for moment-sum and histogram state: fold → atomic replace →
#   in-memory update; no intent needed because a driver-state fold has
#   no partial side effects.)
#
# WHO WRITES WHAT, IN WHAT ORDER
#
# * build: fresh history — removes every record and stage/trash dir,
#   writes rows (``__batch`` = -1) + ``/centroids`` + ``/stats``.
# * append(batch_id): skip if batch_id <= last_batch_id; repair if a
#   newer intent is live (see CRASH MAP); then intent → rows (tagged
#   ``__batch`` = batch_id) → commit (atomic txn.json replace).
#   append(batch_id=None) is the batch shape: no intent, rows tagged
#   -1, stats kept in lockstep across both records.
# * delete: refuse under a live append intent; digest-check/resume
#   under a live delete intent; else intent → partition-bounded
#   rewrite → stats (both records) → intent removal.
# * rebalance / compact: refuse under EITHER live intent (their
#   partition rewrites would race the owning leg's repair/resume);
#   they move rows/bytes, preserve ``__batch`` tags, and update stats
#   (rebalance) or nothing (compact).
# * CDC batch b (the maintainer, op_col mode): wholesale skip if
#   last_cdc_batch_id >= b; else phase 1 (upsert deletes, scoped
#   ``exclude_batch=b``, SKIPPED when a live append intent for b
#   proves it already committed — :func:`_upsert_phase1`), phase 2
#   (inserts + replacements through the append txn), phase 3 (plain
#   deletes — delete-wins), then the marker rides a txn.json replace
#   LAST.  A live phase-3 delete intent whose digest matches jumps the
#   replay straight to phase 3 (it is only ever written after phases
#   1-2 committed).
# * batch upsert (:func:`upsert_ivf_index`): the same phase 1 + phase
#   2; with batch_id it inherits every streaming guarantee, without it
#   a RETRY self-heals (unscoped phase-1 delete eats the crashed
#   attempt's half-appended new versions along with the old ones).
# * retrain (:func:`retrain_ivf_index`): stage both sidecars next to
#   the live trees → intent (absolute stats) → swap live→trash→
#   stage→live per sidecar → stats refresh (``last_batch_id`` /
#   ``last_cdc_batch_id`` CARRY OVER — a live stream keeps its replay
#   protection across the re-tiling, which a fresh-history rebuild
#   would destroy) → intent removal → trash drop; every writer
#   refuses under a live retrain intent and retrain refuses under
#   live append/delete intents.
#
# CRASH MAP (append leg; every point covered)
#
#   before intent            -> nothing on disk; replay re-runs whole
#   after intent, in rows    -> replay repairs (recompute the touched
#                               partitions from the replayed batch,
#                               drop the attempt's ``__batch``-tagged
#                               rows from them — partition-pruned —
#                               and re-sync /stats from the commit
#                               record), then re-appends
#   (an EMPTY streaming batch removes its intent instead of
#   committing — nothing was written, so the next batch's
#   out-of-order guard must not see a live intent)
#   after rows, before commit-> same repair + re-append
#   after commit             -> no-op skip (visible in the report)
#
# Rows carry an integer ``__batch`` DATA column (-1 = base rows from
# build/rebalance/compaction) so the repair can identify an attempt's
# rows exactly; rebalance/compaction PRESERVE tags (a repair only ever
# targets a batch newer than the commit record, and every moved row's
# tag is at or below it under the maintainer's rebalance-after-commit
# discipline — enforced for direct callers by the refusal guards).

_BASE_BATCH = -1  #: __batch tag for build/rebalance/compaction rows


def _txn_local_path(path: str, name: str) -> str:
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            "the IVF index transaction log is a local-filesystem JSON "
            f"commit record; got {path!r} — use a table-format "
            "(Delta/Iceberg) commit for object stores"
        )
    import os

    return os.path.join(path.removeprefix("file://"), name)


def _txn_possible(path: str) -> bool:
    """True iff ``path`` can carry the local-fs JSON transaction log
    (see :func:`_txn_local_path` — object stores use a table format).
    A scheme-less path is treated as DRIVER-LOCAL throughout the
    lifecycle (txn records, metadata scans, and the r10 sidecar fast
    paths alike) — on a cluster whose default filesystem is remote,
    index paths must carry their scheme (``hdfs://``, ``s3a://``, …)
    to route through the Spark reads/writes."""
    return "://" not in path or path.startswith("file://")


def read_index_stats(spark, path: str) -> tuple[int, float] | None:
    """The exact running ``(n, mean assigned cosine)`` over every row
    of a persisted IVF index — the ONE stats accessor.  Resolution
    order: the txn commit record (driver-side JSON, ZERO Spark jobs —
    authoritative for a streaming index, whose appends commit their
    stats fold there instead of rewriting a 1-row parquet per
    micro-batch), then the ``/stats`` parquet sidecar; ``None`` for a
    pre-sidecar index (callers decide between rescan and skip).  Any
    failure other than a missing sidecar propagates — swallowing a
    corrupt record would silently freeze a stale drift baseline."""
    if _txn_possible(path):
        txn = _read_index_json(path, "txn.json")
        if txn is not None:
            return int(txn["n"]), float(txn["mean_assigned_cos"])
        # local-fs /stats sidecar: one KB-scale 1-row parquet — read it
        # driver-side (pyarrow), ZERO Spark jobs, same as the JSON
        # record above (r10: the Spark read cost one full job + plan
        # per call, and every lifecycle entry + every batch-mode append
        # baseline resolution calls this).  A corrupt file still
        # raises; only a MISSING sidecar returns None.
        stats_dir = _txn_local_path(path, "stats")
        rows = _read_local_sidecar_rows(stats_dir)
        if not rows:
            return None
        if len(rows) != 1:
            raise ValueError(
                f"ivf stats sidecar at {stats_dir} holds {len(rows)} rows; "
                "expected exactly 1"
            )
        return int(rows[0]["n"]), float(rows[0]["mean_assigned_cos"])
    try:
        base = spark.read.parquet(path + "/stats").collect()[0]
        return int(base["n"]), float(base["mean_assigned_cos"])
    except AnalysisException as e:
        err_class = e.getErrorClass() if hasattr(e, "getErrorClass") else None
        if err_class != "PATH_NOT_FOUND" and "PATH_NOT_FOUND" not in str(e):
            raise
        return None


def _read_index_json(path: str, name: str) -> dict | None:
    import json

    try:
        with open(_txn_local_path(path, name)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _write_index_json_atomic(path: str, name: str, obj: dict) -> None:
    """Replace ``<path>/<name>`` atomically (tmp file + ``os.replace``
    — POSIX-atomic, so a reader never sees a torn record and a crash
    mid-write leaves the previous record intact)."""
    import json
    import os
    import tempfile

    target = _txn_local_path(path, name)
    os.makedirs(os.path.dirname(target), exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(target), prefix=".txn_tmp."
    )
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, target)
    except BaseException:
        import contextlib

        with contextlib.suppress(OSError):
            os.remove(tmp)
        raise


def _overwrite_local_sidecar(dir_path: str, tbl) -> None:
    """THE local-fs sidecar overwrite protocol (one definition for
    stats and centroids): write ``tbl`` (a pyarrow Table) under a
    dot-prefixed temp name both readers skip, remove the old visible
    files, rename the temp in.  A crash leaves either the old record
    or none, never a torn one — the same profile as the Spark
    overwrite this replaces."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dir_path, prefix=".sidecar_tmp.")
    os.close(fd)
    try:
        pq.write_table(tbl, tmp)
        for f in os.listdir(dir_path):
            if not f.startswith((".", "_")):
                os.remove(os.path.join(dir_path, f))
        os.replace(tmp, os.path.join(dir_path, "part-00000.parquet"))
    except BaseException:
        import contextlib

        with contextlib.suppress(OSError):
            os.remove(tmp)
        raise


def _read_local_sidecar_rows(dir_path: str) -> list[dict]:
    """THE local-fs sidecar read (one definition): every non-hidden
    parquet file under ``dir_path``, driver-side, as plain dicts.
    Empty list for a missing/empty dir — callers decide whether that
    is a legal pre-sidecar state or corruption."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    files = sorted(_glob.glob(_os.path.join(dir_path, "*.parquet")))
    return [r for f in files for r in _pq.read_table(f).to_pylist()]


def _write_stats_sidecar(spark, path: str, n: int, mean: float | None) -> None:
    """Overwrite the 1-row ``/stats`` parquet sidecar.  Local-fs
    indexes write it DRIVER-side (pyarrow, ZERO Spark jobs — r10: the
    Spark ``createDataFrame(...).write`` cost one job + plan per
    lifecycle mutation across six call sites, and the value being
    written is a driver-computed pair anyway); object-store paths keep
    the Spark write.  Write order mirrors the Spark overwrite's crash
    profile (new bytes land under a dot-prefixed temp name both
    readers skip, old files removed, temp renamed in): a crash leaves
    either the old record or none, never a torn one — and on a
    transactional index ``txn.json`` stays the authority regardless
    (``read_index_stats`` resolves it first)."""
    mean = float(mean) if mean is not None else None  # NULL stays NULL
    if not _txn_possible(path):
        local_frame(spark, 
            [(int(n), mean)], "n long, mean_assigned_cos double"
        ).write.mode("overwrite").parquet(path + "/stats")
        return
    import pyarrow as pa

    _overwrite_local_sidecar(
        _txn_local_path(path, "stats"),
        pa.table(
            {
                "n": pa.array([int(n)], pa.int64()),
                "mean_assigned_cos": pa.array([mean], pa.float64()),
            }
        ),
    )


def _read_centroids_rows(spark, path: str) -> list[tuple[int, list[float]]]:
    """``[(list_id, centroid)]`` sorted by list id for a persisted
    index's ``/centroids`` sidecar (bounded: n_centroids rows).
    Local-fs indexes read it DRIVER-side (pyarrow, ZERO Spark jobs —
    r10: every bounded consumer previously paid a Spark scan + collect
    job for a KB-scale file); object stores keep the Spark read.  A
    missing sidecar raises — every caller is operating on an index
    that must already have one."""
    if _txn_possible(path):
        cdir = _txn_local_path(path, "centroids")
        rows = _read_local_sidecar_rows(cdir)
        if not rows:
            raise FileNotFoundError(
                f"ivf centroids sidecar missing or empty at {cdir}"
            )
        return sorted(
            (int(r["__list"]), [float(x) for x in r["__cent"]]) for r in rows
        )
    return sorted(
        (int(r["__list"]), list(r["__cent"]))
        for r in spark.read.parquet(path + "/centroids").collect()
    )


def _centroids_df(spark, path: str) -> DataFrame:
    """The ``/centroids`` sidecar as a DataFrame.  Local-fs indexes
    build it from the driver-side rows (a LocalRelation — broadcasting
    it for assignment joins then needs no file-scan job); object
    stores keep the Spark read.  Values are bit-identical either way
    (parquet float64 -> Python float -> LocalRelation double is an
    exact IEEE round-trip)."""
    if _txn_possible(path):
        return local_frame(spark, 
            _read_centroids_rows(spark, path),
            "__list long, __cent array<double>",
        )
    return spark.read.parquet(path + "/centroids")


def _write_centroids_sidecar(
    spark, path: str, rows: list[tuple[int, list[float]]], name: str = "centroids"
) -> None:
    """Overwrite the ``/centroids`` (or staged) sidecar from
    driver-side rows — pyarrow on local fs (ZERO Spark jobs), Spark
    write otherwise.  Same crash profile as
    :func:`_write_stats_sidecar`."""
    if not _txn_possible(path):
        local_frame(spark, 
            [(int(lid), [float(x) for x in c]) for lid, c in rows],
            "__list long, __cent array<double>",
        ).write.mode("overwrite").parquet(path + "/" + name)
        return
    import pyarrow as pa

    _overwrite_local_sidecar(
        _txn_local_path(path, name),
        pa.table(
            {
                "__list": pa.array([int(lid) for lid, _ in rows], pa.int64()),
                "__cent": pa.array(
                    [[float(x) for x in c] for _, c in rows],
                    pa.list_(pa.float64()),
                ),
            }
        ),
    )


def _repair_uncommitted_append(
    spark, path: str, batch_id: int, touched: list[int], txn: dict | None
) -> None:
    """Undo a crashed, uncommitted append attempt for ``batch_id``:
    rewrite the touched list partitions WITHOUT the attempt's
    ``__batch == batch_id`` rows (partition-pruned read + dynamic
    partition overwrite — bounded by the lists one batch touched), drop
    list partitions the dead attempt created outright, and re-sync the
    ``/stats`` parquet from the last COMMITTED record (transactional
    appends do not touch the parquet, but an older-layout index or an
    external writer may have left it diverged — the repair leaves both
    records agreeing)."""
    import os
    import shutil

    lists_path = path + "/lists"
    touched = [int(x) for x in touched]
    lists = spark.read.parquet(lists_path)
    if touched and "__batch" in lists.columns:
        kept = (
            lists.filter(F.col("list_id").isin(touched))
            .filter(~F.col("__batch").eqNullSafe(F.lit(int(batch_id))))
            .localCheckpoint(eager=False)  # cut lineage: we overwrite
            # the very partitions this reads (rebalance's pattern)
        )
        counts = {
            int(r["list_id"]): int(r["n"])
            for r in kept.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: touched lists only; materializes kept
        }
        nonempty = [lid for lid in touched if counts.get(lid, 0) > 0]
        if nonempty:
            conf_key = "spark.sql.sources.partitionOverwriteMode"
            old_mode = spark.conf.get(conf_key, "static")
            spark.conf.set(conf_key, "dynamic")
            try:
                kept.filter(F.col("list_id").isin(nonempty)).repartition(
                    "list_id"
                ).write.mode("overwrite").partitionBy("list_id").parquet(
                    lists_path
                )
            finally:
                spark.conf.set(conf_key, old_mode)
        local_lists = _txn_local_path(path, "lists")
        for lid in touched:
            if counts.get(lid, 0) == 0:
                # the dead attempt CREATED this list: dynamic overwrite
                # cannot write an empty partition, so drop the dir
                # (local-fs contract, see module note)
                shutil.rmtree(
                    os.path.join(local_lists, f"list_id={lid}"),
                    ignore_errors=True,
                )
    if txn is not None:
        _write_stats_sidecar(
            spark, path, int(txn["n"]), float(txn["mean_assigned_cos"])
        )


def _assert_no_uncommitted_delete(path: str) -> None:
    """Refuse to write into an index mid-delete: an uncommitted
    ``del_intent.json`` means a crashed :func:`delete_from_ivf_index`
    owns the affected partitions until its resume completes —
    appending/rewriting under it is the second-writer scenario the
    local-fs log forbids (same posture as compaction's refusal under
    an uncommitted append intent)."""
    if not _txn_possible(path):
        return
    if _read_index_json(path, "del_intent.json") is not None:
        raise RuntimeError(
            "ivf index has an uncommitted delete intent: re-run "
            "delete_from_ivf_index with the same ids so its resume "
            "completes first"
        )


def _assert_no_uncommitted_retrain(path: str) -> None:
    """Refuse to write into an index mid-retrain: a live
    ``retrain_intent.json`` means a crashed :func:`retrain_ivf_index`
    owns the WHOLE index (its staged swap may have moved either
    sidecar) until a re-run completes the swap."""
    if not _txn_possible(path):
        return
    if _read_index_json(path, "retrain_intent.json") is not None:
        raise RuntimeError(
            "ivf index has an uncommitted retrain intent: re-run "
            "retrain_ivf_index so its staged swap completes first"
        )


def _assert_no_uncommitted_append(path: str) -> dict | None:
    """Refuse to rewrite index partitions while an APPEND intent newer
    than the commit record is live: the crashed append's replay repair
    owns the touched partitions until it runs, and a partition rewrite
    racing it is the second-writer scenario the local-fs log forbids.
    The ONE guard rebalance, compaction, and delete share (round-8
    ADVICE: rebalance lacked it, so a direct-API rebalance after a
    crashed append could move the dead attempt's tagged rows out of
    the intent's touched partitions and strand them for the repair).
    Returns the commit record (or ``None``) so callers that need it
    don't re-read it."""
    if not _txn_possible(path):
        return None
    txn = _read_index_json(path, "txn.json")
    intent = _read_index_json(path, "txn_intent.json")
    committed = int(txn["last_batch_id"]) if txn is not None else -1
    if intent is not None and int(intent["batch_id"]) > committed:
        raise RuntimeError(
            "ivf index has an uncommitted append intent (batch "
            f"{intent['batch_id']} > committed {committed}): replay the "
            "stream so the repair runs first — rewriting partitions "
            "under it would race the repair's partition rewrite"
        )
    return txn


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_centroids: int = 16,
    train_iters: int = 4,
    seed: int = 42,
    centroids: DataFrame | None = None,
) -> None:
    """One-off IVF index build: train centroids, assign every corpus
    vector to its nearest list, and persist the corpus Hive-partitioned
    BY LIST ID — so a query that probes ``nprobe`` lists scans exactly
    those partitions (planning-time partition pruning, asserted in
    tests) and the other ``n_centroids - nprobe`` lists never leave
    storage.  Centroids live in a sidecar table.  This is the 100 TB
    shape: the expensive assignment shuffle happens once at build; each
    query batch reads ~nprobe/n_centroids of the data."""
    if _txn_possible(path):
        # a REBUILD at an existing path starts a fresh transaction
        # history: a leftover commit record would be authoritative for
        # read_index_stats but describe the PREVIOUS index's contents
        import contextlib
        import os
        import shutil

        for name in (
            "txn.json",
            "txn_intent.json",
            "del_intent.json",
            "retrain_intent.json",
        ):
            with contextlib.suppress(FileNotFoundError):
                os.remove(_txn_local_path(path, name))
        for name in (
            "lists_stage", "centroids_stage", "lists_trash",
            "centroids_trash",
        ):
            shutil.rmtree(_txn_local_path(path, name), ignore_errors=True)
    spark = corpus.sparkSession
    cents = centroids if centroids is not None else train_ivf_centroids(
        corpus, vec_col, n_centroids=n_centroids, iters=train_iters, seed=seed
    )
    assigned = _assign_to_lists(corpus, id_col, vec_col, cents)
    # cluster the write by list id: one task per list writes one file,
    # instead of every shuffle partition writing a sliver into every
    # list dir (32 partitions x n_centroids tiny files slows both the
    # write and every pruned read after it)
    assigned = assigned.localCheckpoint(eager=False)
    # __batch = -1 tags these as BASE rows: every file in the index
    # carries the column from birth, so the append transaction log's
    # replay repair can always filter on it (see the txn note above)
    assigned.drop("__best_cos").withColumn(
        "__batch", F.lit(_BASE_BATCH)
    ).repartition("list_id").write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(path + "/lists")
    _write_centroids_sidecar(
        spark,
        path,
        [(int(r["__list"]), list(r["__cent"])) for r in cents.collect()],
    )
    # assignment-quality sidecar: the exact running (n, mean assigned
    # cosine) over every indexed row — the drift baseline for
    # incremental appends (each batch compares against it, then folds
    # itself in) and the base of rebalance's incremental update
    st = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__best_cos").alias("mean_assigned_cos"),
    ).collect()[0]
    _write_stats_sidecar(spark, path, int(st["n"]), st["mean_assigned_cos"])


def _assign_to_lists(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: DataFrame,
    passthrough: tuple = (),
) -> DataFrame:
    """(id, __v, list_id, __best_cos): nearest-centroid assignment —
    the shared core of the one-off index build and incremental
    appends.  ``__best_cos`` (the winning cosine) doubles as the
    assignment-quality signal the drift detector aggregates.
    ``passthrough`` columns ride along unchanged (constant per id, so
    the max-struct pick is unaffected) — how the rebalance carries
    each row's ``__batch`` tag through the reassignment."""
    bc = F.broadcast(
        cents.select(F.col("__list").alias("__cent_id"), F.col("__cent"))
    )
    v = df.select(
        F.col(id_col).alias(id_col),
        _as_double(vec_col).alias("__v"),
        *[F.col(c) for c in passthrough],
    ).repartition(id_col)
    scored = v.crossJoin(bc).withColumn(
        "__csim", cosine_similarity(F.col("__v"), F.col("__cent"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("__csim"),
                    (-F.col("__cent_id")).alias("__nc"),
                    F.col("__v"),
                    *[F.col(c) for c in passthrough],
                )
            ).alias("__b")
        )
        .select(
            id_col,
            F.col("__b.__v").alias("__v"),
            (-F.col("__b.__nc")).alias("list_id"),
            F.col("__b.__csim").alias("__best_cos"),
            *[F.col(f"__b.{c}").alias(c) for c in passthrough],
        )
    )


def _scan_list_files(path: str) -> dict:
    """{(list_id, filename): num_rows-or-None} over a local index's
    ``/lists`` tree — names only (num_rows filled lazily by the
    caller's diff, so the pre-write snapshot costs two scandirs and no
    footer reads)."""
    import os

    base = _txn_local_path(path, "lists")
    out: dict = {}
    if not os.path.isdir(base):
        return out
    for entry in os.scandir(base):
        if entry.is_dir() and entry.name.startswith("list_id="):
            lid = int(entry.name.split("=", 1)[1])
            for f in os.scandir(entry.path):
                if f.is_file() and not f.name.startswith(("_", ".")):
                    out[(lid, f.name)] = None
    return out


def _append_batch_fused(
    spark,
    new_batch: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    drift_ratio_threshold: float,
    cents: DataFrame,
    st: tuple,
    batch_id: int | None = None,
    txn: dict | None = None,
) -> dict:
    """ONE-action append (r11): the partitioned append write carries
    the drift aggregates as observed metrics, and the exact per-list
    appended row counts are read back from the NEW parquet files'
    footers (driver-side metadata, zero Spark jobs).  Replaces the
    separate groupBy-collect action the two-action path pays — report
    values are identical: the observed (count, non-null count, sum of
    ``__best_cos``) are the same aggregates the collect computed, and
    the footer counts are the same per-list totals by construction
    (same files Spark wrote).  Only reachable on a local-fs index with
    a resolvable stats baseline (see call site).

    With ``batch_id`` (streaming) the exactly-once protocol is
    preserved with a SLIMMER intent: ``{batch_id}`` only — the
    touched-list set is no longer known before the write (that
    knowledge was exactly what cost the second action), so the replay
    repair recomputes it from the deterministically-replayed batch
    instead (see the INDEX COMMIT PROTOCOL section; centroids cannot
    have moved under a live intent because every centroid mutator
    refuses via ``_assert_no_uncommitted_append``)."""
    import pyarrow.parquet as pq
    from pyspark.sql import Observation

    import contextlib
    import os

    base_n, build_mean = int(st[0]), float(st[1])
    pre = _scan_list_files(path)
    if batch_id is not None:
        # intent BEFORE the rows write (crash between the two leaves a
        # no-file intent the replay repairs as a no-op)
        _write_index_json_atomic(
            path, "txn_intent.json", {"batch_id": int(batch_id)}
        )
    obs = Observation()
    assigned = _assign_to_lists(new_batch, id_col, vec_col, cents)
    to_write = (
        assigned.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.count("__best_cos").alias("ns"),
            F.sum("__best_cos").alias("s"),
        )
        .drop("__best_cos")
        .withColumn(
            "__batch",
            F.lit(_BASE_BATCH if batch_id is None else int(batch_id)),
        )
    )
    to_write.repartition("list_id").write.mode("append").partitionBy(
        "list_id"
    ).parquet(path + "/lists")
    m = obs.get
    n_batch = int(m["n"])
    if n_batch == 0:
        # empty batch: the write landed no files (footer diff would be
        # empty too) — same no-op report as the two-action path.  A
        # streaming empty batch removes its intent (nothing to repair,
        # nothing committed — the two-action path never wrote one), so
        # the NEXT batch's out-of-order guard stays quiet.
        if batch_id is not None:
            with contextlib.suppress(FileNotFoundError):
                os.remove(_txn_local_path(path, "txn_intent.json"))
        return {
            "n_appended": 0,
            "batch_mean_cos": None,
            "build_mean_cos": None,
            "drift_ratio": 1.0,
            "retrain_recommended": False,
            "list_counts": {},
            "skipped_replay": False,
        }
    n_scored = int(m["ns"])
    batch_mean = (float(m["s"]) / n_scored) if n_scored else 0.0
    lists_base = _txn_local_path(path, "lists")
    list_counts: dict = {}
    n_footer = 0
    for lid, fname in _scan_list_files(path):
        if (lid, fname) not in pre:
            nrows = pq.ParquetFile(
                os.path.join(lists_base, f"list_id={lid}", fname)
            ).metadata.num_rows
            list_counts[lid] = list_counts.get(lid, 0) + nrows
            n_footer += nrows
    if n_footer != n_batch:
        raise RuntimeError(
            f"ivf append wrote {n_footer} rows by parquet footer but "
            f"observed {n_batch} in the write job — a second writer "
            "touched the index mid-append"
        )
    list_counts = {lid: n for lid, n in list_counts.items() if n > 0}
    new_n = base_n + n_batch
    new_mean = (build_mean * base_n + batch_mean * n_batch) / new_n
    if batch_id is not None:
        # COMMIT: atomic replace, the last step — same record and same
        # rules as the two-action streaming path (read_index_stats
        # resolves txn-first, so no per-batch /stats parquet rewrite)
        _write_index_json_atomic(
            path,
            "txn.json",
            {
                "last_batch_id": int(batch_id),
                "n": new_n,
                "mean_assigned_cos": new_mean,
            },
        )
    else:
        _write_stats_sidecar(spark, path, new_n, new_mean)
        prior = txn if txn is not None else _read_index_json(path, "txn.json")
        if prior is not None:
            # keep the authoritative txn record in lockstep (bulk
            # backfill onto a transactional index — same rule as the
            # two-action path)
            _write_index_json_atomic(
                path,
                "txn.json",
                {**prior, "n": new_n, "mean_assigned_cos": new_mean},
            )
    ratio = (batch_mean / build_mean) if build_mean else 1.0
    return {
        "n_appended": n_batch,
        "batch_mean_cos": batch_mean,
        "build_mean_cos": build_mean,
        "drift_ratio": ratio,
        "retrain_recommended": bool(ratio < drift_ratio_threshold),
        "list_counts": list_counts,
        "skipped_replay": False,
    }


def append_ivf_index(
    new_batch: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    drift_ratio_threshold: float = 0.8,
    batch_id: int | None = None,
    cents: DataFrame | None = None,
) -> dict:
    """INCREMENTAL index maintenance: assign a new vector batch to the
    EXISTING trained centroids and append its rows into the matching
    list partitions — no retrain, no rewrite of the standing lists.
    This is how a 100 TB vector corpus actually grows (retraining
    centroids per batch would rewrite the whole layout); centroid
    drift is handled by periodic full rebuilds, not per batch.  Append
    mode adds files only to the partitions the batch touches.

    Drift detection: as the distribution of appended vectors drifts
    away from the indexed corpus, recall of the appended vectors vs
    brute force degrades (the centroids no longer tile the data).  The
    batch's mean assigned-centroid cosine divided by the standing
    index's running mean (exact (n, mean) over every indexed row,
    maintained by build, append, and rebalance; resolved through
    :func:`read_index_stats` — txn commit record first, ``/stats``
    parquet fallback) is the drift ratio; below
    ``drift_ratio_threshold`` (default 0.8 — appended vectors sit >20%
    further from every centroid than the corpus did) the report flags
    ``retrain_recommended`` and the operator owner should schedule a
    full rebuild.  Indexes built before the sidecar existed rebuild
    the baseline from the standing lists (one extra scan, documented).

    Returns the drift report dict: n_appended, batch_mean_cos,
    build_mean_cos, drift_ratio, retrain_recommended, plus
    ``list_counts`` ({list_id: rows appended} — bounded by the lists
    the batch touched), which is what lets a streaming ingest loop
    track per-list growth and trigger a rebalance WITHOUT any extra
    index scan (:func:`make_streaming_ivf_maintainer`).

    ``batch_id`` (a streaming micro-batch id) makes the append
    EXACTLY-ONCE under foreachBatch's at-least-once replay: ids at or
    below the index transaction log's high-water mark return a
    ``{"skipped_replay": True, ...}`` no-op report, a half-written
    crashed attempt is repaired before re-appending, and the commit
    record is replaced atomically as the last step (commit/crash
    rules: INDEX COMMIT PROTOCOL, the module section above; the
    kill/replay proof is ``stream_ivf_recovery`` +
    ``tests/test_r8_recovery.py``).  Without ``batch_id`` the append
    is the plain batch operation (no tags beyond ``__batch = -1``-based
    files, no log reads).
    """
    spark = new_batch.sparkSession
    _assert_no_uncommitted_delete(path)
    _assert_no_uncommitted_retrain(path)
    txn: dict | None = None
    if batch_id is not None:
        batch_id = int(batch_id)
        txn = _read_index_json(path, "txn.json")
        committed = int(txn["last_batch_id"]) if txn is not None else -1
        if batch_id <= committed:
            return {
                "n_appended": 0,
                "batch_mean_cos": None,
                "build_mean_cos": None,
                "drift_ratio": 1.0,
                "retrain_recommended": False,
                "list_counts": {},
                "skipped_replay": True,
            }
        intent = _read_index_json(path, "txn_intent.json")
        if intent is not None and int(intent["batch_id"]) > committed:
            if int(intent["batch_id"]) != batch_id:
                raise RuntimeError(
                    "ivf txn log out of order: uncommitted intent for "
                    f"batch {intent['batch_id']} but replaying batch "
                    f"{batch_id} — streaming replays are serial, so this "
                    "index has a second writer or a corrupt log"
                )
            if "touched" in intent:
                touched = intent["touched"]
            else:
                # slim r11 intent ({batch_id} only): recompute the
                # attempt's touched-list set from the deterministically
                # replayed batch — same data (serial replay contract),
                # same centroids (every centroid mutator refuses under
                # a live intent via _assert_no_uncommitted_append),
                # same deterministic argmax assignment ⇒ the exact set
                # the crashed attempt wrote into.  One bounded job,
                # paid ONLY on the crash-replay path.
                if cents is None:
                    cents = _centroids_df(spark, path)
                touched = [
                    r["list_id"]
                    for r in _assign_to_lists(
                        new_batch, id_col, vec_col, cents
                    )
                    .select("list_id")
                    .distinct()
                    .collect()
                ]
            _repair_uncommitted_append(spark, path, batch_id, touched, txn)
    # ``cents`` lets a caller that already holds the centroid model
    # (the streaming maintainer caches it across micro-batches,
    # invalidating on rebalance/retrain) skip the per-call sidecar
    # read — one fewer scan per micro-batch on the hot append path
    if cents is None:
        cents = _centroids_df(spark, path)

    if _txn_possible(path):
        # ONE-action fast path (r11, guide §1.2/§5): the write itself
        # carries the drift aggregates via ``observe`` and the exact
        # per-list appended counts come from the new files' parquet
        # footers afterwards (driver-side metadata, zero jobs — the
        # ``_list_sizes`` convention).  Batch mode writes no intent at
        # all; streaming mode writes the slim ``{batch_id}`` intent
        # inside the fused helper (repair recomputes touched, above).
        # Requires a driver-resolvable baseline: the txn commit record
        # (streaming) or the stats sidecar (batch); a pre-sidecar
        # index stays on the two-action path below because its
        # baseline rescan must run before the write.
        if txn is not None:
            st = (int(txn["n"]), float(txn["mean_assigned_cos"]))
        else:
            st = read_index_stats(spark, path)
        if st is not None:
            return _append_batch_fused(
                spark, new_batch, id_col, vec_col, path,
                drift_ratio_threshold, cents, st,
                batch_id=batch_id, txn=txn,
            )

    assigned = _assign_to_lists(new_batch, id_col, vec_col, cents).localCheckpoint(
        eager=False
    )
    # ONE bounded job (rows per TOUCHED list): the global (n, mean)
    # the drift report needs is the driver-side rollup of the same
    # per-list rows the streaming maintainer needs.  count("__best_cos")
    # is tracked separately from count(*) because a zero-norm vector's
    # cosine is NULL (non-ANSI 0/0): the mean must average the NON-NULL
    # scores — the avg() semantics the pre-list_counts version had —
    # and an all-NULL list must not crash the fold (round-7 review
    # finding; float(None) killed the stream inside foreachBatch)
    per_list = (
        assigned.groupBy("list_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("__best_cos").alias("ns"),
            F.sum("__best_cos").alias("s"),
        )
        .collect()
    )
    n_batch = sum(int(r["n"]) for r in per_list)
    if n_batch == 0:
        # empty append period: harmless no-op — return BEFORE resolving
        # the baseline, so a pre-sidecar index doesn't pay a full
        # standing-list rescan just to discard it
        return {
            "n_appended": 0,
            "batch_mean_cos": None,
            "build_mean_cos": None,
            "drift_ratio": 1.0,
            "retrain_recommended": False,
            "list_counts": {},
            "skipped_replay": False,
        }
    n_scored = sum(int(r["ns"]) for r in per_list)
    # all-zero-norm batch: no meaningful drift signal; mean 0.0 makes
    # the ratio 0 and flags retrain — the conservative read
    batch_mean = (
        sum(float(r["s"]) for r in per_list if r["s"] is not None) / n_scored
        if n_scored
        else 0.0
    )
    list_counts = {int(r["list_id"]): int(r["n"]) for r in per_list}

    # Resolve the build-time baseline BEFORE the append WRITE: the
    # pre-sidecar fallback rescans the STANDING lists, and doing that
    # after the write would fold the batch being measured into its own
    # baseline, biasing drift_ratio toward 1.0.  The txn commit record
    # carries the same (n, mean) the /stats sidecar does (every writer
    # keeps the pair in lockstep — append commits both, rebalance
    # refreshes both), so a committed streaming index resolves the
    # baseline driver-side with ZERO Spark jobs — one fewer job per
    # micro-batch (VERDICT r7 task 2: the streaming entries are
    # job-count bound).
    if txn is not None:
        base_n, build_mean = int(txn["n"]), float(txn["mean_assigned_cos"])
    else:
        st = read_index_stats(spark, path)
        if st is not None:
            base_n, build_mean = st
        else:
            # Pre-sidecar index: ONLY a missing stats record may fall
            # back to the standing-list rescan (the accessor raises on
            # anything else — a silent rescan would mask exactly the
            # drift this report exists to surface).
            lists = spark.read.parquet(path + "/lists")
            rescored = _assign_to_lists(lists, id_col, "__v", cents)
            b = rescored.agg(
                F.count(F.lit(1)).alias("n"), F.avg("__best_cos").alias("m")
            ).collect()[0]
            base_n, build_mean = int(b["n"]), float(b["m"])

    to_write = assigned.drop("__best_cos")
    if batch_id is not None:
        # intent BEFORE the rows write: a crash anywhere from here to
        # the commit record leaves an intent newer than the commit, so
        # the replay repairs (drops these tagged rows) and re-appends
        _write_index_json_atomic(
            path,
            "txn_intent.json",
            {"batch_id": batch_id, "touched": sorted(list_counts)},
        )
        to_write = to_write.withColumn("__batch", F.lit(batch_id))
    else:
        to_write = to_write.withColumn("__batch", F.lit(_BASE_BATCH))
    to_write.repartition("list_id").write.mode(
        "append"
    ).partitionBy("list_id").parquet(path + "/lists")

    # Fold the batch into the stats record AFTER the drift comparison:
    # it is the exact running (n, mean assigned cosine) over EVERY row
    # in the index, which is what lets rebalance_ivf_index update it
    # incrementally when it re-scores split rows — an append-blind
    # baseline would make that delta math wrong the moment a split
    # list contains appended rows.  The drift ratio above still
    # compares the batch against the PRE-append baseline.
    new_n = base_n + n_batch
    new_mean = (build_mean * base_n + batch_mean * n_batch) / new_n
    if batch_id is None:
        _write_stats_sidecar(spark, path, new_n, new_mean)
        if _txn_possible(path):
            # a batch-mode append onto a TRANSACTIONAL index (e.g. a
            # bulk backfill after a stream stopped) must keep the
            # authoritative record in lockstep, or the next streaming
            # batch would resolve a baseline that never saw this fold
            prior = _read_index_json(path, "txn.json")
            if prior is not None:
                _write_index_json_atomic(
                    path,
                    "txn.json",
                    {**prior, "n": new_n, "mean_assigned_cos": new_mean},
                )
    else:
        # COMMIT: atomic replace, the last step — at-or-below this id
        # is now a guaranteed no-op replay.  The record carries the
        # stats fold itself (read_index_stats resolves txn-first), so
        # the transactional path does NOT rewrite the 1-row /stats
        # parquet per micro-batch: one fewer job per batch and no
        # sidecar small-file churn, with no reader able to observe the
        # lagging parquet.
        _write_index_json_atomic(
            path,
            "txn.json",
            {
                "last_batch_id": batch_id,
                "n": new_n,
                "mean_assigned_cos": new_mean,
            },
        )

    ratio = (batch_mean / build_mean) if build_mean else 1.0
    return {
        "n_appended": n_batch,
        "batch_mean_cos": batch_mean,
        "build_mean_cos": build_mean,
        "drift_ratio": ratio,
        "retrain_recommended": bool(ratio < drift_ratio_threshold),
        "list_counts": list_counts,
        "skipped_replay": False,
    }


def _list_sizes(spark, path: str) -> dict:
    """{list_id: rows} for a persisted IVF index.  The ONE definition
    the maintainer seed, its post-split re-seed, and
    :func:`rebalance_ivf_index` share (round-7 review finding: three
    hand-rolled copies).  Local-fs indexes resolve it from the parquet
    FOOTERS driver-side (``num_rows`` metadata, no data pages read,
    ZERO Spark jobs — r10; same file set Spark would list, so the
    counts are identical by construction, and a list whose files hold
    zero rows is absent from the map exactly as the groupBy's would
    be); object stores keep the one bounded Spark job (one row per
    list)."""
    if _txn_possible(path):
        import os

        import pyarrow.parquet as pq

        base = _txn_local_path(path, "lists")
        sizes: dict = {}
        for entry in os.scandir(base):
            if entry.is_dir() and entry.name.startswith("list_id="):
                lid = int(entry.name.split("=", 1)[1])
                n = 0
                for f in os.scandir(entry.path):
                    if f.is_file() and not f.name.startswith(("_", ".")):
                        n += pq.ParquetFile(f.path).metadata.num_rows
                if n > 0:
                    sizes[lid] = n
        return sizes
    return {
        int(r["list_id"]): int(r["n"])
        for r in spark.read.parquet(path + "/lists")
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def make_streaming_ivf_maintainer(
    spark,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_ratio: float = 2.0,
    split_ratio: float = 2.0,
    compact_files_per_list: int | None = None,
    compact_target_bytes: int = 128 * 1024 * 1024,
    op_col: str | None = None,
    cdc_driver_id_cap: int = 1_000,
    retrain_after_drift_batches: int | None = None,
    drift_ratio_threshold: float = 0.8,
) -> tuple:
    """The SELF-MAINTAINING streaming index: compose the three index
    lifecycle legs (build → :func:`append_ivf_index` per micro-batch →
    :func:`rebalance_ivf_index` when appends skew) into one
    ``foreachBatch`` callable — what a live 100 TB vector ingest
    actually runs, instead of a human watching drift dashboards.

    Returns ``(fn, log)``: pass ``fn`` to ``foreachBatch`` (or
    ``streaming._drain_foreach_batch``); ``log`` accumulates one dict
    per micro-batch — {batch_id, n_appended, max_share_ppm,
    rebalanced, rebalance_report} — bounded by batch count.

    The rebalance TRIGGER costs zero extra index scans: driver-side
    per-list sizes are seeded with one bounded count at construction
    (one row per list) and advanced from each append report's
    ``list_counts``; when the hottest list exceeds ``trigger_ratio`` x
    the mean list size, the rebalance runs INSIDE the batch (so later
    batches land on the post-split layout), receives the maintainer's
    exact sizes (skipping its own seed count), and the sizes re-seed
    from the report's ``new_sizes`` map — the whole trigger/rebalance/
    re-seed loop adds ZERO index scans beyond the split's own work.
    The stream itself is STATELESS (no state store): per-batch
    exactly-once comes from the index transaction log —
    ``append_ivf_index(batch_id=...)`` skips batches the ``txn.json``
    high-water mark already committed and repairs a half-written
    attempt before re-appending — so a replayed micro-batch after a
    crash (pass ``checkpoint`` to the drain so the engine replays
    uncommitted batches) never double-inserts (round-7 VERDICT task 1;
    kill/restart proof in ``stream_ivf_recovery`` and
    ``tests/test_r8_recovery.py``).

    ``trigger_ratio`` must be >= ``split_ratio``: the trigger decides
    WHEN to rebalance, ``rebalance_ivf_index`` selects hot lists with
    ``split_ratio`` — a trigger below the selector would fire
    rebalances that select nothing and mis-mark genuinely splittable
    lists as unsplittable (round-8 ADVICE; validated here).

    ``retrain_after_drift_batches`` (opt-in) arms the SIXTH lifecycle
    leg: when that many CONSECUTIVE appends report drift (batch mean
    assigned cosine / standing mean below ``drift_ratio_threshold`` —
    the signal splitting hot lists cannot fix, because the centroids
    no longer tile the data), the maintainer runs
    :func:`retrain_ivf_index` INSIDE the batch — post-commit, so the
    staged swap never races the append txn — then re-seeds its
    driver-side size map (one bounded count; the re-tiling moved every
    row), clears the unsplittable markers, and re-surveys file counts.
    The streak is IN-MEMORY: a restart starts it at zero, so a crashed
    retrain trigger re-arms after ``retrain_after_drift_batches`` more
    drifted batches rather than replaying — the retrain itself stays
    crash-safe through its own intent (a restart mid-swap completes it
    on the next trigger or direct call).  A retrain subsumes any
    rebalance the same batch would have fired.  Log entries gain
    {retrained, retrain_report}.

    ``compact_files_per_list`` (opt-in) arms the FOURTH lifecycle leg:
    every append adds one file per touched list, so the maintainer
    also tracks per-list FILE counts — seeded from one driver-side
    metadata scan (zero Spark jobs), advanced by +1 per touched list
    per append, re-surveyed only after a rebalance or compaction
    actually rewrote partitions — and runs
    :func:`compact_ivf_index` inside the batch the moment any list
    exceeds the threshold, so a long-running ingest never accretes the
    thousands-of-small-files tail (VERDICT r7 task 3).  Log entries
    gain {compacted, compaction_report}.

    ``op_col`` (opt-in) turns the maintainer into a CDC SINK: each
    micro-batch row carries 'I' (insert — vector required), 'U'
    (upsert — replace the id's standing vector, the re-embedded-
    document case), or 'D' (delete by id) — the shape a change-feed
    of a curated corpus emits.  Within a batch, three ordered phases:
    upserts drop their OLD versions first (scoped by the batch tag so
    a replay never eats the new versions), inserts + replacements
    land second, and plain deletes apply LAST (a key inserted or
    upserted and deleted in the same batch ends deleted — the delete
    is the curation verdict).  'I' is an insert of a NEW id (an 'I'
    on an existing id duplicates it — use 'U').  Exactly-once composes from three
    idempotent layers, committed in order: the insert leg is
    :func:`append_ivf_index`'s own txn idempotence; the delete leg is
    :func:`delete_from_ivf_index` (a replayed delete's re-scan finds
    no hits — visible no-op — and a crashed one resumes from its
    intent); and a ``last_cdc_batch_id`` marker on the commit record,
    written LAST, makes a fully-committed batch skip wholesale.  A
    crash between the insert commit and the marker replays the batch:
    the append skips internally (its log entry keeps
    ``skipped_replay=True`` for the INSERT leg), the delete re-runs
    idempotently, the marker lands.  Log entries gain {n_deleted,
    delete_report, n_upserted, upsert_delete_report, d_id_route,
    u_id_route}; per-batch driver cost is one extra bounded job — op
    validation, per-op row/distinct-id/NULL-id counts, and a driver id
    sample CAPPED at ``cdc_driver_id_cap``, fused into one aggregate.
    D/U id sets at or under the cap route as driver lists (``isin``
    literals → parquet row-group pruning on the hit scan); LARGER sets
    route as the op's id subset DataFrame straight into
    :func:`delete_from_ivf_index`'s broadcast anti-join — a mass
    decontamination event's million-id delete never materializes ids
    on the driver (VERDICT r8 task 1; the route is deterministic per
    batch, so a crash-resume recomputes the same digest).  The default
    cap is MEASURED, not guessed (``tools/sweep_cdc_route.py``): the
    isin literal's plan/codegen cost grows with the id count (7.3s at
    10k ids, 52.6s at 100k on a 200k-row index) while the broadcast
    anti-join stays flat (~2s at every size), and by ~1k ids the two
    routes tie — so the list route is kept only where its row-group
    pruning is free.  D/U ids
    must be INTEGER-VALUED (the delete leg's documented contract); a
    NULL id on a 'D'/'U' row fails loud (round-8 ADVICE: it previously
    no-opped silently via collect_set's NULL skip).  The full phase
    ordering and every crash window: INDEX COMMIT PROTOCOL, the module
    section above.
    """
    if trigger_ratio < split_ratio:
        raise ValueError(
            f"trigger_ratio={trigger_ratio} must be >= "
            f"split_ratio={split_ratio} — a lower trigger fires "
            "rebalances whose hot-list selector finds nothing"
        )
    if cdc_driver_id_cap < 1:
        raise ValueError(
            f"cdc_driver_id_cap={cdc_driver_id_cap} must be >= 1 (the "
            "capped id sample's slice length; use 1 to force the "
            "DataFrame route for every non-trivial D/U set)"
        )
    sizes = _list_sizes(spark, path)  # bounded: one row per list
    fcounts: dict = (
        _ivf_list_files(path)[0] if compact_files_per_list is not None
        else {}
    )  # driver-side metadata scan, zero Spark jobs
    log: list = []
    #: consecutive drifted-append count for the retrain trigger —
    #: in-memory by design (see the docstring's restart note)
    drift_streak = [0]
    #: lists whose split attempt degenerated, recorded at the size the
    #: attempt saw: a (near-)identical-vector hot list cannot split
    #: (Lloyd yields one nonempty child), and without this marker the
    #: trigger condition would stay true forever — every later batch
    #: would pay a full rebalance attempt that splits nothing (round-7
    #: review finding).  A marked list re-qualifies only after it has
    #: GROWN past the failed size (new appends can make it splittable).
    unsplittable: dict = {}

    #: centroid model cached across micro-batches (r10): the append
    #: path re-read the /centroids sidecar every batch; only a
    #: rebalance or retrain changes it, so those two invalidate.  The
    #: cache holds the lazy scan DataFrame — the broadcast build
    #: executes it, and re-planning the same tiny scan per batch was
    #: pure per-batch overhead.
    cents_cache: list = [None]

    def _cents():
        if cents_cache[0] is None:
            cents_cache[0] = _centroids_df(spark, path)
        return cents_cache[0]

    def _max_share_ppm() -> int:
        total = sum(sizes.values())
        return max(sizes.values()) * 1_000_000 // total if total else 0

    def _maintain_inserts(batch_df, batch_id) -> None:
        rep = append_ivf_index(
            batch_df, id_col, vec_col, path, batch_id=int(batch_id),
            drift_ratio_threshold=drift_ratio_threshold,
            cents=_cents(),
        )
        if rep["n_appended"] == 0 and not rep["skipped_replay"]:
            # empty micro-batch: same silent no-op as before, but
            # detected by the append's own per-list aggregate instead
            # of a separate isEmpty() probe job per batch (r10 — the
            # probe cost one job on EVERY batch to save work only on
            # the empty ones, which the availableNow file replays
            # never produce)
            return
        if rep["skipped_replay"]:
            # engine replay of a batch the index already committed
            # (crash landed between the index commit and the engine
            # checkpoint): exactly-once = skip; sizes are already
            # right (same-process retry advanced them; a restarted
            # process re-seeded them from the committed index)
            log.append(
                {
                    "batch_id": int(batch_id),
                    "n_appended": 0,
                    "max_share_ppm": _max_share_ppm(),
                    "rebalanced": False,
                    "rebalance_report": None,
                    "compacted": False,
                    "compaction_report": None,
                    "retrained": False,
                    "retrain_report": None,
                    "skipped_replay": True,
                }
            )
            return
        for lid, n in rep["list_counts"].items():
            sizes[lid] = sizes.get(lid, 0) + n
        if compact_files_per_list is not None:
            # the append writes exactly ONE file per touched list
            for lid in rep["list_counts"]:
                fcounts[lid] = fcounts.get(lid, 0) + 1
        entry = {
            "batch_id": int(batch_id),
            "n_appended": rep["n_appended"],
            "max_share_ppm": _max_share_ppm(),
            "rebalanced": False,
            "rebalance_report": None,
            "compacted": False,
            "compaction_report": None,
            "retrained": False,
            "retrain_report": None,
            "skipped_replay": False,
        }
        if retrain_after_drift_batches is not None:
            drift_streak[0] = (
                drift_streak[0] + 1 if rep["retrain_recommended"] else 0
            )
            if drift_streak[0] >= int(retrain_after_drift_batches):
                # the SIXTH leg, in-stream: the append above COMMITTED,
                # so the staged swap runs post-commit (the same
                # discipline as the rebalance) and the txn record —
                # replay protection included — carries over the swap
                rt = retrain_ivf_index(spark, path, id_col=id_col)
                cents_cache[0] = None  # re-tiled: new centroid model
                drift_streak[0] = 0
                sizes.clear()
                sizes.update(_list_sizes(spark, path))  # re-tiled:
                # one bounded re-seed count (rare, on the retrain only)
                unsplittable.clear()
                if compact_files_per_list is not None:
                    fcounts.clear()
                    fcounts.update(_ivf_list_files(path)[0])
                entry["retrained"] = True
                entry["retrain_report"] = rt
                entry["max_share_ppm"] = _max_share_ppm()
                log.append(entry)
                return  # a full re-tiling subsumes this batch's
                # rebalance/compaction triggers
        total = sum(sizes.values())
        mean = total / max(len(sizes), 1)
        hot = {
            lid
            for lid, n in sizes.items()
            if n > trigger_ratio * mean
            and (lid not in unsplittable or n > unsplittable[lid])
        }
        if hot:
            rb = rebalance_ivf_index(
                spark, path, id_col, split_ratio=split_ratio,
                sizes=dict(sizes),  # exact (seed + append reports):
                # skips the rebalance's own seed count job
            )
            if rb["n_split"] > 0:
                cents_cache[0] = None  # split swapped the parent
                # centroid for two children: drop the cached model
                # re-seed from the report's exact post-split map —
                # no rescan of the rewritten index.  Markers: hot
                # lists that were
                # ATTEMPTED but did not split are still degenerate —
                # re-mark them at their re-seeded size instead of
                # wiping all markers (round-8 ADVICE: an unconditional
                # clear made the next batch pay one wasted rebalance
                # per still-degenerate hot list)
                sizes.clear()
                sizes.update(rb["new_sizes"])  # exact post-split map
                # from the report — the re-seed costs zero index scans
                survivors = hot - set(rb["split_list_ids"])
                unsplittable.clear()  # split parents: markers out
                for lid in survivors:
                    if lid in sizes:
                        unsplittable[lid] = sizes[lid]
                entry["rebalanced"] = True
                entry["max_share_ppm"] = _max_share_ppm()
                if compact_files_per_list is not None:
                    # the split rewrote partitions: re-survey (driver
                    # metadata scan, free, only after the rare split)
                    fcounts.clear()
                    fcounts.update(_ivf_list_files(path)[0])
            else:
                for lid in hot:
                    unsplittable[lid] = sizes[lid]
            entry["rebalance_report"] = rb
        if compact_files_per_list is not None and any(
            c > compact_files_per_list for c in fcounts.values()
        ):
            cp = compact_ivf_index(
                spark,
                path,
                max_files_per_list=compact_files_per_list,
                target_file_bytes=compact_target_bytes,
            )
            fcounts.clear()
            fcounts.update(_ivf_list_files(path)[0])
            entry["compacted"] = cp["n_compacted"] > 0
            entry["compaction_report"] = cp
        log.append(entry)

    def maintain(batch_df, batch_id) -> None:
        if op_col is None:
            _maintain_inserts(batch_df, batch_id)
            return
        b = int(batch_id)
        txn = _read_index_json(path, "txn.json")
        if txn is not None and int(txn.get("last_cdc_batch_id", -1)) >= b:
            # the whole batch (inserts AND deletes) committed before a
            # crash: wholesale skip — the CDC exactly-once guarantee
            log.append(
                {
                    "batch_id": b,
                    "n_appended": 0,
                    "max_share_ppm": _max_share_ppm(),
                    "rebalanced": False,
                    "rebalance_report": None,
                    "compacted": False,
                    "compaction_report": None,
                    "retrained": False,
                    "retrain_report": None,
                    "skipped_replay": True,
                    "n_deleted": 0,
                    "delete_report": None,
                    "n_upserted": 0,
                    "upsert_delete_report": None,
                    "d_id_route": None,
                    "u_id_route": None,
                }
            )
            return
        # ONE bounded job: ops present, per-op row / distinct-D-U-id /
        # NULL-id counts, and a driver id sample CAPPED at
        # cdc_driver_id_cap (slice applies after the set is built
        # executor-side, so at most cap ids per op ever cross to the
        # driver — the id-set SIZE decides the route below; a separate
        # count() was a second batch scan, review finding)
        du_id = F.when(F.col(op_col).isin("D", "U"), F.col(id_col))
        per_op = (
            batch_df.groupBy(F.col(op_col).alias("__op"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(du_id).alias("n_ids"),
                F.count(
                    F.when(F.col(id_col).isNull(), F.lit(1))
                ).alias("n_null_ids"),
                F.slice(
                    F.sort_array(F.collect_set(du_id)),
                    1,
                    int(cdc_driver_id_cap),
                ).alias("ids_capped"),
            )
            .collect()
        )
        if not per_op:
            # empty micro-batch: same silent no-op as the old
            # isEmpty() probe, detected by the one bounded per-op
            # aggregate this path runs anyway (r10: one fewer job on
            # every non-empty batch)
            return
        opset = {r["__op"] for r in per_op}
        if not opset <= {"I", "D", "U"}:
            raise ValueError(
                f"op column {op_col!r} must contain only 'I'/'D'/'U', "
                f"got {sorted(map(str, opset))}"
            )
        row_counts = {r["__op"]: int(r["n_rows"]) for r in per_op}
        n_ids = {r["__op"]: int(r["n_ids"]) for r in per_op}
        null_ids = {r["__op"]: int(r["n_null_ids"]) for r in per_op}
        if null_ids.get("D", 0) or null_ids.get("U", 0):
            # a delete/upsert row without a key is malformed feed data:
            # fail loud (round-8 ADVICE — collect_set's NULL skip used
            # to turn a NULL-id 'D' into a silent no-op)
            raise ValueError(
                f"CDC batch carries NULL ids on {null_ids.get('D', 0)} "
                f"'D' / {null_ids.get('U', 0)} 'U' rows — a "
                "delete/upsert without a key is malformed; fix the feed"
            )
        if "U" in opset and row_counts["U"] != n_ids["U"]:
            # duplicate 'U' rows for one id would land duplicate
            # versions (phase 1 deletes the ONE old version, phase 2
            # appends EVERY row) — fail loud; a CDC feed must compact
            # per key upstream
            raise ValueError(
                f"CDC batch carries {row_counts['U']} 'U' rows for "
                f"{n_ids['U']} distinct ids — duplicate upserts "
                "for one id in a single micro-batch are ambiguous; "
                "compact the feed per key upstream"
            )

        def _id_source(op):
            """(ids, route): the driver list when the op's distinct id
            set fits under cdc_driver_id_cap (isin literal → row-group
            pruning on the delete's hit scan), else the op's id subset
            as a DataFrame (delete_from_ivf_index's broadcast
            semi/anti-join; the ids never materialize on the driver).
            Deterministic per batch — the same replayed batch produces
            the same counts, so a crash-resume recomputes the same
            route and the same intent digest."""
            if n_ids.get(op, 0) <= int(cdc_driver_id_cap):
                (row,) = [r for r in per_op if r["__op"] == op]
                return sorted(int(x) for x in row["ids_capped"]), "list"
            return batch_df.filter(F.col(op_col) == op).select(id_col), "df"

        u_ids, u_route = _id_source("U") if "U" in opset else ([], None)
        d_ids, d_route = _id_source("D") if "D" in opset else ([], None)

        def _apply_delete_report(drep):
            if drep["resumed"]:
                # crash-mid-delete replay: this maintainer's sizes were
                # seeded from the PARTIALLY-deleted index, so applying
                # the intent's full fold would over-subtract — re-seed
                # (one bounded job, on the rare resume path only)
                sizes.clear()
                sizes.update(_list_sizes(spark, path))
            else:
                for lid, n in drep["list_counts"].items():
                    left = sizes.get(lid, 0) - n
                    if left > 0:
                        sizes[lid] = left
                    else:
                        sizes.pop(lid, None)
            for lid in drep["dropped_list_ids"]:
                fcounts.pop(lid, None)
                unsplittable.pop(lid, None)
            if compact_files_per_list is not None and drep["affected_list_ids"]:
                # the delete rewrote the affected partitions: re-survey
                # (driver metadata scan, zero Spark jobs)
                fcounts.clear()
                fcounts.update(_ivf_list_files(path)[0])

        # THREE phases, committed in order, each idempotent:
        #   1. upserts drop their OLD versions (scoped to rows NOT
        #      tagged with this batch — a crashed-then-replayed batch
        #      must never eat the new versions it already appended);
        #   2. inserts land (I and the U replacements; the append txn
        #      gives this leg its own replay skip);
        #   3. plain deletes apply LAST (delete-wins: a key inserted
        #      or upserted and deleted in the same batch ends deleted).
        # A live phase-3 del intent proves phases 1-2 committed (it is
        # only written after them), so a replay jumps straight there —
        # running phase 1 under it would trip the digest guard.
        live = _read_index_json(path, "del_intent.json")
        skip_to_phase3 = (
            live is not None
            and "D" in opset
            and live["digest"] == _delete_ids_digest(d_ids)
        )
        delta = {
            "n_deleted": 0,
            "delete_report": None,
            "n_upserted": n_ids.get("U", 0),
            "upsert_delete_report": None,
            "d_id_route": d_route,
            "u_id_route": u_route,
        }
        # record the log length NOW: whether THIS invocation appended
        # an entry (via the insert leg) decides the fold below — a
        # same-process foreachBatch task retry leaves the failed
        # attempt's entry for batch b in the log, and matching on
        # batch_id folded the retry's delta into that STALE entry,
        # double-reporting per-batch counters (round-8 ADVICE)
        log_len_before = len(log)
        if not skip_to_phase3:
            if "U" in opset:
                # phase 1 via the shared upsert leg: drops the OLD
                # versions scoped by this batch's tag, and SKIPS when a
                # live append intent proves a crashed replay already
                # committed it (_upsert_phase1 — one implementation for
                # the CDC maintainer and batch upsert_ivf_index)
                urep = _upsert_phase1(spark, path, u_ids, id_col, b, txn)
                if urep is not None:
                    _apply_delete_report(urep)
                    delta["upsert_delete_report"] = urep
            if "I" in opset or "U" in opset:
                _maintain_inserts(
                    batch_df.filter(
                        F.col(op_col).isin("I", "U")
                    ).drop(op_col),
                    batch_id,
                )
        if "D" in opset:
            drep = delete_from_ivf_index(spark, path, d_ids, id_col=id_col)
            _apply_delete_report(drep)
            delta["n_deleted"] = drep["n_deleted"]
            delta["delete_report"] = drep
        # batch-complete marker LAST: a crash anywhere above replays
        # the batch through the idempotent insert/delete legs
        txn2 = _read_index_json(path, "txn.json")
        if txn2 is None:
            st = read_index_stats(spark, path)
            txn2 = {
                "last_batch_id": -1,
                "n": st[0],
                "mean_assigned_cos": st[1],
            }
        _write_index_json_atomic(
            path, "txn.json", {**txn2, "last_cdc_batch_id": b}
        )
        if len(log) > log_len_before:
            log[-1].update(delta)  # fold onto the entry THIS
            # invocation's insert leg appended (never a stale entry
            # from a failed same-process attempt)
        else:
            log.append(
                {
                    "batch_id": b,
                    "n_appended": 0,
                    "max_share_ppm": _max_share_ppm(),
                    "rebalanced": False,
                    "rebalance_report": None,
                    "compacted": False,
                    "compaction_report": None,
                    "retrained": False,
                    "retrain_report": None,
                    "skipped_replay": False,
                    **delta,
                }
            )

    return maintain, log


def mine_contrastive_triplets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    pos_threshold: float = 0.95,
    neg_max: float = 0.5,
) -> DataFrame:
    """Mine (anchor, positive, hard negative) triplets for contrastive
    embedding training — the training-pair factory of a retrieval /
    embedding-model data pipeline.

    * ANCHORS are the rows with at least one near-duplicate: positive
      pairs come from the exact blocked BLAS kernel at
      ``cos >= pos_threshold`` (``_all_pairs_cosine_blocked`` — no
      row-at-a-time pair join); each anchor keeps its BEST positive
      (max cos, ties to the lowest id).
    * HARD NEGATIVES are, per anchor, the highest-cosine row at
      ``round(cos,4) <= neg_max`` — close enough to be informative,
      far enough to be a true negative.  The anchor set is
      duplicate-bounded (tiny next to the corpus), so the negative
      scan is ONE broadcast-anchors pass over the corpus with a
      per-anchor top-1 window — at 100 TB swap the scan for an ANN
      top-k probe (``ivf_topk_indexed``) + the same <= neg_max filter;
      the selection rule is unchanged.

    Zero-norm vectors are excluded on both sides of every cosine (no
    defined similarity).  Returns (anchor_id, positive_id,
    negative_id, pos_cos, neg_cos); anchors with no candidate at
    <= neg_max are dropped (inner join) — both deterministic, so any
    SQL engine replays the exact triplet set."""
    v = (
        df.select(F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v"))
        .filter(F.exists("__v", lambda x: x != 0))
        .localCheckpoint(eager=False)  # reused: kernel + negative scan
    )
    from .dedup import _all_pairs_cosine_blocked

    pairs = _all_pairs_cosine_blocked(v, pos_threshold)
    both = pairs.select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("positive_id"),
        "cos",
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor_id"),
            F.col("id_a").alias("positive_id"),
            "cos",
        )
    )
    wpos = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), "positive_id"
    )
    best_pos = (
        both.withColumn("__r", F.row_number().over(wpos))
        .filter(F.col("__r") == 1)
        .select("anchor_id", "positive_id", F.col("cos").alias("pos_cos"))
        .localCheckpoint(eager=False)  # anchors: dup-bounded, reused twice
    )
    from .dedup import _cross_hard_negative_candidates_blocked

    avecs = best_pos.select("anchor_id").join(
        v.select(F.col("__id").alias("anchor_id"), F.col("__v").alias("__av")),
        "anchor_id",
    )
    # argmax candidates via the blocked kernel (BLAS matmuls +
    # rounding-slack retention proof — see the kernel docstring);
    # per-pair HOF cosine here was |anchors| x |corpus| row-at-a-time
    # work (47s warm at sf0.1 vs ~3s kernel-side)
    negcand = _cross_hard_negative_candidates_blocked(
        avecs.select(F.col("anchor_id").alias("__id"), F.col("__av").alias("__v")),
        v,
        neg_max,
    )
    wneg = Window.partitionBy("id_a").orderBy(F.col("__c").desc(), "id_b")
    best_neg = (
        negcand.filter(F.col("id_a") != F.col("id_b"))
        .withColumn("__c", F.round("__cos", 4))
        .filter(F.col("__c") <= neg_max)  # exact JVM round/filter
        .withColumn("__r", F.row_number().over(wneg))
        .filter(F.col("__r") == 1)
        .select(
            F.col("id_a").alias("anchor_id"),
            F.col("id_b").alias("negative_id"),
            F.col("__c").alias("neg_cos"),
        )
    )
    return best_pos.join(best_neg, "anchor_id").select(
        "anchor_id", "positive_id", "negative_id", "pos_cos", "neg_cos"
    )


def rebalance_ivf_index(
    spark,
    path: str,
    id_col: str = "vec_id",
    split_ratio: float = 2.0,
    sub_iters: int = 4,
    seed: int = 42,
    sizes: dict | None = None,
) -> dict:
    """REBALANCE a persisted IVF index: split every list that has
    grown past ``split_ratio`` x the mean list size into two sublists
    — the third leg of the index lifecycle (build once →
    :func:`append_ivf_index` per batch → rebalance when appends skew).
    A hot list hurts twice at scale: every probe that touches it scans
    its whole partition, and drift-driven appends concentrate there —
    splitting restores the ~n/n_centroids scan bound without the full
    rebuild a retrain implies.

    Mechanics, sized so the standing COLD lists are never touched:

    * list sizes come from one partition-pruned count (bounded collect:
      one row per list);
    * each hot list trains TWO sub-centroids on its own vectors
      (:func:`train_ivf_centroids` — parameter-bounded sample, seeded
      per list) and reassigns ONLY its own rows;
    * child A keeps the PARENT's list id, child B takes a fresh id —
      so the dynamic-partition-overwrite write replaces exactly the
      parent partition and creates the new one, leaving no stale rows
      and no deleted-dir bookkeeping (a split whose Lloyd run
      degenerates to one nonempty child is SKIPPED — overwriting the
      parent partition with zero rows would strand the old files);
    * the ``/centroids`` sidecar swaps the parent centroid for the two
      children (collected first — it is n_centroids rows — because
      lazily re-writing a parquet path from its own scan reads
      post-truncation garbage);
    * the ``/stats`` drift baseline is updated INCREMENTALLY: the
      split rows' old assigned-cosine sum is re-derivable against the
      saved parent centroid, so mean' = (sum + Σnew - Σold)/n without
      rescanning the cold lists.

    Returns {n_lists_before, n_split, skipped_degenerate, rows_moved,
    max_share_before_ppm, max_share_after_ppm, new_list_ids,
    split_list_ids, new_sizes} — ``split_list_ids`` are the PARENT ids
    that actually split (what lets the streaming maintainer re-mark
    hot lists whose attempt degenerated, instead of wiping all
    markers); ``new_sizes`` is the exact post-rebalance {list_id:
    rows} map (driver-side, one int per list), so the maintainer's
    re-seed costs zero index scans.

    ``sizes`` lets a caller that already tracks exact per-list sizes
    (the streaming maintainer advances them from append reports) skip
    the seed count — one fewer job on the hot mid-stream path.
    Writer mutual exclusion and ``__batch``-tag preservation: INDEX
    COMMIT PROTOCOL, the module section above."""
    _assert_no_uncommitted_delete(path)
    _assert_no_uncommitted_retrain(path)
    # refuse under an uncommitted APPEND intent too (round-8 ADVICE):
    # the streaming maintainer only rebalances post-commit, but a
    # direct-API rebalance after a crashed append would move the dead
    # attempt's __batch-tagged rows out of the intent's touched
    # partitions, so the replay repair would miss them and the
    # re-append would duplicate rows
    _assert_no_uncommitted_append(path)
    lists = spark.read.parquet(path + "/lists")
    if sizes is None:
        sizes = _list_sizes(spark, path)  # bounded: one row per list
    total = sum(sizes.values())
    mean = total / max(len(sizes), 1)
    hot = sorted(
        lid for lid, n in sizes.items() if n > split_ratio * mean and n >= 2
    )
    max_before = max(sizes.values()) if sizes else 0
    report = {
        "n_lists_before": len(sizes),
        "n_split": 0,
        "skipped_degenerate": 0,
        "rows_moved": 0,
        "max_share_before_ppm": max_before * 1_000_000 // total if total else 0,
        "max_share_after_ppm": max_before * 1_000_000 // total if total else 0,
        "new_list_ids": [],
        "split_list_ids": [],
        "new_sizes": dict(sizes),
    }
    if not hot:
        return report

    cent_rows = dict(
        _read_centroids_rows(spark, path)
    )  # bounded: n_centroids rows; collected BEFORE the sidecar rewrite
    next_id = max(cent_rows) + 1
    reassigned_parts = []
    new_sizes = dict(sizes)
    for lid in hot:
        hot_rows = lists.filter(F.col("list_id") == lid).select(
            id_col,
            "__v",
            # pre-tag index vintage (no __batch column): stamp BASE,
            # the old behavior — review finding: a hard select here
            # regressed a path the repair code still defends
            (
                F.col("__batch")
                if "__batch" in lists.columns
                else F.lit(_BASE_BATCH).alias("__batch")
            ),
        )
        sub = train_ivf_centroids(
            hot_rows, "__v", n_centroids=2, iters=sub_iters, seed=seed + lid
        )
        child_b = next_id
        subs = {  # 2 rows, already driver-local inside the trainer
            (lid if int(r["__list"]) == 0 else child_b): list(r["__cent"])
            for r in sub.collect()
        }
        sub_ids = local_frame(spark, 
            sorted(subs.items()), "__list long, __cent array<double>"
        )
        assigned = _assign_to_lists(
            hot_rows, id_col, "__v", sub_ids, passthrough=("__batch",)
        ).localCheckpoint(eager=False)
        # ONE bounded job per hot list: child sizes + the incremental
        # /stats sums (new assigned cosine, and the split rows' OLD
        # cosine re-derived against the saved parent centroid)
        parent = cent_rows[lid]
        stats_rows = (
            assigned.groupBy("list_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("__best_cos").alias("new_s"),
                F.sum(
                    cosine_similarity(
                        F.col("__v"),
                        F.array(*[F.lit(float(x)) for x in parent]),
                    )
                ).alias("old_s"),
            )
            .collect()  # bounded: 2 rows
        )
        counts = {int(r["list_id"]): int(r["n"]) for r in stats_rows}
        if len(counts) < 2 or min(counts.values()) == 0:
            report["skipped_degenerate"] += 1
            continue
        report.setdefault("_cos_delta", 0.0)
        report["_cos_delta"] += sum(
            float(r["new_s"]) - float(r["old_s"]) for r in stats_rows
        )
        cent_rows[lid] = subs[lid]
        cent_rows[child_b] = subs[child_b]
        reassigned_parts.append(assigned.drop("__best_cos"))
        new_sizes[lid] = counts[lid]
        new_sizes[child_b] = counts[child_b]
        report["n_split"] += 1
        report["rows_moved"] += counts[child_b]
        report["new_list_ids"].append(child_b)
        report["split_list_ids"].append(lid)
        next_id += 1

    if not reassigned_parts:
        report.pop("_cos_delta", None)
        return report

    moved = reassigned_parts[0]
    for p in reassigned_parts[1:]:
        moved = moved.unionByName(p)
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old_mode = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        # PRESERVE each moved row's __batch tag: the CDC upsert
        # replay path scopes its old-version delete by the tag of the
        # batch being replayed, so re-tagging here would let a
        # crashed-then-replayed upsert batch delete the very versions
        # an in-batch rebalance had just moved (review finding, round
        # 8).  Preserving tags is safe for the append replay repair
        # too: a repair only ever targets a batch id NEWER than the
        # committed high-water mark, and every moved row's tag is at
        # or below it (the maintainer commits the batch before its
        # rebalance runs).
        moved.repartition("list_id").write.mode(
            "overwrite"
        ).partitionBy("list_id").parquet(path + "/lists")
    finally:
        spark.conf.set(conf_key, old_mode)

    _write_centroids_sidecar(spark, path, sorted(cent_rows.items()))

    st = read_index_stats(spark, path)
    if st is not None:  # pre-sidecar index: nothing to update
        n, m = st
        new_mean = (m * n + report["_cos_delta"]) / n
        txn = (
            _read_index_json(path, "txn.json") if _txn_possible(path) else None
        )
        if txn is not None:
            # transactional index: the commit record is the stats
            # authority (read_index_stats resolves it first), so the
            # mid-stream rebalance updates it driver-side — zero jobs —
            # and leaves the lagging /stats parquet to the next
            # batch-mode writer
            _write_index_json_atomic(
                path,
                "txn.json",
                {**txn, "n": n, "mean_assigned_cos": new_mean},
            )
        else:
            _write_stats_sidecar(spark, path, n, new_mean)

    report.pop("_cos_delta", None)
    report["max_share_after_ppm"] = (
        max(new_sizes.values()) * 1_000_000 // total if total else 0
    )
    report["new_sizes"] = new_sizes
    return report


def _ivf_list_files(path: str) -> tuple[dict, dict]:
    """Per-list ``({list_id: file count}, {list_id: bytes})`` for a
    persisted IVF index — a driver-side metadata scan (``os.scandir``),
    ZERO Spark jobs.  Local-filesystem only, the same contract as the
    index transaction log; at deployment scale this is one call to the
    table format's file-listing API."""
    import os

    base = _txn_local_path(path, "lists")
    counts: dict = {}
    sizes: dict = {}
    for entry in os.scandir(base):
        if entry.is_dir() and entry.name.startswith("list_id="):
            lid = int(entry.name.split("=", 1)[1])
            n = b = 0
            for f in os.scandir(entry.path):
                if f.is_file() and not f.name.startswith(("_", ".")):
                    n += 1
                    b += f.stat().st_size
            counts[lid], sizes[lid] = n, b
    return counts, sizes


def compact_ivf_index(
    spark,
    path: str,
    max_files_per_list: int = 4,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """COMPACT the fragmented list partitions of a persisted IVF index
    — the fourth lifecycle leg (build → append per batch → rebalance on
    skew → compact on fragmentation).  Every streamed micro-batch
    append adds ONE parquet file per touched list
    (:func:`append_ivf_index` clusters its write by list id), so a
    week-long ingest leaves thousands of small files per hot list and
    every later probe pays per-file open/footer costs plus a task per
    file — the same silent killer :func:`sources.io.compact_table`
    exists for, composed here into the index lifecycle (VERDICT r7
    task 3).

    Mechanics, sized so COLD lists are never touched:

    * per-list file counts and bytes come from one driver-side metadata
      scan (zero Spark jobs); only lists with more than
      ``max_files_per_list`` files are rewritten;
    * output file count per hot list follows compact_table's sizing
      rule — from the actual BYTES (``ceil(bytes/target_file_bytes)``),
      never the input file count — implemented as a shuffle on
      ``(list_id, salt)`` with a per-list salt modulus, so one job
      rewrites every hot list at once;
    * the rewrite is a dynamic-partition overwrite of exactly the hot
      list partitions (the established rebalance/repair pattern —
      partition-selective, unlike compact_table's whole-table staged
      swap, because rewriting the cold lists would turn an O(hot)
      maintenance task into an O(index) one), reading through a
      ``localCheckpoint`` since it overwrites the very partitions it
      reads;
    * rows, assignments, ``__batch`` tags, ``/centroids``, and the
      stats record are all UNCHANGED — compaction moves bytes, not
      rows, so conservation and probe results are bit-identical;
    * an index with an UNCOMMITTED append intent refuses to compact:
      folding a crashed attempt's tagged rows into compacted files
      would not break the replay repair (it filters on the ``__batch``
      DATA column), but the repair's rewrite and this rewrite racing
      the same partitions is a second-writer scenario the local-fs log
      forbids — fail loud, let the replay repair first.

    Returns {n_lists, n_compacted, compacted_list_ids, files_before,
    files_after, rows} — ``rows`` is the exact rewritten row count
    (from the checkpoint materialization, no extra job), letting
    callers assert conservation cheaply.  Writer mutual exclusion:
    INDEX COMMIT PROTOCOL, the module section above."""
    import math

    if not _txn_possible(path):
        raise ValueError(
            "compact_ivf_index's partition rewrite assumes a local "
            f"filesystem (got {path!r}) — use a table-format rewrite "
            "commit (Delta OPTIMIZE / Iceberg rewrite_data_files) on "
            "object stores"
        )
    _assert_no_uncommitted_delete(path)
    _assert_no_uncommitted_retrain(path)
    _assert_no_uncommitted_append(path)

    counts, sizes = _ivf_list_files(path)
    hot = sorted(
        lid for lid, c in counts.items() if c > max_files_per_list
    )
    report = {
        "n_lists": len(counts),
        "n_compacted": len(hot),
        "compacted_list_ids": hot,
        "files_before": sum(counts.values()),
        "files_after": sum(counts.values()),
        "rows": 0,
    }
    if not hot:
        return report

    n_out = {
        lid: max(1, math.ceil(sizes[lid] / target_file_bytes)) for lid in hot
    }
    lists = spark.read.parquet(path + "/lists")
    salt_mod = F.create_map(
        *[F.lit(x) for lid in hot for x in (lid, n_out[lid])]
    )[F.col("list_id")]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in lists.columns]), salt_mod
    )
    hot_df = (
        lists.filter(F.col("list_id").isin([int(x) for x in hot]))
        # deterministic row-hash salt splits an over-target list into
        # ~ceil(bytes/target) writers; under-target lists collapse to
        # salt 0 => one file per list
        .repartition(F.col("list_id"), salt)
        .localCheckpoint()  # EAGER: materialize before the overwrite
        # deletes the files this plan reads (rebalance/repair pattern)
    )
    report["rows"] = hot_df.count()  # served from the checkpoint
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old_mode = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        hot_df.write.mode("overwrite").partitionBy("list_id").parquet(
            path + "/lists"
        )
    finally:
        spark.conf.set(conf_key, old_mode)
    after, _ = _ivf_list_files(path)
    report["files_after"] = sum(after.values())
    return report


def retrain_ivf_index(
    spark,
    path: str,
    id_col: str = "vec_id",
    n_centroids: int | None = None,
    train_iters: int = 4,
    seed: int = 43,
) -> dict:
    """RETRAIN a persisted IVF index in place — the SIXTH lifecycle leg
    (build → append → rebalance → compact → delete/upsert → retrain),
    and the one the drift detector exists to trigger: once appended
    batches report ``retrain_recommended`` (their vectors sit far from
    every centroid, so probe recall degrades), splitting hot lists no
    longer helps — the centroids must be RE-TRAINED on what the index
    now contains.  :func:`build_ivf_index` cannot serve a LIVE index
    here: a rebuild starts a fresh transaction history, so a streaming
    ingest that crashes right after a mid-stream rebuild loses the
    replay-skip protection for its in-flight batch.  Retrain preserves
    the commit record (``last_batch_id`` / ``last_cdc_batch_id`` carry
    over; only the stats fold is refreshed), so exactly-once
    continuity survives the re-tiling.

    Mechanics — a STAGED SWAP, because this is the one leg that
    rewrites O(index) rather than O(affected partitions), and an
    in-place overwrite of the tree being read is not crash-safe at
    that size:

    * centroids re-train on the index's current rows
      (:func:`train_ivf_centroids` — parameter-bounded sample, one
      pass), every row reassigns (``__batch`` tags ride through), and
      the new layout lands in ``lists_stage`` / ``centroids_stage``
      NEXT TO the live tree — readers are untouched while the
      expensive work runs;
    * ``retrain_intent.json`` (the absolute post-retrain stats) is
      written only after the stage is COMPLETE, then the swap renames
      live → trash → stage → live per sidecar, refreshes the stats
      records from the intent, removes the intent, and drops the
      trash — every step idempotent, so a re-run after a crash at ANY
      point completes the swap (a live intent means the stage is
      whole; a crash before the intent leaves only garbage stage dirs
      the next retrain overwrites);
    * every other writer refuses under a live retrain intent
      (:func:`_assert_no_uncommitted_retrain`), and retrain refuses
      under live append/delete intents — full mutual exclusion.

    At deployment scale the staged swap is REPLACE TABLE AS SELECT /
    ``rewrite_data_files`` on the table format; crash/resume rules:
    INDEX COMMIT PROTOCOL, the module section above.

    ``n_centroids`` defaults to the index's current centroid count.
    Returns {n, n_centroids, mean_before, mean_after, resumed}
    (``mean_before`` is ``None`` on a resume — the pre-swap baseline
    is gone by then)."""
    import os

    if not _txn_possible(path):
        raise ValueError(
            "retrain_ivf_index's staged swap assumes a local "
            f"filesystem (got {path!r}) — use REPLACE TABLE AS SELECT "
            "(Delta/Iceberg) on object stores"
        )
    intent = _read_index_json(path, "retrain_intent.json")
    if intent is not None:
        # crashed mid-swap: the intent proves the stage was complete —
        # finish the swap with the intent's absolute stats
        rep = _finish_retrain_swap(spark, path, intent)
        rep["resumed"] = True
        rep["mean_before"] = None
        return rep
    _assert_no_uncommitted_delete(path)
    _assert_no_uncommitted_append(path)

    st = read_index_stats(spark, path)
    mean_before = st[1] if st is not None else None
    lists = spark.read.parquet(path + "/lists")
    rows = lists.select(
        id_col,
        "__v",
        (
            F.col("__batch")
            if "__batch" in lists.columns
            else F.lit(_BASE_BATCH).alias("__batch")
        ),
    )
    k = (
        int(n_centroids)
        if n_centroids is not None
        else len(_read_centroids_rows(spark, path))
    )
    cents = train_ivf_centroids(
        rows, "__v", n_centroids=k, iters=train_iters, seed=seed
    )
    assigned = _assign_to_lists(
        rows, id_col, "__v", cents, passthrough=("__batch",)
    ).localCheckpoint(eager=False)
    root = path.removeprefix("file://")
    import shutil

    for name in ("lists_stage", "centroids_stage"):
        # garbage from a retrain that crashed BEFORE its intent
        shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    assigned.drop("__best_cos").repartition("list_id").write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(path + "/lists_stage")
    _write_centroids_sidecar(
        spark,
        path,
        [(int(r["__list"]), list(r["__cent"])) for r in cents.collect()],
        name="centroids_stage",
    )
    agg = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__best_cos").alias("m"),
    ).collect()[0]
    intent = {
        "n": int(agg["n"]),
        "mean_assigned_cos": float(agg["m"]),
        "n_centroids": k,
    }
    # intent AFTER the stage is complete: from here the swap is owed
    _write_index_json_atomic(path, "retrain_intent.json", intent)
    rep = _finish_retrain_swap(spark, path, intent)
    rep["resumed"] = False
    rep["mean_before"] = mean_before
    return rep


def _finish_retrain_swap(spark, path: str, intent: dict) -> dict:
    """Complete a retrain's staged swap — IDEMPOTENT per step, so a
    crashed swap re-runs to completion: per sidecar, move the live
    tree to ``*_trash`` (skipped when a prior attempt already did),
    rename the stage in (skipped when already in), then refresh the
    stats records from the intent's ABSOLUTE numbers (idempotent
    rewrite; ``last_batch_id`` / ``last_cdc_batch_id`` carry over),
    remove the intent LAST, and drop the trash."""
    import contextlib
    import os
    import shutil

    root = path.removeprefix("file://")
    for name in ("lists", "centroids"):
        stage = os.path.join(root, name + "_stage")
        live = os.path.join(root, name)
        trash = os.path.join(root, name + "_trash")
        if os.path.exists(stage):
            if os.path.exists(live):
                shutil.rmtree(trash, ignore_errors=True)
                os.rename(live, trash)
            os.rename(stage, live)
        # else: a crashed attempt already swapped this sidecar in
    n, mean = int(intent["n"]), float(intent["mean_assigned_cos"])
    _write_stats_sidecar(spark, path, n, mean)
    txn = _read_index_json(path, "txn.json")
    if txn is not None:
        _write_index_json_atomic(
            path, "txn.json", {**txn, "n": n, "mean_assigned_cos": mean}
        )
    with contextlib.suppress(FileNotFoundError):
        os.remove(_txn_local_path(path, "retrain_intent.json"))
    for name in ("lists_trash", "centroids_trash"):
        shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return {
        "n": n,
        "n_centroids": int(intent["n_centroids"]),
        "mean_after": mean,
    }


def _delete_ids_digest(ids, exclude_batch: int | None = None) -> dict:
    """Order-free digest of a delete's id set (plus its
    ``exclude_batch`` scope — two deletes of the same ids with
    different scopes are DIFFERENT operations), stored in the intent
    so a resume can verify it is completing the SAME delete (a
    different id set under a live intent is a logic error, not a
    resume).  For a driver-side list the digest is a sha256 over the
    sorted ids; for a DataFrame it is (count, xor of xxhash64) over
    the distinct ids — one tiny job, no collect of the id set."""
    import hashlib

    xb = None if exclude_batch is None else int(exclude_batch)
    if isinstance(ids, (list, tuple, set, frozenset)):
        ser = ",".join(str(int(x)) for x in sorted({int(x) for x in ids}))
        return {
            "kind": "list",
            "sha": hashlib.sha256(ser.encode()).hexdigest(),
            "exclude_batch": xb,
        }
    d = ids.select(F.col(ids.columns[0]).cast("long").alias("__del_id"))
    r = (
        d.distinct()
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.expr("bit_xor(xxhash64(__del_id))").alias("x"),
        )
        .collect()[0]
    )
    return {
        "kind": "df",
        "count": int(r["c"]),
        "xor": int(r["x"] or 0),
        "exclude_batch": xb,
    }


def delete_from_ivf_index(
    spark,
    path: str,
    ids,
    id_col: str = "vec_id",
    exclude_batch: int | None = None,
) -> dict:
    """DELETE vectors by id from a persisted IVF index — the FIFTH
    lifecycle leg (build → append → rebalance → compact → delete), and
    the one a curation pipeline reaches for the moment dedup or
    decontamination flags indexed documents: the flagged vectors must
    stop surfacing as neighbors WITHOUT rebuilding a 100 TB index.

    ``ids`` is a driver-side list/tuple/set of ids (becomes an
    ``isin`` literal, so parquet row-group min/max statistics prune
    the hit scan) or a single-column DataFrame (broadcast
    semi/anti-join — the shape when the flag set is itself a Spark
    computation, or too large to materialize on the driver).  Ids must
    be INTEGER-VALUED (long-castable) on BOTH routes — the list route
    coerces with ``int()`` and the DataFrame route casts to long for
    the (count, xor-of-xxhash64) digest, so a string-id corpus needs a
    surrogate integer key before it can use the delete leg (round-8
    ADVICE: the contract was enforced but undocumented).  Mechanics,
    sized so the REWRITE is bounded by the partitions that actually
    contain hits:

    * one scan finds the hits and folds their per-list counts and
      assigned-cosine sum (recomputed against the broadcast centroid
      table — n_centroids rows — inside the same scan; the stored rows
      carry only the vector);
    * only AFFECTED list partitions are rewritten (anti-join + eager
      ``localCheckpoint`` + dynamic partition overwrite — the
      compaction/repair pattern; cold lists keep their files
      byte-identical), and a list whose every row is deleted has its
      partition directory dropped;
    * the running stats record updates by the exact inverse of the
      append fold (mean weighted by row counts, the established
      convention), kept in LOCKSTEP across the txn commit record and
      the ``/stats`` parquet like every batch-mode writer;
    * the whole operation is CRASH-SAFE through ``del_intent.json``:
      the intent carries the id-set digest, the affected lists, and
      the absolute POST-delete stats, written before the rewrite.  A
      re-run with the same ids RESUMES (the row rewrite is idempotent
      — already-deleted rows simply produce no hits — and the commit
      writes the intent's absolute stats, so a crash at any point
      double-applies nothing); a re-run with different ids refuses;
      append/rebalance/compact refuse while the intent is live.

    At deployment scale the same contract is a Delta/Iceberg DELETE
    (deletion vectors / positional deletes + the format's commit);
    this is that pattern on the local-fs JSON log the index already
    uses for exactly-once appends.  Commit/crash rules: INDEX COMMIT
    PROTOCOL, the module section above.

    ``exclude_batch`` scopes the delete to rows NOT written by the
    given ``__batch`` tag — the replay-safety hook the CDC upsert leg
    needs: an upsert's delete-the-old-version phase must never eat the
    new version a crashed-then-replayed batch already appended.  The
    scope is part of the intent digest (same ids, different scope =
    different operation).

    Returns {n_deleted, affected_list_ids, dropped_list_ids,
    list_counts, n_after, mean_after, resumed}."""
    import os
    import shutil

    if not _txn_possible(path):
        raise ValueError(
            "delete_from_ivf_index's partition rewrite assumes a local "
            f"filesystem (got {path!r}) — use a table-format DELETE "
            "(Delta deletion vectors / Iceberg positional deletes) on "
            "object stores"
        )
    _assert_no_uncommitted_retrain(path)
    txn = _assert_no_uncommitted_append(path)

    digest = _delete_ids_digest(ids, exclude_batch)
    live = _read_index_json(path, "del_intent.json")
    resumed = False
    if live is not None:
        if live["digest"] != digest:
            raise RuntimeError(
                "ivf index has an uncommitted delete intent for a "
                "DIFFERENT id set: re-run with the original ids so its "
                "resume completes first"
            )
        resumed = True  # same delete, crashed mid-flight: complete it

    lists = spark.read.parquet(path + "/lists")
    if isinstance(ids, (list, tuple, set, frozenset)):
        idlist = [int(x) for x in ids]
        hit_pred = F.col(id_col).isin(idlist)
        if exclude_batch is not None:
            hit_pred = hit_pred & ~F.col("__batch").eqNullSafe(
                F.lit(int(exclude_batch))
            )
        hits = lists.filter(hit_pred)

        def keep(df):
            # the exact complement of the hit predicate — one
            # definition, no drift (review finding)
            return df.filter(~hit_pred)

    else:
        bids = F.broadcast(
            ids.select(
                F.col(ids.columns[0]).cast("long").alias("__del_id")
            ).distinct()
        )

        def _on(df):
            return df[id_col] == bids["__del_id"]

        if exclude_batch is None:
            hits = lists.join(bids, _on(lists), "left_semi")

            def keep(df):
                return df.join(bids, _on(df), "left_anti")

        else:
            xb = F.lit(int(exclude_batch))
            hits = lists.filter(
                ~F.col("__batch").eqNullSafe(xb)
            ).join(bids, _on(lists), "left_semi")

            def keep(df):
                # keep = NOT (id matches AND batch differs): split the
                # frame so the anti-join applies only to other-batch rows
                own = df.filter(F.col("__batch").eqNullSafe(xb))
                rest = df.filter(~F.col("__batch").eqNullSafe(xb))
                return rest.join(bids, _on(rest), "left_anti").unionByName(own)

    if resumed:
        # the intent's fold is authoritative: rows the crashed attempt
        # already removed produce no hits on re-scan, so recomputing
        # the fold here would under-count the delete
        affected = [int(x) for x in live["affected"]]
        d_n = int(live["d_n"])
        post_n, post_mean = int(live["post_n"]), float(live["post_mean"])
        list_counts = {int(k): int(v) for k, v in live["list_counts"].items()}
    else:
        # re-score the hits against their assigned centroid (broadcast
        # n_centroids rows) so the stats fold can subtract exactly what
        # the build/append folds added
        cents = F.broadcast(
            _centroids_df(spark, path).select(
                F.col("__list").alias("list_id"), F.col("__cent")
            )
        )
        per = (
            hits.join(cents, "list_id")
            .withColumn(
                "__bc", cosine_similarity(F.col("__v"), F.col("__cent"))
            )
            .groupBy("list_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("__bc").alias("ns"),
                F.sum("__bc").alias("s"),
            )
            .collect()  # bounded: one row per AFFECTED list
        )
        affected = sorted(int(r["list_id"]) for r in per)
        list_counts = {int(r["list_id"]): int(r["n"]) for r in per}
        d_n = sum(int(r["n"]) for r in per)
        if d_n == 0:
            st = read_index_stats(spark, path)
            return {
                "n_deleted": 0,
                "affected_list_ids": [],
                "dropped_list_ids": [],
                "list_counts": {},
                "n_after": st[0] if st else None,
                "mean_after": st[1] if st else None,
                "resumed": False,
            }
        d_ns = sum(int(r["ns"]) for r in per)
        d_mean = (
            sum(float(r["s"]) for r in per if r["s"] is not None) / d_ns
            if d_ns
            else 0.0
        )
        st = read_index_stats(spark, path)
        if st is None:
            raise ValueError(
                "delete_from_ivf_index needs the index stats record "
                "(pre-sidecar index: run a rebuild first)"
            )
        pre_n, pre_mean = st
        post_n = pre_n - d_n
        # exact inverse of the append fold (means weighted by row
        # counts — the record's established convention)
        post_mean = (
            (pre_mean * pre_n - d_mean * d_n) / post_n if post_n else 0.0
        )
        _write_index_json_atomic(
            path,
            "del_intent.json",
            {
                "digest": digest,
                "affected": affected,
                "d_n": d_n,
                "post_n": post_n,
                "post_mean": post_mean,
                # per-list deleted counts: what lets the streaming
                # maintainer keep its driver-side size map exact
                # across a CDC delete (and its resume)
                "list_counts": {str(k): v for k, v in list_counts.items()},
            },
        )

    # rewrite ONLY the affected partitions; idempotent under resume
    kept = (
        keep(lists.filter(F.col("list_id").isin(affected)))
        .localCheckpoint()  # EAGER: materialize before the overwrite
        # deletes the files this plan reads (compaction's pattern)
    )
    if not resumed:
        # kept-per-list = exact on-disk rows (parquet footers,
        # driver-side metadata — the _list_sizes convention) minus the
        # hit fold's per-list deleted counts: an arithmetic identity,
        # so the separate Spark count job the old path paid is pure
        # overhead (r11, guide §1.2).  ONLY valid pre-crash: a RESUME
        # may find partitions the dead attempt already rewrote (their
        # hits are gone from disk), so it keeps the recount below.
        import pyarrow.parquet as pq

        lists_base = _txn_local_path(path, "lists")
        counts = {}
        for lid in affected:
            d = os.path.join(lists_base, f"list_id={lid}")
            on_disk = 0
            if os.path.isdir(d):
                for f in os.scandir(d):
                    if f.is_file() and not f.name.startswith(("_", ".")):
                        on_disk += pq.ParquetFile(f.path).metadata.num_rows
            counts[lid] = on_disk - list_counts.get(lid, 0)
            if counts[lid] < 0:
                raise RuntimeError(
                    f"ivf delete found list {lid} with {on_disk} on-disk "
                    f"rows but {list_counts.get(lid, 0)} counted hits — "
                    "a second writer touched the index mid-delete"
                )
    else:
        counts = {
            int(r["list_id"]): int(r["n"])
            for r in kept.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: affected lists only
        }
    nonempty = [lid for lid in affected if counts.get(lid, 0) > 0]
    dropped = [lid for lid in affected if counts.get(lid, 0) == 0]
    if nonempty:
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        old_mode = spark.conf.get(conf_key, "static")
        spark.conf.set(conf_key, "dynamic")
        try:
            kept.filter(F.col("list_id").isin(nonempty)).repartition(
                "list_id"
            ).write.mode("overwrite").partitionBy("list_id").parquet(
                path + "/lists"
            )
        finally:
            spark.conf.set(conf_key, old_mode)
    local_lists = _txn_local_path(path, "lists")
    for lid in dropped:
        # dynamic overwrite cannot write an empty partition: drop the
        # dir (local-fs contract, see the txn module note)
        shutil.rmtree(
            os.path.join(local_lists, f"list_id={lid}"), ignore_errors=True
        )

    # COMMIT: absolute post-delete stats from the intent (idempotent —
    # a crash after any partial commit step re-writes the same
    # values), lockstep across both records, intent removed last
    _write_stats_sidecar(spark, path, post_n, post_mean)
    if txn is not None:
        _write_index_json_atomic(
            path,
            "txn.json",
            {**txn, "n": post_n, "mean_assigned_cos": post_mean},
        )
    import contextlib

    with contextlib.suppress(FileNotFoundError):
        os.remove(_txn_local_path(path, "del_intent.json"))
    return {
        "n_deleted": d_n,
        "affected_list_ids": affected,
        "dropped_list_ids": sorted(dropped),
        "list_counts": list_counts,
        "n_after": post_n,
        "mean_after": post_mean,
        "resumed": resumed,
    }


def _upsert_phase1(
    spark, path: str, ids, id_col: str, batch_id: int | None, txn: dict | None
):
    """Phase 1 of an upsert — drop the STANDING (old) versions of the
    ids about to be (re)inserted — the ONE implementation the CDC
    maintainer and :func:`upsert_ivf_index` share.

    With ``batch_id`` (the streaming shape) the delete is scoped to
    rows NOT tagged with that batch (a crashed-then-replayed batch
    must never eat the new versions it already appended), and a live
    append intent for ``batch_id`` newer than the commit record proves
    phase 1 already committed before a crash inside phase 2: the
    replay SKIPS it and returns ``None`` (running the delete under the
    live intent would trip the second-writer guard; the repair that
    clears the intent lives inside phase 2's append — review finding,
    round 8: the old order wedged the stream permanently).

    With ``batch_id=None`` (the batch shape) the delete is unscoped —
    which is what makes a RETRIED batch upsert self-heal: a crash
    mid-phase-2 leaves half-appended new versions carrying the same
    ids, the retry's phase 1 deletes them along with any standing old
    versions, and phase 2 re-appends the batch whole."""
    if batch_id is not None:
        app_intent = _read_index_json(path, "txn_intent.json")
        committed = (
            int(txn.get("last_batch_id", -1)) if txn is not None else -1
        )
        if (
            app_intent is not None
            and int(app_intent["batch_id"]) == int(batch_id)
            and int(app_intent["batch_id"]) > committed
        ):
            return None
    return delete_from_ivf_index(
        spark, path, ids, id_col=id_col, exclude_batch=batch_id
    )


def upsert_ivf_index(
    new_batch: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    upsert_ids=None,
    batch_id: int | None = None,
    drift_ratio_threshold: float = 0.8,
) -> dict:
    """UPSERT a batch into a persisted IVF index: replace the standing
    versions of the batch's ids with the batch's vectors — the
    re-embedded-document case — and insert ids the index has never
    seen, composed as delete-old + append-new on the same
    intent/digest machinery the CDC maintainer runs (VERDICT r8 task
    4: upsert used to exist only inside the maintainer, so a batch
    re-embedding pipeline had to hand-roll the two legs and their
    crash rules).  Batch and streaming share one implementation: the
    maintainer's upsert phases ARE :func:`_upsert_phase1` +
    :func:`append_ivf_index`, exactly what runs here.

    Two phases, committed in order:

    1. the OLD versions are dropped via :func:`delete_from_ivf_index`
       (partition-bounded rewrite, crash-safe ``del_intent.json``
       resume).  ``upsert_ids`` narrows which ids are treated as
       replacements (default: every id in ``new_batch``) and may be a
       driver list or a single-column DataFrame (broadcast anti-join —
       a mass re-embedding never materializes ids on the driver); ids
       must be integer-valued, the delete leg's documented contract.
       Ids not currently indexed delete zero rows, so an upsert of a
       new id degrades to a plain insert.
    2. the batch lands via :func:`append_ivf_index` (assign to the
       standing centroids, append into exactly the touched list
       partitions, fold the stats record) — count-neutral overall when
       every id was already indexed.

    Crash safety: with ``batch_id`` (the streaming shape) phase 1 is
    ``exclude_batch``-scoped and skipped when a live append intent
    proves it already committed, and phase 2 carries the transaction
    log's exactly-once replay skip — the CDC maintainer's guarantees.
    Without ``batch_id`` (the batch shape) a crash mid-phase-2 is
    healed by RETRYING the same upsert: phase 1's unscoped delete
    removes the half-appended new versions along with the standing old
    ones (same ids), then phase 2 re-appends the batch whole; a crash
    mid-phase-1 resumes through the delete intent.

    Returns {n_rows, n_replaced, delete_report (``None`` when phase 1
    was skipped on a replay), append_report, skipped_replay}.
    Commit/crash rules: INDEX COMMIT PROTOCOL, the module section
    above."""
    spark = new_batch.sparkSession
    txn = _read_index_json(path, "txn.json") if _txn_possible(path) else None
    if (
        batch_id is not None
        and txn is not None
        and int(batch_id) <= int(txn.get("last_batch_id", -1))
    ):
        # the whole upsert committed before a crash: wholesale skip
        return {
            "n_rows": 0,
            "n_replaced": 0,
            "delete_report": None,
            "append_report": None,
            "skipped_replay": True,
        }
    ids = upsert_ids if upsert_ids is not None else new_batch.select(id_col)
    drep = _upsert_phase1(spark, path, ids, id_col, batch_id, txn)
    arep = append_ivf_index(
        new_batch,
        id_col,
        vec_col,
        path,
        drift_ratio_threshold=drift_ratio_threshold,
        batch_id=batch_id,
    )
    return {
        "n_rows": arep["n_appended"],
        "n_replaced": 0 if drep is None else drep["n_deleted"],
        "delete_report": drep,
        "append_report": arep,
        "skipped_replay": bool(arep.get("skipped_replay")),
    }


def _cosine_seq(a: list, b: list) -> float | None:
    """EXACT driver-side replica of the ``cosine_similarity`` HOF
    expression: identical IEEE double operations in identical order
    (left-to-right product accumulation, sqrt'd norms, one multiply
    then one divide), so a driver-computed centroid ranking is
    bit-for-bit the JVM ranking.  ``None`` for a zero norm (the
    expression's non-ANSI 0/0 -> NULL)."""
    import math

    if len(a) != len(b):
        return None  # zip_with pads with NULL -> NULL product -> NULL
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    if denom == 0.0:
        return None
    return dot / denom


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    max_driver_queries: int = 256,
) -> DataFrame:
    """Query a persisted IVF index: assign each query to its ``nprobe``
    nearest centroids, then scan ONLY the matching list partitions
    (the probed list ids are pushed as a literal partition filter so
    pruning happens at planning time).  Returns
    (query_id, neighbor_id, rank, cos).

    Query sets at or under ``max_driver_queries`` rows are collected
    and assigned DRIVER-side against the (n_centroids-row) centroid
    sidecar (r10): the assignment is queries x centroids x dim scalar
    work — microseconds — and the driver replica of the cosine fold is
    bit-identical to the JVM expression (:func:`_cosine_seq`), so the
    probe set is exactly the JVM path's while skipping the
    crossJoin + window + distinct-collect job chain the old path paid
    per call.  Larger query sets keep the distributed assignment."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    )
    qrows = q.limit(max_driver_queries + 1).collect()
    if len(qrows) <= max_driver_queries:
        # centroid sidecar read is driver-side too (r10): the whole
        # assignment needs zero Spark jobs beyond the query collect
        cent_rows = _read_centroids_rows(spark, path)
        assigned_rows = []
        for r in qrows:
            ranked = sorted(
                (
                    (_cosine_seq(list(r["__qv"]), cvec), clid)
                    for clid, cvec in cent_rows
                ),
                # JVM order: __csim DESC NULLS LAST, then __cent_id ASC
                key=lambda t: (
                    t[0] is None,
                    -(t[0] if t[0] is not None else 0.0),
                    t[1],
                ),
            )
            for _, lid in ranked[:nprobe]:
                assigned_rows.append((r["query_id"], list(r["__qv"]), lid))
        qid_t = q.schema["query_id"].dataType.simpleString()
        q_assigned = local_frame(spark, 
            assigned_rows,
            f"query_id {qid_t}, __qv array<double>, list_id long",
        )
        probed = sorted({lid for _, _, lid in assigned_rows})
    else:
        cents = F.broadcast(
            _centroids_df(spark, path).select(
                F.col("__list").alias("__cent_id"), F.col("__cent")
            )
        )
        q_scored = q.crossJoin(cents).withColumn(
            "__csim", cosine_similarity(F.col("__qv"), F.col("__cent"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("__csim").desc(), F.col("__cent_id")
        )
        q_assigned = (
            q_scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= nprobe)
            .select("query_id", "__qv", F.col("__cent_id").alias("list_id"))
        )
        # literal probe set -> planning-time partition pruning
        probed = sorted(
            {
                r["list_id"]
                for r in q_assigned.select("list_id").distinct().collect()
            }
        )
    lists = spark.read.parquet(path + "/lists").filter(
        F.col("list_id").isin(*[int(p) for p in probed])
    )
    cand = (
        lists.join(F.broadcast(q_assigned), "list_id")
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.col("__v").alias("__cv"),
            "__qv",
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cos", F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 4)
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN + exact re-rank
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    m_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 8,
    seed: int = 42,
    sample_size: int = 4096,
):
    """Per-subspace k-means codebooks for product quantization.

    The vector space is split into ``m_subspaces`` contiguous blocks;
    each block gets its own ``n_codes``-centroid L2 codebook, so a
    corpus vector compresses to ``m_subspaces`` small codes (here 8
    codes for a 64-float vector: 32x smaller than float32 storage) —
    the standard memory lever for billion-vector ANN, where full
    vectors no longer fit executor memory but codes do.

    Training mirrors :func:`train_ivf_centroids`'s scale discipline:
    a deterministic hash-ordered sample BOUNDED BY ``sample_size``
    (independent of corpus size), unit-normalized (scoring is inner
    product on the sphere), Lloyd rounds in numpy on the driver —
    codebook bytes are ``m * k * dim`` floats, trivially closure-
    shipped.  Seeded init = lowest-hash sample rows per subspace;
    ties in assignment go to the lowest code id; empty codes keep
    their previous centroid.  Returns a numpy array (m, k, dim//m).
    """
    import numpy as np

    v = corpus.select(_as_double(vec_col).alias("__v"))
    rows = (
        v.withColumn("__h", F.xxhash64(F.lit(seed), F.col("__v").cast("string")))
        .orderBy("__h")
        .limit(sample_size)
        .collect()
    )
    m = np.array([r["__v"] for r in rows], dtype=np.float64)
    if m.ndim == 2 and len(m):
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m[norms[:, 0] > 0] / norms[norms[:, 0] > 0]
    if m.ndim != 2 or len(m) < n_codes:
        raise ValueError(
            f"PQ training needs >= n_codes non-zero vectors "
            f"(got {0 if m.ndim != 2 else len(m)} < {n_codes})"
        )
    dim = m.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    dsub = dim // m_subspaces
    books = np.empty((m_subspaces, n_codes, dsub))
    for s in range(m_subspaces):
        sub = m[:, s * dsub : (s + 1) * dsub]
        cents = sub[: n_codes].copy()  # hash order IS the seeded order
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            best = np.argmin(d2, axis=1)  # first minimum -> lowest code id
            for j in range(n_codes):
                members = sub[best == j]
                if len(members):
                    cents[j] = members.mean(axis=0)
        books[s] = cents
    return books


def _pq_assign(vecs, codebooks):
    """Per-subspace nearest codes for unit-norm row vectors (numpy);
    first minimum -> lowest code id.  Shared by :func:`pq_encode` and
    the IVFPQ assign+encode pass."""
    import numpy as np

    mm, _, dsub = codebooks.shape
    codes = np.empty((len(vecs), mm), dtype=np.int32)
    for s in range(mm):
        sub = vecs[:, s * dsub : (s + 1) * dsub]
        d2 = ((sub[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1)
    return codes


def _exact_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    short: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact cosine re-rank of a (query_id, neighbor_id) shortlist:
    full vectors are fetched for the shortlist only (broadcast semi
    join), queries broadcast, deterministic (cos desc, id) tiebreak.
    Shared tail of every compressed-domain ANN path."""
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    )
    qdf = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
        )
    )
    rer = (
        vecs.join(F.broadcast(short), "neighbor_id")
        .join(qdf, "query_id")
        .withColumn(
            "cos", F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 4)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def pq_encode(
    corpus: DataFrame, id_col: str, vec_col: str, codebooks
) -> DataFrame:
    """(neighbor_id, __codes) — each corpus vector unit-normalized and
    quantized to its per-subspace nearest code (Arrow mapInPandas; the
    codebook array rides the task closure).  Zero-norm vectors are
    dropped (no defined cosine), matching every other ANN path."""
    import numpy as np
    import pandas as pd

    def encode(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            nz = norms[:, 0] > 0
            ids, vecs = ids[nz], vecs[nz] / norms[nz]
            if not len(ids):
                continue
            yield pd.DataFrame(
                {"neighbor_id": ids, "__codes": list(_pq_assign(vecs, codebooks))}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, "neighbor_id long, __codes array<int>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m_subspaces: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    seed: int = 42,
    codebooks=None,
) -> DataFrame:
    """PQ ANN with asymmetric-distance scoring and exact re-rank — the
    production shape for embedding search when vectors outgrow memory:

    1. corpus compressed once to per-subspace codes (32x smaller than
       float32 here; at scale the codes table is what stays hot);
    2. each query builds an (m x k) lookup table of partial inner
       products against the codebooks, and every corpus item is scored
       from its CODES ONLY — m table lookups, no vector arithmetic —
       keeping a per-partition partial top-``shortlist``;
    3. only the merged shortlist joins back to the full vectors for
       exact cosine re-ranking (the expensive fetch touches
       ``shortlist`` rows per query, not the corpus).

    Deterministic end to end (seeded sampling/training, first-minimum
    code assignment, id tiebreaks).  Returns
    (query_id, neighbor_id, rank, cos) with exact re-ranked cosine."""
    import numpy as np
    import pandas as pd

    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, vec_col, m_subspaces=m_subspaces, n_codes=n_codes, seed=seed
        )
    mm, kk, dsub = codebooks.shape
    codes = pq_encode(corpus, id_col, vec_col, codebooks)

    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows])
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qm /= np.where(qn == 0, 1.0, qn)
    # LUT[q, s, c] = <query subvector s, codebook centroid c of s>
    luts = np.einsum(
        "qsd,scd->qsc", qm.reshape(len(q_ids), mm, dsub), codebooks
    )

    def score(batches):
        for pdf in batches:
            ids = pdf["neighbor_id"].to_numpy()
            codes_m = np.array(pdf["__codes"].tolist(), dtype=np.int64)
            if not len(ids):
                continue
            for qi, qid in enumerate(q_ids):
                # ADC: sum of m lookups per corpus item; cutoff ties
                # broken by neighbor id (lexsort: primary -score,
                # secondary id) so the shortlist is row-order-free
                s = luts[qi][np.arange(mm)[None, :], codes_m].sum(axis=1)
                mask = ids != qid
                top = np.lexsort((ids[mask], -s[mask]))[:shortlist]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[mask][top],
                        "__spq": s[mask][top],
                    }
                )

    partial = codes.mapInPandas(
        score, "query_id long, neighbor_id long, __spq double"
    )
    w0 = Window.partitionBy("query_id").orderBy(
        F.col("__spq").desc(), F.col("neighbor_id")
    )
    short = (
        partial.withColumn("__r", F.row_number().over(w0))
        .filter(F.col("__r") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(corpus, queries, short, id_col, vec_col, k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 6,
    m_subspaces: int = 16,
    n_codes: int = 16,
    shortlist: int = 100,
    seed: int = 42,
    centroids: DataFrame | None = None,
    codebooks=None,
) -> DataFrame:
    """IVF + PQ composed — the production billion-vector layout
    (FAISS-style IVFPQ, flat quantization): the IVF assignment bounds
    WHICH vectors a query touches (~nprobe/n_centroids of the corpus),
    PQ codes bound WHAT is read per touched vector (codes, not
    floats), and only the merged shortlist fetches full vectors for
    exact cosine re-ranking.

    One Arrow pass assigns each corpus vector to its nearest centroid
    AND encodes its subspace codes (both models ride the task
    closure); query-side probe lists are a tiny broadcast join; ADC
    scoring runs per query group over its probed candidates only.
    Both models train on seeded parameter-bounded samples unless
    passed in pre-trained (``centroids`` as (__list, __cent),
    ``codebooks`` as the numpy array) — at scale train once, persist,
    and reuse across query batches instead of paying two sample scans
    per call.  Deterministic end to end (seeded training,
    first-minimum assignment, id tiebreaks — including at the ADC
    shortlist cutoff).  Returns (query_id, neighbor_id, rank, cos)."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col, n_centroids=n_centroids, seed=seed
        )
    cents_rows = sorted(centroids.collect(), key=lambda r: r["__list"])
    cents = np.array([r["__cent"] for r in cents_rows], dtype=np.float64)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, vec_col, m_subspaces=m_subspaces, n_codes=n_codes, seed=seed
        )
    books = codebooks
    mm, kk, dsub = books.shape

    def assign_encode(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            nz = norms[:, 0] > 0
            ids, vecs = ids[nz], vecs[nz] / norms[nz]
            if not len(ids):
                continue
            # nearest centroid by cosine (unit vectors: argmax dot);
            # ties -> lowest list id (first maximum)
            lists = np.argmax(vecs @ cents.T, axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": ids,
                    "__list": lists,
                    "__codes": list(_pq_assign(vecs, books)),
                }
            )

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign_encode, "neighbor_id long, __list int, __codes array<int>"
    )

    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows])
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qm /= np.where(qn == 0, 1.0, qn)
    sims = qm @ cents.T
    # nprobe nearest lists per query, ties -> lowest list id
    probe_pairs = [
        (int(q_ids[i]), int(l))
        for i in range(len(q_ids))
        for l in np.argsort(-sims[i], kind="stable")[:nprobe]
    ]
    probes = local_frame(spark, 
        probe_pairs, "query_id long, __list int"
    )
    luts = {
        int(q_ids[i]): np.einsum("sd,scd->sc", qm[i].reshape(mm, dsub), books)
        for i in range(len(q_ids))
    }

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        ids = pdf["neighbor_id"].to_numpy()
        codes_m = np.array(pdf["__codes"].tolist(), dtype=np.int64)
        s = luts[qid][np.arange(mm)[None, :], codes_m].sum(axis=1)
        mask = ids != qid
        # lexsort (primary -score, secondary id): equal ADC scores at
        # the cutoff resolve by neighbor id, not by the shuffle's
        # intra-group row order (which Spark does not guarantee)
        top = np.lexsort((ids[mask], -s[mask]))[:shortlist]
        return pd.DataFrame(
            {
                "query_id": qid,
                "neighbor_id": ids[mask][top],
                "__spq": s[mask][top],
            }
        )

    short = (
        assigned.join(F.broadcast(probes), "__list")
        .groupBy("query_id")
        .applyInPandas(
            score_group, "query_id long, neighbor_id long, __spq double"
        )
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(corpus, queries, short, id_col, vec_col, k)


# ---------------------------------------------------------------------------
# Int8 scalar quantization (embedding storage tier)
# ---------------------------------------------------------------------------


def quantize_embeddings_int8(
    df: DataFrame,
    vec_col: str,
    codes_col: str = "codes",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: ``scale`` =
    max(|v_i|) and ``codes_i`` = floor(v_i / scale * 127 + 0.5) as
    TINYINT — the standard 4x embedding-storage tier between raw
    float32 and PQ (``build_pq_model``): reconstruction error is
    bounded by scale/254 per element, distance ranking degrades far
    less than PQ, and the codes column is a plain shuffle-/parquet-
    friendly ``array<tinyint>``.

    Pure codegen expressions — no UDF, no shuffle; the explicit
    ``floor(x + 0.5)`` (instead of ``round``) pins half-way cases to
    one rule every engine replays identically.  All-zero vectors get
    scale 0 and all-zero codes.  Dequantize with
    :func:`dequantize_int8`.
    """
    vec = F.col(vec_col)
    scale = F.array_max(F.transform(vec, lambda v: F.abs(v)))
    codes = F.when(
        scale > 0,
        F.transform(
            vec,
            lambda v: F.floor(v.cast("double") / scale * 127 + F.lit(0.5)).cast(
                "tinyint"
            ),
        ),
    ).otherwise(F.transform(vec, lambda v: F.lit(0).cast("tinyint")))
    return df.withColumn(scale_col, scale).withColumn(codes_col, codes)


def dequantize_int8(
    codes_col: str = "codes", scale_col: str = "scale"
) -> Column:
    """Reconstruction expression for :func:`quantize_embeddings_int8`:
    ``codes_i * scale / 127`` as ``array<double>``."""
    return F.transform(
        F.col(codes_col),
        lambda c: c.cast("double") * F.col(scale_col) / 127,
    )
