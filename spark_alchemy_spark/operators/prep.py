"""Training-data preparation operators: chunking, deterministic
sampling, benchmark decontamination.

These are the steps between a curated corpus (operators/curate.py) and
a tokenizer: split documents into token-bounded chunks, draw a
reproducible weighted sample per stratum for data mixing, and drop
documents that leak evaluation-benchmark content.  All three are pure
DataFrame compositions — chunking is array slicing inside codegen,
sampling is an md5-threshold comparison (exactly replayable in any SQL
engine, which is what makes the mix reproducible across systems), and
decontamination is one shingle semi-join.

Scale notes:
* chunking emits one row per chunk via ``posexplode`` — no Python, no
  shuffle; downstream token accounting is a plain aggregate;
* the sample decision is a PER-ROW hash threshold — no sort, no
  windowing, no sampleBy scan state; changing the mix re-reads nothing
  but the stratum column;
* decontamination shuffles (shingle, id) pairs, not documents, and the
  benchmark side of the semi-join is usually broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..localframe import local_frame

from ..functions.text import shingles_from_tokens, tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into whitespace-token chunks of at most
    ``max_tokens`` tokens, consecutive chunks overlapping by
    ``overlap`` tokens.  Returns (id, chunk_idx, chunk_text, n_tokens)
    with 0-based ``chunk_idx``; empty documents yield no chunks.

    The token array is materialized once; chunk starts are a
    ``sequence`` stepped by the stride, and each chunk is a
    ``slice`` + ``array_join`` — all codegen'd, one output row per
    chunk via ``posexplode``.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    tk = df.select(
        F.col(id_col), tokens(text_col).alias("__tk")
    ).withColumn("__n", F.size("__tk"))
    starts = F.when(
        F.col("__n") >= 1,
        F.sequence(F.lit(1), F.col("__n"), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        tk.withColumn("__starts", starts)
        .select(
            id_col,
            "__tk",
            F.posexplode("__starts").alias("chunk_idx", "__s"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice("__tk", F.col("__s"), F.lit(max_tokens)), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(max_tokens), F.size("__tk") - F.col("__s") + 1
            ).alias("n_tokens"),
        )
    )


def sample_hash(id_col, salt: str = "mix-v1") -> Column:
    """The sampling coordinate: first 8 hex chars of
    ``md5(salt || ':' || id)``.  Lexicographic order on lowercase hex
    equals numeric order, so comparing against a precomputed hex
    threshold IS a uniform [0,1) threshold test — and md5 exists
    everywhere, making the drawn sample byte-reproducible in Spark,
    DuckDB, Postgres, ..."""
    c = id_col if isinstance(id_col, Column) else F.col(id_col)
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 8)


def fraction_threshold(fraction: float) -> str:
    """Hex threshold such that P[sample_hash < threshold] = fraction.

    Comparisons are lexicographic over 8-char lowercase hex, which
    equals numeric order ONLY at equal length — so fraction 1.0 maps to
    ``"g"`` (sorts after every hex string) instead of the 9-digit
    ``hex(2^32)``, which would sort before ``"ffffffff"`` and silently
    drop almost everything."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    t = int(round(fraction * (1 << 32)))
    if t >= 1 << 32:
        return "g"
    return format(t, "08x")


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the data-mixing
    step.  Each row is kept iff its :func:`sample_hash` falls under its
    stratum's threshold; the same (salt, id) always draws the same
    way, so mixes are reproducible and auditable by ANY engine that
    has md5 (no RNG state, no sampleBy non-determinism)."""
    thr = F.lit(fraction_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(fraction_threshold(frac))
        ).otherwise(thr)
    return df.filter(sample_hash(id_col, salt) < thr)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """Drop every document sharing at least one word-``n``-gram with
    the benchmark corpus (eval-set leakage guard).  One inverted-index
    semi-join on the shingle key: documents never shuffle, only
    (id, shingle) pairs do, and the benchmark shingle set is typically
    small enough to broadcast."""
    from ..functions.text import bench_gram_set, exploded_shingles

    bench_text_col = bench_text_col or text_col
    bench_sh = bench_gram_set(benchmark, bench_text_col, n)
    # corpus side: window-lead builder (codegen; per-doc duplicates are
    # harmless for a semi-join, so no distinct pass)
    doc_sh = exploded_shingles(docs, id_col, text_col, n)
    contaminated = doc_sh.join(bench_sh, "__s", "left_semi").select(id_col).distinct()
    return docs.join(contaminated, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination (the 100 TB fast path)
# ---------------------------------------------------------------------------


def _bloom_positions(col, num_bits: int, num_hashes: int) -> Column:
    """``num_hashes`` bit positions in ``[0, num_bits)`` for a value —
    independent seeded xxhash64 lanes, the classic k-hash Bloom
    scheme.  Seeds are INT literals on both the build and probe side
    so the type-tagged hashes agree."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def build_gram_bloom(
    grams: DataFrame, gram_col: str, num_bits: int = 1 << 16, num_hashes: int = 3
) -> DataFrame:
    """1-row DataFrame (column ``bloom``: ``array<bigint>`` of
    ``num_bits/64`` words) — a Bloom filter over every value of
    ``gram_col``, built DISTRIBUTED: positions explode, each 64-bit
    word is a ``bit_or`` partial aggregate, and the final array is a
    map re-assembly.  No driver-side collect, no byte-array UDAF; the
    result broadcasts as an ordinary tiny DataFrame.

    ``num_bits`` must be a positive multiple of 64: the build packs
    bits into whole 64-bit words and the probe indexes that word
    array, so a ragged size would silently truncate the top positions
    — turning guaranteed-no-false-negatives into false negatives."""
    if num_bits <= 0 or num_bits % 64:
        raise ValueError("num_bits must be a positive multiple of 64")
    n_words = num_bits // 64
    pos = grams.select(
        F.explode(_bloom_positions(F.col(gram_col), num_bits, num_hashes)).alias(
            "__p"
        )
    )
    words = pos.groupBy(F.shiftright("__p", 6).alias("__wi")).agg(
        F.expr("bit_or(shiftleft(1L, CAST(__p % 64 AS INT)))").alias("__bits")
    )
    one = words.agg(
        F.map_from_entries(F.collect_list(F.struct("__wi", "__bits"))).alias("__m")
    )
    return one.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at("__m", i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )


def _bloom_member(gram_sql: str, bloom_sql: str, num_bits: int, num_hashes: int):
    """JVM predicate: all ``num_hashes`` bits for ``gram_sql`` are set
    in the ``bloom_sql`` word-array expression (a column name or an
    inlined array literal).  Unrolled (k is tiny) so the seed literals
    match :func:`_bloom_positions` exactly."""
    terms = []
    for i in range(num_hashes):
        p = f"pmod(xxhash64({gram_sql}, {i}), {num_bits})"
        terms.append(
            f"(element_at({bloom_sql}, CAST(({p}) DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(({p}) % 64 AS INT))) != 0"
        )
    return F.expr(" AND ".join(terms))


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 3,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """:func:`decontaminate` semantics (identical output, property-
    tested) with a broadcast-Bloom prefilter on the corpus side — the
    shape that wins at 100 TB.  The plain semi-join shuffles EVERY
    corpus (shingle, id) pair; here each corpus gram first probes a
    Bloom filter over the benchmark grams as a pure map-side JVM
    expression (bitwise AND against a broadcast ``array<bigint>``), and
    only Bloom-positive grams — contamination plus the filter's small
    false-positive tail — reach the exact-verify semi-join.  Bloom
    filters have no false negatives, so verify removes exactly the FP
    tail and the result equals the exact operator's.

    Sizing: ``num_bits`` should be ~10x the distinct benchmark gram
    count for ~1% FP at ``num_hashes=3``; benchmark suites are a few
    million grams (MB-scale words array), far under literal/broadcast
    limits.  Spark's own ``bloom_filter_agg``/``might_contain`` pair is
    not in the public SQL registry (4.1), hence the explicit word-array
    build — which also keeps the filter persistable as a plain column.

    The built filter is collected (num_bits/64 longs — KB-to-MB-scale,
    a bounded aggregate like the ANN query-vector pulls) and inlined
    as an ARRAY LITERAL in the probe predicate rather than joined in
    as a 1-row broadcast: with a join, Catalyst's reordering is free
    to sink the exact semi-join BELOW the bloom filter (measured — the
    'prefilter' then ran after the join it was supposed to protect);
    a literal predicate sits in the corpus scan stage and cannot be
    reordered past.  Same mechanism as Spark's runtime bloom join,
    where the filter rides the plan as a subquery result."""
    bench_text_col = bench_text_col or text_col
    from ..functions.text import bench_gram_set, exploded_shingles

    bench_sh = bench_gram_set(benchmark, bench_text_col, n)
    words = build_gram_bloom(bench_sh, "__s", num_bits, num_hashes).collect()[
        0
    ]["bloom"]
    doc_sh = exploded_shingles(docs, id_col, text_col, n)
    bloom_lit = f"array({', '.join(f'{w}L' for w in words)})"
    cand = doc_sh.filter(
        _bloom_member("__s", bloom_lit, num_bits, num_hashes)
    ).select(id_col, "__s")
    contaminated = (
        cand.join(F.broadcast(bench_sh), "__s", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(contaminated, id_col, "left_anti")


# ---------------------------------------------------------------------------
# PII scrubbing + reproducible training order
# ---------------------------------------------------------------------------

#: (pattern, replacement) chain for common PII.  Patterns are kept in
#: the RE2-compatible subset (no backrefs/lookarounds) so the exact
#: same rewrite runs under Spark's Java regex AND RE2 engines
#: (DuckDB/Go) — the scrub is auditable cross-engine like the sampler.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b(?:\+?\d{1,3}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def scrub_pii(col, patterns: tuple[tuple[str, str], ...] = PII_PATTERNS) -> Column:
    """Chained ``regexp_replace`` redaction of emails, IPs, phone
    numbers and SSNs — entirely codegen'd JVM string work, zero Python
    in the hot path.  Order matters (emails before phones so digits in
    local parts never half-match); extend ``patterns`` per corpus."""
    c = col if isinstance(col, Column) else F.col(col)
    for pat, repl in patterns:
        c = F.regexp_replace(c, pat, repl)
    return c


def training_order(
    df: DataFrame, id_col: str, salt: str = "order-v1"
) -> DataFrame:
    """Reproducible global shuffle for training: position = rank of
    ``md5(salt || id)``.  Same salt -> byte-identical order in any
    engine (the md5 trick from :func:`sample_hash`); a new salt is a
    fresh epoch-level reshuffle with zero RNG state to checkpoint.
    Adds a ``position`` column (0-based).

    Scale note: a global rank is a global sort — at 100 TB this is the
    range-partitioned sort Spark already does for ``orderBy``, and the
    sort key is a tiny fixed-width hash, not the document.  Downstream
    writers usually persist bucketed/sorted by ``position`` once per
    epoch mix.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.lit(salt + ":"), (F.col(id_col)).cast("string"))
    )
    w = Window.orderBy(h, F.col(id_col))
    return df.withColumn("position", F.row_number().over(w) - 1)


# ---------------------------------------------------------------------------
# Sequence packing + deterministic splits + repetition screening
# ---------------------------------------------------------------------------


def _with_shard(df: DataFrame, id_col: str, num_shards: int) -> DataFrame:
    """Shard assignment for packing: ``pmod(id, num_shards)``.  Portable
    to any engine (the oracle replays it), uniform for the dense
    integer ids the corpus tables carry; pass a pre-computed ``shard``
    column for string ids."""
    return df.withColumn(
        "shard", F.pmod(F.col(id_col).cast("long"), F.lit(num_shards))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int = 32,
    order_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Contiguous (block) sequence packing: rows are laid out in a
    deterministic order within hash shards and cut into packs of
    ``budget`` tokens by exclusive-cumulative-sum division.  Adds
    ``shard`` and ``pack_id`` columns.

    A row whose tokens straddle a cut stays in the pack it started in,
    so a pack can overshoot by at most ``max(row_tokens) - 1`` — run
    :func:`chunk_documents` first to bound row size.  Everything is a
    window cumsum inside one shuffle per shard; no Python.  At 100 TB
    the shard count is the parallelism knob — each shard's window sort
    is independent, so there is no global-sort bottleneck (contrast
    :func:`training_order`, which buys a global order for one sort).
    """
    order_cols = order_cols or [id_col]
    from pyspark.sql import Window

    # extra partition columns (e.g. a train/val/test split) keep packs
    # from straddling logical boundaries; each (partition, shard) pair
    # is an independent stream
    parts = list(partition_cols or []) + ["shard"]
    w = Window.partitionBy(*parts).orderBy(*order_cols)
    t = F.col(token_col).cast("long")
    sharded = _with_shard(df, id_col, num_shards)
    return sharded.withColumn(
        "pack_id",
        F.floor((F.sum(t).over(w) - t) / F.lit(budget)).cast("long"),
    )


def pack_sequences_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int = 32,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First-fit greedy packing: within each shard's deterministic
    order, a row joins the current pack unless that would exceed
    ``budget``, in which case it opens a new pack.  Unlike
    :func:`pack_sequences` no pack ever exceeds ``budget`` — except a
    single oversize row, which gets a pack of its own.

    The per-shard scan is inherently sequential, so it runs as one
    Arrow ``applyInPandas`` pass per shard (shards are independent =
    full parallelism; the Python work is a single integer loop per
    shard, not per-token).  The recurrence is deliberately simple
    enough to replay as a recursive SQL CTE for the oracle.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    order_cols = order_cols or [id_col]
    sharded = _with_shard(df, id_col, num_shards)
    # StructType.add mutates in place — never call it on a DataFrame's
    # cached .schema (the DF would then claim the column exists).
    out_schema = StructType(
        list(sharded.schema.fields) + [StructField("pack_id", LongType())]
    )
    tok_name, oc = token_col, list(order_cols)

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(oc, kind="mergesort").reset_index(drop=True)
        packs = []
        acc = 0
        pack = 0
        for i, t in enumerate(pdf[tok_name].astype("int64")):
            if i == 0:
                acc = t
            elif acc + t <= budget:
                acc += t
            else:
                pack += 1
                acc = t
            packs.append(pack)
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        return pdf

    return sharded.groupBy("shard").applyInPandas(_pack, schema=out_schema)


def train_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/validation/test assignment: the same
    md5-threshold coordinate as :func:`weighted_sample`, cut into
    cumulative bands — every engine with md5 reproduces the exact
    membership, and re-running never migrates a document between
    splits.  The last split takes the remainder band so weights that
    sum to 1.0 partition exactly.  Adds a ``split`` column."""
    if not weights:
        raise ValueError("need at least one split")
    names = list(weights)
    h = sample_hash(id_col, salt)
    expr = F.lit(names[-1])
    cum = 0.0
    bands = []
    for name in names[:-1]:
        cum += weights[name]
        bands.append((name, fraction_threshold(cum)))
    for name, thr in reversed(bands):
        expr = F.when(h < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def repetition_stats(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Within-document repetition screening (the Gopher-style quality
    gate): word-``n``-gram totals, distincts, the hottest n-gram's
    count, and the duplicate fraction ``1 - distinct/total`` (4dp).
    Documents with fewer than ``n`` tokens emit nothing.

    The shingle rows come from the codegen window-lead builder, whose
    id-partitioning both aggregations reuse (no further exchange); the
    document text itself never shuffles."""
    from ..functions.text import exploded_shingles

    per_gram = (
        exploded_shingles(docs, id_col, text_col, n)
        .groupBy(id_col, "__s")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return per_gram.groupBy(id_col).agg(
        F.sum("__c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("__c").alias("max_rep"),
        F.round(1 - F.count(F.lit(1)) / F.sum("__c"), 4).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# Mixture construction: temperature reweighting, fixed-size strata,
# token-budget selection
# ---------------------------------------------------------------------------


def temperature_fractions(
    counts: dict[str, int], alpha: float = 0.5, scale_to: float = 1.0
) -> dict[str, float]:
    """Multinomial temperature reweighting (the mT5/data-mixing rule):
    stratum probability ∝ count^alpha, turned into per-stratum keep
    fractions whose LARGEST is ``scale_to`` — i.e. the dominant
    stratum after reweighting is kept at ``scale_to`` and every other
    stratum is downsampled proportionally.  alpha=1 keeps the natural
    mix, alpha=0 equalizes strata; alpha≈0.3-0.7 is the usual
    low-resource boost."""
    if not counts:
        return {}
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    weights = {s: (c ** alpha) / c for s, c in counts.items() if c > 0}
    peak = max(weights.values())
    return {s: scale_to * w / peak for s, w in weights.items()}


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.5,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic temperature-reweighted mixture: counts each
    stratum (one tiny aggregate), converts them to keep-fractions with
    :func:`temperature_fractions`, and applies the same md5-threshold
    Bernoulli draw as :func:`weighted_sample`.  The counts collect is
    one row per stratum — bounded by stratum cardinality, never by
    corpus size."""
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fractions = temperature_fractions(counts, alpha=alpha)
    return weighted_sample(df, strata_col, id_col, fractions, salt=salt)


def stratified_fixed_n(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "fixed-v1",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (or all rows of a
    smaller stratum), chosen by md5 order — the deterministic
    fixed-size eval-set / few-shot-pool draw.  A per-stratum window
    top-n: one shuffle on the stratum key; the md5 coordinate makes
    the choice reproducible in any engine, and adding documents later
    only ever displaces the highest-hash members."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def token_budget_take(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    token_col: str,
    budget_per_stratum: int,
    salt: str = "budget-v1",
) -> DataFrame:
    """Greedy token-budget selection per stratum: walk each stratum in
    md5 order and keep every document that STARTS under the budget
    (exclusive running sum < budget) — the "fill each source's token
    allowance" step of corpus assembly.  Like the packing operators
    the overshoot is bounded by one document.  One window cumsum per
    stratum; deterministic and engine-reproducible."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(id_col, salt), F.col(id_col)
    )
    t = F.col(token_col).cast("long")
    return (
        df.withColumn("__cum_excl", F.sum(t).over(w) - t)
        .filter(F.col("__cum_excl") < budget_per_stratum)
        .drop("__cum_excl")
    )


# ---------------------------------------------------------------------------
# Token-budget mixture planning
# ---------------------------------------------------------------------------


def mixture_plan(
    df: DataFrame,
    stratum_col: str,
    text_col: str,
    weights: dict[str, float],
    token_budget: int,
    repeat_warn_epochs: int = 4,
) -> DataFrame:
    """Per-stratum training-mix plan for a token budget: given target
    mixture ``weights`` (normalized over the provided strata) and a
    total ``token_budget``, report for every stratum how many tokens
    exist, how many the mix wants, and how to get there — ``full_epochs``
    whole passes over the stratum plus a ``tail_fraction`` partial pass
    (feed the fraction to :func:`weighted_sample` for the reproducible
    draw).  ``repeat_risk`` flags strata the budget forces past
    ``repeat_warn_epochs`` passes — the over-repetition signal mix
    designers rebalance on.

    All arithmetic is integer-pinned for cross-engine determinism:
    weights are scaled to parts-per-million and targets computed with
    bigint floor division, so any SQL engine replays the identical
    plan.  One aggregation over the corpus (map-side combinable token
    sum); the weight table is a broadcast literal.  Strata present in
    ``weights`` but absent from the corpus report 0 available tokens
    and NULL epochs/fraction; corpus strata without a weight are
    excluded (target 0 by definition).

    Returns (stratum_col, available_tokens, target_tokens, full_epochs,
    tail_fraction, repeat_risk).
    """
    from ..functions.text import token_count

    scale = 1_000_000
    wi = {s: int(round(w * scale)) for s, w in weights.items()}
    wsum = sum(wi.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    wdf = local_frame(df.sparkSession, 
        sorted(wi.items()), f"{stratum_col} string, __w long"
    )
    avail = df.groupBy(stratum_col).agg(
        F.sum(token_count(text_col)).cast("long").alias("available_tokens")
    )
    plan = (
        wdf.join(avail, stratum_col, "left")
        .select(
            stratum_col,
            F.coalesce("available_tokens", F.lit(0).cast("long")).alias(
                "available_tokens"
            ),
            # DECIMAL(38,0) intermediates: budget x ppm-weight and
            # remainder x 1e6 both overflow int64 at real corpus sizes
            # (1e11-token budget, >9e12-token strata)
            F.expr(
                f"CAST(CAST({int(token_budget)} AS DECIMAL(38,0)) * __w "
                f"DIV {wsum} AS BIGINT)"
            ).alias("target_tokens"),
        )
    )
    has = F.col("available_tokens") > 0
    return plan.select(
        stratum_col,
        "available_tokens",
        "target_tokens",
        F.when(has, F.expr("target_tokens DIV available_tokens"))
        .cast("long")
        .alias("full_epochs"),
        # parts-per-million via bigint floor division, THEN one exact
        # double divide — never round() a double ratio (HALF_UP vs
        # HALF_EVEN differs across engines at tie points)
        F.when(
            has,
            F.expr(
                "CAST(CAST(target_tokens % available_tokens AS DECIMAL(38,0))"
                " * 1000000 DIV available_tokens AS DOUBLE) / 1000000"
            ),
        ).alias("tail_fraction"),
        F.when(has, F.expr("target_tokens DIV available_tokens") >= repeat_warn_epochs)
        .alias("repeat_risk"),
    )


# ---------------------------------------------------------------------------
# SFT pair assembly + validation
# ---------------------------------------------------------------------------


def assemble_sft_pairs(
    df: DataFrame,
    id_col: str,
    prompt_col: str,
    response_col: str,
    template: str = "<|user|>{p}<|assistant|>{r}<|end|>",
    min_response_tokens: int = 8,
    max_response_ratio: int = 20,
) -> DataFrame:
    """Instruction-tuning pair assembly: render each (prompt, response)
    through a chat ``template`` (codegen ``concat``; the ``{p}`` and
    ``{r}`` placeholders may appear in either order) and attach the
    validation flags SFT pipelines filter on — ``response_tokens``
    floor, response/prompt token-ratio ceiling (integer
    cross-multiplied: no float ratio), and ``dup_prompt`` (the same
    prompt appearing in more than one pair — train/eval leakage and
    gradient double-counting risk).  The duplicate flag is a window
    count partitioned by the prompt's md5 key: ONE bounded shuffle, no
    broadcast of an unbounded key set, a single scan of ``df``, and
    NULL prompts group together (window partitioning treats NULL as a
    key) so duplicated null prompts are flagged too.

    Returns every input column plus (rendered, prompt_tokens,
    response_tokens, valid, dup_prompt); filtering and packing
    (:func:`pack_sequences_greedy`) stay caller-side.
    """
    import re

    from pyspark.sql.window import Window

    from ..functions.text import token_count

    if template.count("{p}") != 1 or template.count("{r}") != 1:
        raise ValueError("template needs exactly one {p} and one {r}")
    parts = []
    for piece in re.split(r"(\{p\}|\{r\})", template):
        if piece == "{p}":
            parts.append(F.col(prompt_col))
        elif piece == "{r}":
            parts.append(F.col(response_col))
        elif piece:
            parts.append(F.lit(piece))
    rendered = F.concat(*parts)
    pt = token_count(prompt_col).cast("bigint")
    rt = token_count(response_col).cast("bigint")
    w = Window.partitionBy(F.md5(F.col(prompt_col)))
    return df.select(
        "*",
        rendered.alias("rendered"),
        pt.alias("prompt_tokens"),
        rt.alias("response_tokens"),
        (
            (rt >= min_response_tokens) & (rt <= pt * max_response_ratio)
        ).alias("valid"),
        (F.count(F.lit(1)).over(w) > 1).alias("dup_prompt"),
    )
